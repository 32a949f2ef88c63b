"""As-of (point-in-time) join — the time-series primitive Spark lacks.

"For every left row, attach the most recent right row (per key) whose
timestamp is at or before the left row's" — feature lookups against
slowly-updating reference tables, trade-vs-quote alignment, profile
snapshots. The reference's closest construct is pandas column
alignment (SURVEY §2.3 Joins); this is the general distributed form.

Implementation is NOT a range join (a `l.ts >= r.ts` theta-join
explodes to O(|L|·|R|) per key before taking the max): tag the two
inputs, UNION them, and run one `last_value(..., ignorenulls)` window
ordered by (ts, side) per key — every left row picks up the latest
right payload seen so far in the sort. Cost = one shuffle on the key
for the union + one in-partition sort: linear, skew-bounded by the
hottest key, the plan you want at 100 TB. Right rows sort BEFORE left
rows at equal timestamps (side 0 < 1), giving the standard `>=`
(inclusive) as-of semantics — identical to DuckDB's native ASOF JOIN,
which is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: all left rows and columns, plus
    ``<value_col><suffix>`` columns and ``<on><suffix>`` (the matched
    right timestamp), NULL where no right row qualifies.

    pandas ``merge_asof`` parity knobs: ``direction`` — ``backward``
    (most recent right row at-or-before) or ``forward`` (nearest right
    row at-or-after); ``allow_exact_matches=False`` makes the bound
    strict; ``tolerance_seconds`` nulls out matches farther than the
    bound (both the value and the matched timestamp, like pandas).
    All three are window-order tweaks on the SAME union+window plan —
    still one key shuffle, linear, never a range theta-join.

    Contract: ``right`` must be unique per (by, on) — aggregate it
    first if not (with duplicates, "the" nearest right row is
    ill-defined in any engine).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )
    if direction == "nearest" and not allow_exact_matches:
        # an equal-ts right row can only sit on ONE side of the union
        # ordering; excluding it from BOTH frames in one pass isn't
        # expressible, and the pandas corner is rare — refuse loudly
        raise ValueError("direction='nearest' requires allow_exact_matches=True")
    if direction == "nearest":
        return _asof_join_nearest(
            left, right, on, by, value_cols, suffix, tolerance_seconds
        )
    by_l = list(by)
    payload = [c for c in left.columns if c not in by_l]
    r_ts = right.schema[on].dataType
    val_types = {c: right.schema[c].dataType for c in value_cols}

    # At equal timestamps the right row is visible iff it sorts on the
    # window-frame side of the left row: before it for backward (frame
    # ends at current row), after it for forward (frame starts at
    # current row). allow_exact_matches=False flips the tie order so
    # the equal-ts right row falls outside the frame.
    backward = direction == "backward"
    r_side = 0 if backward == allow_exact_matches else 2
    lp_struct = F.struct(*payload).alias("__lp")
    l_tagged = left.select(
        *by_l,
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        lp_struct,
        *[F.lit(None).cast(val_types[c]).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast(r_ts).alias("__rts"),
    )
    lp_type = l_tagged.schema["__lp"].dataType
    r_tagged = right.select(
        *by_l,
        F.col(on).alias("__t"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(lp_type).alias("__lp"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(on).alias("__rts"),
    )
    w = Window.partitionBy(*by_l).orderBy(F.col("__t"), F.col("__side"))
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    merged = l_tagged.unionByName(r_tagged).select(
        *by_l,
        "__side",
        "__t",
        "__lp",
        *[pick(f"__v_{c}").over(w).alias(f"__m_{c}") for c in value_cols],
        pick("__rts").over(w).alias("__m_ts"),
    )
    in_tol = F.lit(True)
    if tolerance_seconds is not None:
        delta = (
            F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__m_ts"))
            if backward
            else F.unix_micros(F.col("__m_ts")) - F.unix_micros(F.col("__t"))
        )
        in_tol = delta <= F.lit(int(tolerance_seconds * 1_000_000))
    return merged.filter(F.col("__side") == 1).select(
        *by_l,
        *[F.col(f"__lp.{c}").alias(c) for c in payload],
        *[
            F.when(in_tol, F.col(f"__m_{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.when(in_tol, F.col("__m_ts")).alias(f"{on}{suffix}"),
    )


def _asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: tuple[str, ...],
    value_cols: tuple[str, ...],
    suffix: str,
    tolerance_seconds: float | None,
) -> DataFrame:
    """direction='nearest': for each left row, the right row with the
    smallest |Δt| (ties → the at-or-before match, distance 0 beats
    everything, so an equal-ts right always wins). ONE union + ONE key
    shuffle + ONE sort — the backward candidate is a
    preceding-frame last() and the forward candidate a
    following-frame first() over the SAME (t, side) ordering, so
    adding the second direction costs two window frames, not a second
    exchange. Tolerance is applied PER SIDE before choosing: an
    out-of-tolerance backward match never beats an in-tolerance
    forward one (pandas merge_asof nearest semantics).
    """
    by_l = list(by)
    payload = [c for c in left.columns if c not in by_l]
    r_ts = right.schema[on].dataType
    val_types = {c: right.schema[c].dataType for c in value_cols}
    lp_struct = F.struct(*payload).alias("__lp")
    l_tagged = left.select(
        *by_l,
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        lp_struct,
        *[F.lit(None).cast(val_types[c]).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast(r_ts).alias("__rts"),
    )
    lp_type = l_tagged.schema["__lp"].dataType
    # side 0: equal-ts rights sort BEFORE the left row → inside the
    # backward frame. The forward frame then misses equal-ts rights,
    # but the backward candidate already holds them at distance 0,
    # which wins every nearest comparison — so the result is exact.
    r_tagged = right.select(
        *by_l,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lp_type).alias("__lp"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(on).alias("__rts"),
    )
    base = Window.partitionBy(*by_l).orderBy(F.col("__t"), F.col("__side"))
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    merged = l_tagged.unionByName(r_tagged).select(
        *by_l,
        "__side",
        "__t",
        "__lp",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in value_cols
        ],
        F.last("__rts", ignorenulls=True).over(wb).alias("__b_ts"),
        *[
            F.first(f"__v_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in value_cols
        ],
        F.first("__rts", ignorenulls=True).over(wf).alias("__f_ts"),
    )
    db = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__b_ts"))
    df_ = F.unix_micros(F.col("__f_ts")) - F.unix_micros(F.col("__t"))
    ok_b = F.col("__b_ts").isNotNull()
    ok_f = F.col("__f_ts").isNotNull()
    if tolerance_seconds is not None:
        tol = F.lit(int(tolerance_seconds * 1_000_000))
        ok_b = ok_b & (db <= tol)
        ok_f = ok_f & (df_ <= tol)
    use_b = ok_b & (~ok_f | (db <= df_))
    use_f = ok_f & ~use_b
    return merged.filter(F.col("__side") == 1).select(
        *by_l,
        *[F.col(f"__lp.{c}").alias(c) for c in payload],
        *[
            F.when(use_b, F.col(f"__b_{c}"))
            .when(use_f, F.col(f"__f_{c}"))
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.when(use_b, F.col("__b_ts"))
        .when(use_f, F.col("__f_ts"))
        .alias(f"{on}{suffix}"),
    )

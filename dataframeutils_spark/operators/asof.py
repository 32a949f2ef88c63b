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
) -> DataFrame:
    """Left as-of join: all left rows and columns, plus
    ``<value_col><suffix>`` columns and ``<on><suffix>`` (the matched
    right timestamp), NULL where no right row precedes.

    Contract: ``right`` must be unique per (by, on) — aggregate it
    first if not (with duplicates, "the" most recent right row is
    ill-defined in any engine). Tie at equal timestamps: the right row
    IS visible to the left row (inclusive as-of).
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
    r_tagged = right.select(
        *by_l,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lp_type).alias("__lp"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(on).alias("__rts"),
    )
    w = (
        Window.partitionBy(*by_l)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).select(
        *by_l,
        "__side",
        "__lp",
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in value_cols],
        F.last("__rts", ignorenulls=True).over(w).alias("__m_ts"),
    )
    return merged.filter(F.col("__side") == 1).select(
        *by_l,
        *[F.col(f"__lp.{c}").alias(c) for c in payload],
        *[F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in value_cols],
        F.col("__m_ts").alias(f"{on}{suffix}"),
    )

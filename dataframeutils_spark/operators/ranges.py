"""Interval (range) join — bucketized, never a theta-join.

"For every event, find the interval(s) of the same key that contain
its timestamp" — attribution windows, maintenance/outage overlap,
validity-period lookup. The reference has no distributed analogue
(closest is pandas boolean masking, SURVEY §2.3 Joins); Spark's naive
spelling (`e.ts >= i.start AND e.ts < i.end` join) degenerates to a
per-key nested loop: O(|E|·|I|) per key, a scale-killer the moment a
hot key holds thousands of intervals.

Scale design: chunk time into fixed-width buckets. Each interval is
exploded to the bucket ids it overlaps (``F.sequence`` — intervals
spanning many buckets emit one row per bucket); each event computes
its single containing bucket. The join is then a plain *equi*-join on
(key, bucket) followed by the exact containment filter — shuffle on a
composite key Catalyst hashes normally, per-row candidate work bounded
by the intervals that genuinely overlap the event's bucket. Cost is
linear in |E| + Σ(interval_width/chunk): pick ``chunk_seconds`` near
the median interval width so most intervals explode to ~2 buckets.
An event matches an interval at most once (its bucket appears at most
once in the interval's bucket sequence), so no post-join dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    start_col: str = "w_start",
    end_col: str = "w_end",
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Inner-join events to half-open intervals ``[start, end)`` of the
    same key. Output: all event columns plus the interval's columns
    (minus its key columns). Empty/inverted intervals match nothing.

    Left/anti semantics are composed outside: aggregate this inner
    join's output and join it back onto ``intervals`` (keeps this
    operator a single equi-join, the plan you want at scale).
    """
    w_us = int(chunk_seconds) * 1_000_000
    by_l = list(by)
    ivl_payload = [c for c in intervals.columns if c not in by_l]

    ivl = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(start_col)) / w_us),
                    # end is exclusive: the bucket containing (end - 1μs)
                    F.floor((F.unix_micros(F.col(end_col)) - 1) / w_us),
                )
            ),
        )
        .select(*by_l, "__bucket", *ivl_payload)
    )
    ev = events.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(on)) / w_us)
    )
    joined = ev.join(ivl, on=by_l + ["__bucket"]).filter(
        (F.col(on) >= F.col(start_col)) & (F.col(on) < F.col(end_col))
    )
    return joined.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    by: tuple[str, ...] = ("user_id",),
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join per key: all pairs of half-open
    intervals ``[l_start, l_end) × [r_start, r_end)`` of the same key
    that intersect (``l_start < r_end AND r_start < l_end``).

    Same bucketization as :func:`interval_join` — both sides explode to
    the time chunks they span, the join is a plain equi-join on
    (key, chunk), and the exact overlap predicate filters after. Two
    overlapping intervals share EVERY chunk of their intersection, so
    the pair would surface once per shared chunk; instead of a
    ``distinct`` over the payload (a second full shuffle), keep a pair
    only in the FIRST shared chunk — the one containing
    ``greatest(l_start, r_start)``, which lies inside both intervals
    exactly when they overlap. Output = key + both sides' payloads,
    exactly once per overlapping pair; left/anti variants compose by
    joining this inner result back, as with :func:`interval_join`.
    """
    w_us = int(chunk_seconds) * 1_000_000
    by_l = list(by)
    l_payload = [c for c in left.columns if c not in by_l]
    r_payload = [c for c in right.columns if c not in by_l]
    clash = set(l_payload) & set(r_payload)
    if clash:
        raise ValueError(f"left/right payload columns collide: {sorted(clash)}")

    def explode_side(df: DataFrame, start: str, end: str, payload: list[str]) -> DataFrame:
        return (
            df.filter(F.col(end) > F.col(start))
            .withColumn(
                "__bucket",
                F.explode(
                    F.sequence(
                        F.floor(F.unix_micros(F.col(start)) / w_us),
                        F.floor((F.unix_micros(F.col(end)) - 1) / w_us),
                    )
                ),
            )
            .select(*by_l, "__bucket", *payload)
        )

    lv = explode_side(left, l_start, l_end, l_payload)
    rv = explode_side(right, r_start, r_end, r_payload)
    first_shared = F.floor(
        F.greatest(
            F.unix_micros(F.col(l_start)), F.unix_micros(F.col(r_start))
        )
        / w_us
    )
    return (
        lv.join(rv, on=by_l + ["__bucket"])
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("__bucket") == first_shared)
        )
        .drop("__bucket")
    )


def sessionize(
    events: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch gaps-and-islands sessionization: one row per session with
    ``session_id`` (ordinal within key), ``s_start``, ``s_end``,
    ``n_events``. A new session starts when the gap to the previous
    event is >= ``gap_seconds`` (same convention as Spark's
    session_window / streaming.windows.sessionized_counts: intervals
    [ts, ts+gap) merge only on overlap). One shuffle on the key; linear.
    """
    from pyspark.sql import Window

    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(*by).orderBy(F.col(on))
    brk = (
        F.when(F.lag(F.col(on)).over(w).isNull(), F.lit(1))
        .when(
            F.unix_micros(F.col(on)) - F.unix_micros(F.lag(F.col(on)).over(w))
            >= F.lit(gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    run = Window.partitionBy(*by).orderBy(F.col(on)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = events.select(*by, F.col(on)).withColumn("__brk", brk).withColumn(
        "session_id", F.sum("__brk").over(run)
    )
    return tagged.groupBy(*by, "session_id").agg(
        F.min(on).alias("s_start"),
        F.max(on).alias("s_end"),
        F.count("*").alias("n_events"),
    )

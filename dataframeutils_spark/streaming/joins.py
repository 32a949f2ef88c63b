"""Watermarked stream-stream joins.

The remaining Structured Streaming join capability next to the
windowed/session/stateful operators (streaming/windows.py) and ingest
dedup (streaming/dedup.py): correlating two live event streams within
a bounded time window — e.g. every purchase joined to the same user's
clicks in the preceding half hour, while both sides are still flowing.

Spark's stream-stream inner join buffers each side in state keyed by
the equi-join key; the time-interval condition plus the per-side
watermarks bound how long a row is retained (a click older than the
watermark + interval can never match a future purchase, so its state
is evicted). Without the interval condition the state would grow
forever — the operator requires it by construction here.

The same function body runs in batch mode (no watermarks applied), so
the batch result is the correctness oracle for the streamed one — the
pattern every operator in this package follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_join(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases ⋈ same-user clicks within the preceding ``lookback``:
    (user_id, purchase_id, p_ts, click_id, c_ts, click_value).

    A stream self-join (both sides filtered from one events stream).
    Inner join: a pair is emitted as soon as both rows have arrived —
    no watermark wait — while the watermark + interval bound state
    retention on both sides.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    purchases = src.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = src.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    )
    cond = (
        (purchases["user_id"] == clicks["c_user"])
        & (clicks["c_ts"] >= purchases["p_ts"] - F.expr(f"INTERVAL {lookback}"))
        & (clicks["c_ts"] <= purchases["p_ts"])
    )
    return purchases.join(clicks, cond, "inner").select(
        "user_id", "purchase_id", "p_ts", "click_id", "c_ts", "click_value"
    )


def purchase_click_join_sql(table: str = "events", lookback_minutes: int = 30) -> str:
    return f"""
SELECT p.user_id, p.event_id AS purchase_id, p.ts AS p_ts,
       c.event_id AS click_id, c.ts AS c_ts, c.value AS click_value
FROM {table} p
JOIN {table} c
  ON c.user_id = p.user_id
 AND c.ts BETWEEN p.ts - INTERVAL {lookback_minutes} MINUTE AND p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""

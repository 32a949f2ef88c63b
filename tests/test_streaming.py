"""Structured Streaming operators: each streaming result is pinned to
its batch equivalent on the same data (identical transformations, so
stream-vs-batch equality is the correctness oracle)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.streaming import windows as W
from tests.conftest import SF_DIR


def _batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return W.normalize_event_times(spark.read.parquet(f"{SF_DIR}/events.parquet"))


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf[sorted(pdf.columns)].sort_values(sorted(pdf.columns)).reset_index(drop=True)


def test_windowed_stats_stream_matches_batch(spark):
    stream = W.read_events_stream(spark, SF_DIR)
    W.run_to_memory(W.windowed_event_stats(stream), "win_stats", output_mode="complete")
    got = _norm(spark.table("win_stats").toPandas())
    want = _norm(W.windowed_event_stats(_batch_events(spark)).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_sliding_window_overlaps(spark):
    ev = _batch_events(spark)
    tumbling = W.windowed_event_stats(ev, window="2 hours")
    sliding = W.windowed_event_stats(ev, window="2 hours", slide="1 hour")
    assert sliding.count() > tumbling.count()


def test_sessionized_counts_stream_matches_batch(spark):
    stream = W.read_events_stream(spark, SF_DIR)
    W.run_to_memory(W.sessionized_counts(stream, gap="45 minutes"), "sess", "complete")
    got = _norm(spark.table("sess").toPandas())
    want = _norm(W.sessionized_counts(_batch_events(spark), gap="45 minutes").toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # total events across sessions == total events
    assert got["n_events"].sum() == _batch_events(spark).count()


def test_running_user_profile_stateful(spark):
    stream = W.read_events_stream(spark, SF_DIR)
    # timeout_minutes=None: a ProcessingTimeTimeout drain never
    # self-terminates under availableNow (burns the full await timeout)
    W.run_to_memory(
        W.running_user_profile(stream, timeout_minutes=None), "profiles", output_mode="update"
    )
    got = spark.table("profiles")
    # one availableNow pass over one file → final state is visible in the
    # last update per user; with a single trigger each user appears once
    latest = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
        F.max("max_value").alias("max_value"),
    )
    want = _batch_events(spark).groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    )
    g = _norm(latest.toPandas())
    w = _norm(want.toPandas())
    pd.testing.assert_frame_equal(
        g, w, check_dtype=False, check_exact=False, rtol=1e-9
    )


def test_streaming_dedup_drops_repeats_first_wins(spark):
    """A duplicated key must survive exactly once; dedup state carries
    the hash, and the streaming result matches batch dropDuplicates on
    the same data (append mode — dedup emits rows, not aggregates)."""
    from dataframeutils_spark.streaming import dedup as SD

    stream = W.read_events_stream(spark, SF_DIR)
    deduped = SD.streaming_dedup(stream, ("user_id", "event_type"), watermark="10 days")
    W.run_to_memory(deduped, "dedup_stream", output_mode="append")
    got = spark.table("dedup_stream")
    batch = SD.streaming_dedup(_batch_events(spark), ("user_id", "event_type"))
    assert got.count() == batch.count()
    assert got.groupBy("user_id", "event_type").count().filter(F.col("count") > 1).count() == 0


def test_streaming_content_dedup_hashes_not_text(spark):
    from dataframeutils_spark.streaming import dedup as SD

    rows = [(1, "same body", "2024-01-01 00:00:00"),
            (2, "same body", "2024-01-01 00:05:00"),
            (3, "other body", "2024-01-01 00:10:00")]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = SD.streaming_content_dedup(df)
    assert out.count() == 2
    assert "text_hash" in out.columns

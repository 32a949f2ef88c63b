"""Plan-shape regression tests: the scale claims each operator's
docstring makes, asserted on the optimized physical plan so a future
refactor cannot silently reintroduce a full-width scan, a lost
broadcast, or an extra shuffle. (Wall-clock benchmarks move with the
machine; plan shapes don't.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.sources.testdata import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_prepare_is_single_scan_no_joins(spark):
    """Quality + language evaluate inside ONE pruned scan projection —
    no self-joins of per-doc operator outputs."""
    from dataframeutils_spark.operators import pipeline

    df = pipeline.prepare_corpus_summary(load_table(spark, SF_DIR, "documents"))
    plan = _plan(df)
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert join not in plan, f"unexpected {join} in pipeline plan"
    # column pruning: the scan must read only the two needed columns
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_text_projections_have_no_exchange(spark):
    """text_stats / language_id / repetition_stats are scan-side
    projections — any Exchange means a shuffle crept in."""
    from dataframeutils_spark.operators import text

    docs = load_table(spark, SF_DIR, "documents")
    for fn in (text.text_stats, text.language_id, text.repetition_stats):
        assert "Exchange" not in _plan(fn(docs)), fn.__name__


def test_sales_by_nation_broadcasts_dimensions(spark):
    """Small dims (nation, region) must broadcast; the fact-fact joins
    must NOT broadcast the big sides."""
    from dataframeutils_spark import driver

    plan = _plan(driver.q_sales_by_nation(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2


def test_shared_spans_shuffles_hashes_not_text(spark):
    """The span groupBy must key on the 60-bit hash, never the span
    string (docstring claim: only 8-byte keys shuffle)."""
    from dataframeutils_spark.operators import dedup

    plan = _plan(dedup.shared_span_stats(load_table(spark, SF_DIR, "documents")))
    assert "hashpartitioning(span_h" in plan
    assert "hashpartitioning(shingle" not in plan


def test_hash_sample_single_aggregation_pass(spark):
    """hash_sample_summary = one map-side-combinable groupBy: exactly
    one shuffle exchange in the plan."""
    from dataframeutils_spark.operators import sampling

    plan = _plan(sampling.hash_sample_summary(load_table(spark, SF_DIR, "documents")))
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_overlap_join_is_equi_join(spark):
    """The overlap join must be a hash/sort-merge EQUI-join on
    (key, bucket) — never a BroadcastNestedLoop/Cartesian theta-join."""
    from dataframeutils_spark.operators import ranges

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 02:00:00")],
        "user_id long, l_start string, l_end string",
    ).select(
        "user_id",
        F.to_timestamp("l_start").alias("l_start"),
        F.to_timestamp("l_end").alias("l_end"),
    )
    right = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00", "2024-01-01 03:00:00")],
        "user_id long, r_start string, r_end string",
    ).select(
        "user_id",
        F.to_timestamp("r_start").alias("r_start"),
        F.to_timestamp("r_end").alias("r_end"),
    )
    plan = _plan(ranges.interval_overlap_join(left, right))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

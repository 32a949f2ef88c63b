"""Skew-hardening evidence (VERDICT r2 #8).

The dedup module's scale story names two defenses against hot keys:
distinct-before-shuffle on the shingle path, and AQE skew handling on
the one place a hot key genuinely concentrates — the LSH band-bucket
self-join, where a bucket shared by many near-identical docs puts the
whole bucket's pair explosion in one join partition. These tests pin
both claims to observed behavior instead of a docstring.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.operators import dedup

N_HOT = 200  # docs sharing identical text -> one LSH bucket per band
N_COLD = 100

HOT_TEXT = "the quick brown fox jumps over the lazy dog again and again"


@contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def hot_corpus(spark):
    rows = [(i, HOT_TEXT) for i in range(N_HOT)]
    rows += [
        (N_HOT + i, f"unique document number {i} alpha beta gamma delta {i * 7} end")
        for i in range(N_COLD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_bucket_pairs_complete_with_aqe_skew_split(spark, hot_corpus):
    """One bucket holding N_HOT identical docs must (a) yield exactly the
    C(N_HOT,2) true pairs, (b) finish inside a small time budget, and
    (c) actually trigger AQE's skewed-join split (skew=true in the
    executed adaptive plan) once thresholds are scaled down to test
    data sizes — the same mechanism that fires at 100 TB sizes with
    production thresholds."""
    sigs = dedup.minhash_signatures(dedup.shingles(hot_corpus), num_perm=16)
    with _conf(
        spark,
        **{
            # force the bucket join to sort-merge (broadcast joins
            # bypass OptimizeSkewedJoin entirely)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # production defaults need a 256 MB partition to call it
            # skewed; scale to test bytes so the optimizer sees the same
            # shape it would see at cluster scale
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    ):
        pairs = dedup.lsh_candidate_pairs(sigs, num_perm=16, bands=4)
        t0 = time.time()
        # collect() executes THIS DataFrame's query execution, so the
        # final adaptive plan is inspectable afterwards (count() builds
        # a separate plan instance whose AQE state we cannot see)
        n = len(pairs.collect())
        elapsed = time.time() - t0
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            pairs.explain("formatted")
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
    assert n == N_HOT * (N_HOT - 1) // 2
    assert elapsed < 60, f"hot-bucket join took {elapsed:.1f}s"
    assert "skew=true" in plan, "AQE skew-join split did not engage"


def test_hot_shingle_deduped_before_shuffle(spark, hot_corpus):
    """A stopword shingle appearing many times inside one doc must reach
    the shuffle once per doc, not once per occurrence — the
    distinct-before-shuffle claim."""
    spam = spark.createDataFrame(
        [(1, " ".join(["spam"] * 500) + " tail token")], "doc_id long, text string"
    )
    sh = dedup.shingles(spam)
    # 500x repeated token -> 'spam spam spam' shingle occurs ~498 times
    # but must be emitted once
    assert sh.count() == sh.distinct().count()
    assert (
        sh.filter(F.col("shingle") == "spam spam spam").count() == 1
    )


def test_inverted_index_hot_term_stays_bounded(spark, hot_corpus):
    """Every hot doc contains the same terms → each term's posting list
    covers all 200 hot docs. The salted two-phase bottom-k must (a)
    still report the EXACT df and (b) return the k smallest doc_ids,
    without funnelling the full list through one task (the partial
    slice caps per-salt payloads at max_postings)."""
    from dataframeutils_spark.operators import sketches

    out = {
        r["term"]: r
        for r in sketches.inverted_index(
            hot_corpus, max_postings=5, min_df=1, n_salts=8
        ).collect()
    }
    hot = out["quick"]
    assert hot["df"] == N_HOT
    assert hot["postings"] == "0,1,2,3,4"


def test_skew_report_flags_hot_key(spark):
    """A key owning ~half the rows tops the report with the right
    share / cumulative share / ratio-to-median."""
    from dataframeutils_spark.operators import skew

    rows = [(0, 99) for _ in range(100)] + [(i, i) for i in range(1, 101)]
    df = spark.createDataFrame(
        [(i, k) for i, (k, _) in enumerate(rows)], "event_id long, user_id long"
    )
    out = skew.skew_report(df, key_col="user_id", top_k=5).collect()
    assert len(out) == 5
    top = out[0]
    assert top["key"] == 0 and top["n"] == 100
    assert top["n_keys"] == 101
    assert abs(top["share"] - 100 / 200) < 1e-6
    assert abs(top["cum_share"] - 100 / 200) < 1e-6
    # median key count = 1 → the hot key is 100x the median
    assert abs(top["ratio_to_median"] - 100.0) < 1e-6
    # remaining rows are singleton keys in deterministic (n desc, key) order
    assert [r["key"] for r in out[1:]] == [1, 2, 3, 4]
    assert abs(out[2]["cum_share"] - 102 / 200) < 1e-6


def test_skew_report_uniform_keys_ratio_one(spark):
    """Uniform keys: every ratio_to_median is 1 and shares are equal."""
    from dataframeutils_spark.operators import skew

    df = spark.createDataFrame(
        [(i, i % 10) for i in range(1000)], "event_id long, user_id long"
    )
    out = skew.skew_report(df, key_col="user_id", top_k=10).collect()
    assert len(out) == 10
    assert all(r["n"] == 100 and abs(r["ratio_to_median"] - 1.0) < 1e-9 for r in out)
    assert abs(out[-1]["cum_share"] - 1.0) < 1e-6


def test_skew_report_null_key_orders_like_oracle(spark):
    """A NULL key group sitting exactly on the top-k boundary: Spark
    (asc_nulls_last pinned) and DuckDB (NULLS LAST pinned) must select
    the same rows in the same order — the gate compares hashes."""
    import duckdb
    import pandas as pd

    from dataframeutils_spark.operators import skew

    # NULL key owns 50 rows (2nd heaviest); keys 0..9 own 10 each
    # except key 0 with 100; top_k=2 puts NULL exactly at the boundary
    rows = [(i, 0) for i in range(100)]
    rows += [(100 + i, None) for i in range(50)]
    for k in range(1, 10):
        rows += [(1000 + 10 * k + j, k) for j in range(10)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    got = skew.skew_report(df, key_col="user_id", top_k=2).collect()
    assert [r["key"] for r in got] == [0, None]
    pdf = pd.DataFrame(
        {"event_id": [r[0] for r in rows], "user_id": [r[1] for r in rows]}
    )
    con = duckdb.connect()
    con.register("events", pdf)
    want = con.execute(skew.skew_report_sql(top_k=2)).fetchdf()
    assert list(want["key"].astype("object").where(want["key"].notna(), None)) \
        == [0, None]
    assert [r["cum_share"] for r in got] == list(want["cum_share"])

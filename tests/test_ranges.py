"""Interval (range) join and batch sessionization semantics."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dataframeutils_spark.operators import ranges
from tests.conftest import SF_DIR, assert_matches_oracle


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts")
    )


def _ivl(spark, rows):
    return (
        spark.createDataFrame(rows, "user_id string, w_start string, w_end string, tag string")
        .withColumn("w_start", F.to_timestamp("w_start"))
        .withColumn("w_end", F.to_timestamp("w_end"))
    )


def test_interval_join_boundaries_and_keys(spark):
    ev = _ts(
        spark,
        [
            ("u1", "2024-01-01 10:00:00", 1),  # == start: IN
            ("u1", "2024-01-01 11:00:00", 2),  # == end: OUT (half-open)
            ("u1", "2024-01-01 10:59:59", 3),  # just inside
            ("u1", "2024-01-01 09:59:59", 4),  # just before
            ("u2", "2024-01-01 10:30:00", 5),  # right time, wrong key
        ],
        "user_id string, ts string, event_id int",
    )
    ivl = _ivl(spark, [("u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00", "a")])
    got = {
        r["event_id"]
        for r in ranges.interval_join(ev, ivl, chunk_seconds=600).collect()
    }
    assert got == {1, 3}


def test_interval_join_spans_many_chunks_without_dups(spark):
    # interval 10x wider than the chunk: the event still matches ONCE
    ev = _ts(spark, [("u1", "2024-01-01 05:00:00", 1)], "user_id string, ts string, event_id int")
    ivl = _ivl(spark, [("u1", "2024-01-01 00:00:00", "2024-01-01 10:00:00", "wide")])
    rows = ranges.interval_join(ev, ivl, chunk_seconds=3600).collect()
    assert len(rows) == 1 and rows[0]["tag"] == "wide"


def test_interval_join_overlapping_intervals_multi_match(spark):
    ev = _ts(spark, [("u1", "2024-01-01 10:30:00", 1)], "user_id string, ts string, event_id int")
    ivl = _ivl(
        spark,
        [
            ("u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00", "a"),
            ("u1", "2024-01-01 10:15:00", "2024-01-01 10:45:00", "b"),
            ("u1", "2024-01-01 10:30:00", "2024-01-01 10:30:00", "empty"),  # inverted/empty
        ],
    )
    got = sorted(r["tag"] for r in ranges.interval_join(ev, ivl).collect())
    assert got == ["a", "b"]


def test_interval_join_matches_naive_theta_join(spark):
    """Randomized equivalence: bucketized equi-join == naive range join."""
    rng = random.Random(7)
    base = 1_700_000_000
    ev_rows = [
        (f"u{rng.randrange(4)}", base + rng.randrange(0, 50_000), i)
        for i in range(300)
    ]
    ivl_rows = [
        (f"u{rng.randrange(4)}", s := base + rng.randrange(0, 50_000), s + rng.randrange(1, 15_000), f"i{j}")
        for j in range(40)
    ]
    ev = spark.createDataFrame(ev_rows, "user_id string, sec long, event_id int").select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), "event_id"
    )
    ivl = spark.createDataFrame(
        ivl_rows, "user_id string, s long, e long, tag string"
    ).select(
        "user_id",
        F.timestamp_seconds("s").alias("w_start"),
        F.timestamp_seconds("e").alias("w_end"),
        "tag",
    )
    fast = {
        (r["event_id"], r["tag"])
        for r in ranges.interval_join(ev, ivl, chunk_seconds=2000).collect()
    }
    naive = {
        (r["event_id"], r["tag"])
        for r in ev.join(ivl, on="user_id")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .collect()
    }
    assert fast == naive and len(fast) > 0


def test_interval_join_plan_is_equi_join(spark):
    """The physical plan must be a hash/sort-merge EQUI-join on
    (key, bucket) — never BroadcastNestedLoopJoin (the theta-join
    disaster this operator exists to avoid)."""
    ev = _ts(spark, [("u1", "2024-01-01 10:00:00", 1)], "user_id string, ts string, event_id int")
    ivl = _ivl(spark, [("u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00", "a")])
    plan = (
        ranges.interval_join(ev, ivl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_sessionize_gap_semantics(spark):
    # >= gap starts a new session (session_window convention)
    ev = _ts(
        spark,
        [
            ("u1", "2024-01-01 10:00:00", 0),
            ("u1", "2024-01-01 10:29:59", 0),  # < 30 min: same session
            ("u1", "2024-01-01 10:59:59", 0),  # exactly 30:00 after #2: NEW
            ("u2", "2024-01-01 10:00:00", 0),
        ],
        "user_id string, ts string, pad int",
    )
    out = {
        (r["user_id"], r["session_id"]): (str(r["s_start"]), r["n_events"])
        for r in ranges.sessionize(ev, gap_seconds=1800).collect()
    }
    assert out[("u1", 1)] == ("2024-01-01 10:00:00", 2)
    assert out[("u1", 2)] == ("2024-01-01 10:59:59", 1)
    assert out[("u2", 1)] == ("2024-01-01 10:00:00", 1)


def test_range_attribution_matches_oracle(spark, ddb):
    from dataframeutils_spark import driver

    assert_matches_oracle(
        driver.q_range_attribution(spark, SF_DIR),
        ddb,
        driver.all_oracles()["range_attribution"],
    )


def test_sales_rollup_matches_oracle_and_single_pass(spark, ddb):
    from dataframeutils_spark import driver

    df = driver.q_sales_rollup(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one Expand feeding one aggregation — not a union of per-level scans
    assert plan.count("Expand") >= 1
    assert "BroadcastHashJoin" in plan
    assert_matches_oracle(df, ddb, driver.all_oracles()["sales_rollup"])


def test_events_value_profile_exact_and_approx(spark, ddb):
    from dataframeutils_spark import driver

    exact = driver.q_events_value_profile(spark, SF_DIR)
    assert_matches_oracle(
        exact, ddb, driver.all_oracles()["events_value_profile"]
    )
    ex = {r["event_type"]: r for r in exact.collect()}
    ap = {
        r["event_type"]: r
        for r in driver.q_events_value_profile_approx(spark, SF_DIR).collect()
    }
    assert set(ex) == set(ap)
    for t in ex:
        assert ap[t]["n"] == ex[t]["n"]
        # HLL rsd=2%: allow 10% slack on tiny fixture cardinalities
        assert abs(ap[t]["n_users_approx"] - ex[t]["n_users"]) <= max(
            3, 0.1 * ex[t]["n_users"]
        )
        # GK sketch with accuracy 10000 is exact-ish at fixture size
        assert abs(ap[t]["p50"] - ex[t]["p50"]) <= 0.05 * abs(ex[t]["p50"]) + 1e-6


def test_interval_overlap_join_exactly_once_per_pair(spark):
    """Pairs overlapping MANY chunks must still emit once (first-shared-
    chunk dedup), non-overlapping and touching-at-boundary pairs not at
    all (half-open semantics)."""
    from pyspark.sql import functions as F

    from dataframeutils_spark.operators import ranges

    def iv(rows, s, e):
        return (
            spark.createDataFrame(rows, f"user_id long, {s} string, {e} string")
            .withColumn(s, F.to_timestamp(s))
            .withColumn(e, F.to_timestamp(e))
        )

    left = iv(
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 10:00:00"),  # 10h span
            (1, "2024-01-01 20:00:00", "2024-01-01 21:00:00"),
            (2, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        ],
        "l_start",
        "l_end",
    )
    right = iv(
        [
            (1, "2024-01-01 05:00:00", "2024-01-01 23:00:00"),  # overlaps both of user 1's
            (2, "2024-01-01 01:00:00", "2024-01-01 02:00:00"),  # touches boundary: no overlap
        ],
        "r_start",
        "r_end",
    )
    # chunk=1h: the first pair shares 5 chunks; must emit exactly once
    got = ranges.interval_overlap_join(left, right, chunk_seconds=3600).collect()
    pairs = sorted((r["user_id"], str(r["l_start"]), str(r["r_start"])) for r in got)
    assert pairs == [
        (1, "2024-01-01 00:00:00", "2024-01-01 05:00:00"),
        (1, "2024-01-01 20:00:00", "2024-01-01 05:00:00"),
    ]

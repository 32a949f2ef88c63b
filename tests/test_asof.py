"""As-of join semantics and the relational (star-schema) query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.operators import asof
from tests.conftest import SF_DIR, assert_matches_oracle


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00", 1),
            ("u1", "2024-01-01 11:30:00", 2),
            ("u1", "2024-01-01 09:00:00", 3),
            ("u2", "2024-01-01 10:00:00", 4),
        ],
        "user_id string, ts string, event_id int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00", 10.0),
            ("u1", "2024-01-01 11:00:00", 11.0),
            ("u3", "2024-01-01 00:00:00", 99.0),
        ],
        "user_id string, ts string, score double",
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def test_asof_join_inclusive_latest_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["score_asof"], r["ts_asof"])
        for r in asof.asof_join(left, right, value_cols=("score",)).collect()
    }
    assert len(out) == 4  # every left row survives
    # equal timestamp is visible (inclusive >=)
    assert out[1][0] == 10.0
    # strictly-latest preceding right row wins, not the first
    assert out[2][0] == 11.0
    # left row before any right row, and a key with no right rows → NULL
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_asof_join_keeps_all_left_columns(spark):
    left, right = _frames(spark)
    cols = asof.asof_join(left, right, value_cols=("score",)).columns
    assert cols == ["user_id", "ts", "event_id", "score_asof", "ts_asof"]


def test_asof_join_is_one_pass_not_a_range_join(spark):
    """The plan must be union + window (linear), never a theta-join
    (quadratic per key): no Join node at all in the physical plan."""
    left, right = _frames(spark)
    plan = (
        asof.asof_join(left, right, value_cols=("score",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_profile_matches_duckdb_asof(spark, ddb):
    from dataframeutils_spark import driver

    assert_matches_oracle(
        driver.q_asof_profile(spark, SF_DIR), ddb, driver.all_oracles()["asof_profile"]
    )


def test_sales_by_nation_broadcasts_dims_and_matches(spark, ddb):
    from dataframeutils_spark import driver

    df = driver.q_sales_by_nation(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # nation/region never shuffle the fact
    assert_matches_oracle(df, ddb, driver.all_oracles()["sales_by_nation"])


def test_asof_nearest_picks_closer_side_and_ties_backward(spark):
    """nearest: each left row takes whichever right row is closer in
    time; exact-distance ties go to the at-or-before match; tolerance
    bounds BOTH sides independently."""
    import datetime as dt

    from dataframeutils_spark.operators import asof

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 1, T(10)),   # closer to right@12 (2m) than right@5 (5m)
         (2, 1, T(6)),    # closer to right@5 (1m)
         (3, 1, T(30)),   # nothing within 10m tolerance
         (4, 1, T(12))],  # exact match at 12
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, T(5), 50.0), (1, T(12), 120.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {r["event_id"]: r for r in asof.asof_join(
        left, right, on="ts", by=("user_id",), value_cols=("v",),
        direction="nearest", tolerance_seconds=600,
    ).collect()}
    assert out[1]["v_asof"] == 120.0
    assert out[2]["v_asof"] == 50.0
    assert out[3]["v_asof"] is None and out[3]["ts_asof"] is None
    assert out[4]["v_asof"] == 120.0  # exact ts wins at distance 0
    # equidistant: left@8.5 is 3.5m from both -> backward (50.0) wins
    mid = spark.createDataFrame(
        [(9, 1, dt.datetime(2024, 1, 1, 0, 8, 30))],
        "event_id long, user_id long, ts timestamp",
    )
    r = asof.asof_join(
        mid, right, on="ts", by=("user_id",), value_cols=("v",),
        direction="nearest",
    ).collect()[0]
    assert r["v_asof"] == 50.0
    # allow_exact_matches=False is refused for nearest
    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof.asof_join(mid, right, direction="nearest",
                       allow_exact_matches=False)

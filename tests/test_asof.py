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

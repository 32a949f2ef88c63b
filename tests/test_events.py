"""Funnel / cohort-retention analytics (operators.events).

Hand-built event logs with known conversions pin the step semantics
(strictly-after ordering, the anchored conversion window, grid-anchored
cohorts); the driver oracle covers the full-table exactness at sf0.01.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.operators import events as ev


def _ts(day: int, hour: int = 0, minute: int = 0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture()
def log(spark):
    rows = [
        # u1: full clean conversion view -> click -> purchase
        (1, _ts(1, 9), "view"),
        (1, _ts(1, 10), "click"),
        (1, _ts(1, 11), "purchase"),
        # u2: click BEFORE the first view must not count; no purchase
        (2, _ts(2, 8), "click"),
        (2, _ts(2, 9), "view"),
        (2, _ts(2, 10), "click"),
        # u3: view only
        (3, _ts(3, 9), "view"),
        # u4: purchase 10 days after first view — outside a 7-day window
        (4, _ts(1, 9), "view"),
        (4, _ts(1, 10), "click"),
        (4, _ts(11, 9), "purchase"),
        # u5: no view at all — never enters the funnel
        (5, _ts(1, 9), "purchase"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_strict_order_and_window(spark, log):
    out = {
        r["step_name"]: r
        for r in ev.funnel(
            log, ["view", "click", "purchase"], within_seconds=7 * 86_400
        ).collect()
    }
    assert out["view"]["n_users"] == 4  # u1,u2,u3,u4 (u5 never views)
    assert out["click"]["n_users"] == 3  # u1,u2,u4 — u2's pre-view click ignored
    assert out["purchase"]["n_users"] == 1  # u1 only; u4 is outside the window
    assert out["click"]["conv_from_prev"] == pytest.approx(3 / 4)
    assert out["purchase"]["conv_from_first"] == pytest.approx(1 / 4)
    # u1 converted view->click in exactly 1h; u2 in 1h; u4 in 1h
    assert out["click"]["avg_secs_from_prev"] == pytest.approx(3600.0)
    assert out["view"]["avg_secs_from_prev"] is None


def test_funnel_unbounded_window_admits_late_purchase(spark, log):
    out = {
        r["step_name"]: r
        for r in ev.funnel(log, ["view", "click", "purchase"]).collect()
    }
    assert out["purchase"]["n_users"] == 2  # u4's day-11 purchase now counts


def test_retention_grid_anchored_cohorts(spark):
    # u1 first active day 0 -> cohort day 0; active again days 8 (offset 1)
    # u2 first active day 9 -> cohort day 7 (grid floor); active day 15 (offset 1)
    rows = [
        (1, dt.datetime(1970, 1, 1)),
        (1, dt.datetime(1970, 1, 9)),
        (2, dt.datetime(1970, 1, 10)),
        (2, dt.datetime(1970, 1, 16)),
        (2, dt.datetime(1970, 1, 10, 5)),  # same day twice -> one cell
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort_date"], r["period_offset"]): r
        for r in ev.retention_cohorts(df, period_days=7).collect()
    }
    assert set(out) == {
        (dt.date(1970, 1, 1), 0),
        (dt.date(1970, 1, 1), 1),
        (dt.date(1970, 1, 8), 0),
        (dt.date(1970, 1, 8), 1),
    }
    for k, r in out.items():
        assert r["n_active"] == 1 and r["cohort_size"] == 1
        assert r["retention_rate"] == pytest.approx(1.0)


def test_funnel_single_user_exchange(spark, log):
    """Scale claim: all per-step windows + the per-user reduction ride
    ONE hash exchange on user_id; remaining exchanges only carry the
    steps-row summary."""
    plan = (
        ev.funnel(log, ["view", "click", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning(user_id") == 1


def test_attribution_last_touch_and_linear(spark):
    rows = [
        # u1: view(1h) click(2h) purchase(3h, value 10): click is last
        # touch; linear splits 5/5
        (1, _ts(1, 9), "view", 0.0),
        (1, _ts(1, 10), "click", 0.0),
        (1, _ts(1, 11), "purchase", 10.0),
        # u2: touch outside 24h lookback gets nothing
        (2, _ts(1, 9), "view", 0.0),
        (2, _ts(3, 9), "purchase", 7.0),
        # u3: two views only, no click: both linear-credited, last view wins
        (3, _ts(2, 8), "view", 0.0),
        (3, _ts(2, 9), "view", 0.0),
        (3, _ts(2, 10), "purchase", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    out = {
        r["touch_type"]: r
        for r in ev.attribution(
            df, "purchase", ["view", "click"], lookback_seconds=86_400
        ).collect()
    }
    assert out["click"]["n_conversions_last"] == 1
    assert out["click"]["credit_last"] == pytest.approx(10.0)
    assert out["click"]["credit_linear"] == pytest.approx(5.0)
    assert out["view"]["n_conversions_last"] == 1  # u3's later view
    assert out["view"]["credit_last"] == pytest.approx(4.0)
    assert out["view"]["credit_linear"] == pytest.approx(5.0 + 4.0)
    # u2's conversion is unattributed (touch outside lookback)
    assert out["view"]["n_touches"] + out["click"]["n_touches"] == 4


def test_event_paths_sessionized_grams(spark):
    rows = [
        # one session: a b c d -> paths a>b>c, b>c>d
        (1, _ts(1, 9, 0), "a"), (1, _ts(1, 9, 5), "b"),
        (1, _ts(1, 9, 10), "c"), (1, _ts(1, 9, 15), "d"),
        # session break (>30 min): new session a b only -> no 3-gram
        (1, _ts(1, 11, 0), "a"), (1, _ts(1, 11, 5), "b"),
        # u2 repeats a>b>c
        (2, _ts(1, 9, 0), "a"), (2, _ts(1, 9, 1), "b"), (2, _ts(1, 9, 2), "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["path"]: r["n"] for r in ev.event_paths(df, depth=3, k=10).collect()}
    assert out == {"a>b>c": 2, "b>c>d": 1}


def test_scd2_as_of_reconstructs_snapshots(spark):
    from dataframeutils_spark.operators import pipeline

    changes = spark.createDataFrame(
        [
            (1, "a", "upsert", 1), (1, "b", "upsert", 3), (1, None, "delete", 5),
            (2, "x", "upsert", 2),
        ],
        "doc_id long, text string, op string, seq int",
    )
    hist = pipeline.scd2_history(changes)

    def snap(s):
        return {r["doc_id"]: r["text"] for r in pipeline.scd2_as_of(hist, s).collect()}

    assert snap(1) == {1: "a"}
    assert snap(2) == {1: "a", 2: "x"}
    assert snap(4) == {1: "b", 2: "x"}
    assert snap(6) == {2: "x"}  # key 1 deleted at seq 5


def test_active_users_dau_wau(spark):
    rows = [
        (1, _ts(1, 9)), (2, _ts(1, 10)), (1, _ts(1, 11)),  # day1: dau 2
        (1, _ts(5, 9)),                                    # day5: dau 1
        (3, _ts(20, 9)),                                   # day20: dau 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {str(r["date"]): r for r in ev.active_users(df, window_days=7).collect()}
    assert set(out) == {"2024-01-01", "2024-01-05", "2024-01-20"}
    assert out["2024-01-01"]["dau"] == 2 and out["2024-01-01"]["wau"] == 2
    # day5 window [day-6, day5] covers day1: users 1,2 + day5's user 1
    assert out["2024-01-05"]["dau"] == 1 and out["2024-01-05"]["wau"] == 2
    # day20 is isolated
    assert out["2024-01-20"]["dau"] == 1 and out["2024-01-20"]["wau"] == 1


def test_retention_pre_epoch_days_floor_not_truncate(spark):
    # 1969 timestamps have negative epoch days: floor division must
    # place them on the correct UTC day (cast-truncate would shift +1)
    rows = [
        (1, dt.datetime(1969, 12, 30, 23)),  # day -2
        (1, dt.datetime(1970, 1, 6, 1)),     # day 5
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (str(r["cohort_date"]), r["period_offset"]): r["n_active"]
        for r in ev.retention_cohorts(df, period_days=7).collect()
    }
    # day -2 floors to cohort grid day -7 -> cohort date 1969-12-25;
    # day 5 is offset (5 - (-7)) // 7 = 1
    assert out == {("1969-12-25", 0): 1, ("1969-12-25", 1): 1}


def test_cap_per_group_caps_and_nests(spark):
    """≤ cap rows per group; small groups untouched; cap-k selection is
    a subset of cap-(k+m) selection (same hash order)."""
    from dataframeutils_spark.operators import sampling

    rows = [(i, "big") for i in range(100)] + [(200 + i, "small") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    k10 = sampling.cap_per_group(df, cap=10, strat_col="source").collect()
    by = {}
    for r in k10:
        by.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by["big"]) == 10 and len(by["small"]) == 5
    k30 = sampling.cap_per_group(df, cap=30, strat_col="source").collect()
    big30 = {r["doc_id"] for r in k30 if r["source"] == "big"}
    assert len(big30) == 30 and by["big"] <= big30


def test_late_data_audit_counts_jittered_stragglers(spark):
    """A hand-built arrival sequence: events 0..99 in time order except
    one straggler arriving 2000 s late — exactly it is dropped at a
    600 s watermark and lateness stats reflect it."""
    import datetime as dt

    from dataframeutils_spark.operators import events as ev_ops

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(100):
        rows.append((i, base + dt.timedelta(seconds=10 * i), "a"))
    # straggler: arrives at seq 99.5*10 but carries an OLD timestamp
    rows.append((1000, base + dt.timedelta(seconds=990 - 2000), "a"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = ev_ops.late_data_audit(
        df, seq_col="event_id", watermark_secs=600.0, bucket=10
    ).collect()[0]
    assert out["n"] == 101
    assert out["n_dropped"] == 1
    # the straggler is ~2900 s behind the watermark of its bucket's
    # predecessor (990 s running max vs its -1010 s event time)
    assert out["max_late_secs"] > 1900
    assert 0 < out["frac_dropped"] < 0.02


def test_late_data_audit_ordered_stream_drops_nothing(spark):
    import datetime as dt

    from dataframeutils_spark.operators import events as ev_ops

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=i), "t") for i in range(500)],
        "event_id long, ts timestamp, event_type string",
    )
    out = ev_ops.late_data_audit(df, seq_col="event_id", watermark_secs=1.0, bucket=50).collect()[0]
    assert out["n_dropped"] == 0 and out["max_late_secs"] == 0.0


def test_late_data_audit_negative_seq_matches_oracle_truncation(spark):
    """Pre-epoch-style negative arrival sequences: Spark's integral DIV
    and DuckDB's // both truncate toward zero, so bucket assignment (and
    therefore the watermark ledger) matches across engines. The old
    double-divide-then-cast path agreed on truncation but lost exactness
    above 2^53; this pins the pure-integer form against the oracle."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from dataframeutils_spark.operators import events as ev_ops

    base = dt.datetime(2024, 1, 1)
    # arrival seqs straddle zero: -15..-1 then 0..24, in time order
    # except one straggler carrying an old timestamp
    seqs = list(range(-15, 25))
    rows = [
        (s, base + dt.timedelta(seconds=10 * (s + 15)), "a") for s in seqs
    ]
    rows.append((25, base + dt.timedelta(seconds=-5000), "a"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = ev_ops.late_data_audit(
        df, seq_col="event_id", watermark_secs=600.0, bucket=10
    ).collect()[0]
    pdf = pd.DataFrame(
        {"event_id": [r[0] for r in rows],
         "ts": [r[1] for r in rows],
         "event_type": [r[2] for r in rows]}
    )
    con = duckdb.connect()
    con.register("events", pdf)
    want = con.execute(
        ev_ops.late_data_audit_sql(watermark_secs=600.0, bucket=10)
    ).fetchdf().iloc[0]
    assert got["n"] == want["n"] == len(rows)
    assert got["n_dropped"] == want["n_dropped"] == 1
    assert got["frac_dropped"] == want["frac_dropped"]
    assert got["max_late_secs"] == want["max_late_secs"]


def test_diurnal_profile_bot_vs_uniform(spark):
    """A cron-like type firing at exactly 03:00 every day has R̄ = 1,
    peak hour 3, p ≈ 0; a type spread evenly around the clock has
    R̄ ≈ 0 and is not concentrated. A pair straddling midnight
    (23:00 & 01:00) must average to peak hour 0, not 12 — the wrap
    case linear histograms get wrong."""
    import datetime as dt

    from dataframeutils_spark.operators import events as E

    rows = []
    for d in range(1, 11):
        rows.append((f"e{d}", dt.datetime(2024, 1, d, 3, 0), "cron"))
    for i in range(24):
        rows.append((f"u{i}", dt.datetime(2024, 1, 1 + i, i, 0), "organic"))
    rows += [("m1", dt.datetime(2024, 1, 1, 23, 0), "wrap"),
             ("m2", dt.datetime(2024, 1, 2, 1, 0), "wrap")]
    ev = spark.createDataFrame(rows, "event_id string, ts timestamp, event_type string")
    out = {r["event_type"]: r for r in E.diurnal_profile(ev).collect()}
    cron = out["cron"]
    assert abs(cron["resultant"] - 1.0) < 1e-6
    assert abs(cron["peak_hour"] - 3.0) < 1e-6
    assert cron["concentrated"] is True and cron["circ_std"] < 1e-3
    org = out["organic"]
    assert org["resultant"] < 0.05 and org["concentrated"] is False
    wrap = out["wrap"]
    assert wrap["peak_hour"] < 1e-6 or wrap["peak_hour"] > 23.999

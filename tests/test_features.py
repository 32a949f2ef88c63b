"""Feature-preparation operators: binning, lag/rolling matrix, PSI."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.operators import features


@pytest.fixture(scope="module")
def ev(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [
        (
            i,
            i % 10,
            base + dt.timedelta(minutes=i),
            "a" if i % 3 else "b",
            float(i % 97),
        )
        for i in range(2000)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_quantile_bin_covers_all_rows_evenly(spark, ev):
    out = features.quantile_bin(ev, n_bins=10).collect()
    assert sum(r["n"] for r in out) == 2000
    per_bin = {}
    for r in out:
        assert 0 <= r["bin"] <= 9
        assert r["v_min"] <= r["v_max"]
        per_bin[r["bin"]] = per_bin.get(r["bin"], 0) + r["n"]
    # quantile boundaries must roughly equalize global bin mass
    assert max(per_bin.values()) <= 2 * min(per_bin.values())
    # bins are value-ordered: every bin's max stays below the next bin's min
    lo = {}
    hi = {}
    for r in out:
        lo[r["bin"]] = min(lo.get(r["bin"], r["v_min"]), r["v_min"])
        hi[r["bin"]] = max(hi.get(r["bin"], r["v_max"]), r["v_max"])
    for b in range(9):
        if b in hi and b + 1 in lo:
            assert hi[b] <= lo[b + 1]


def test_feature_matrix_no_future_leakage(spark, ev):
    out = features.feature_matrix(ev, window=5)
    rows = {r["event_id"]: r for r in out.filter(F.col("user_id") == 3).collect()}
    # user 3 sees events 3, 13, 23, ... in ts order; lag1 of event 23
    # must be event 13's value and roll_mean must average PAST values
    assert rows[3]["lag1"] is None and rows[3]["n_prev"] == 0
    assert rows[13]["lag1"] == pytest.approx(3.0)
    assert rows[23]["lag2"] == pytest.approx(3.0)
    assert rows[43]["roll_mean"] == pytest.approx((3 + 13 + 23 + 33 + 43) / 5)
    assert rows[3]["roll_std"] is None  # a single row has no sample std


def test_psi_zero_on_identical_distributions(spark, ev):
    # even/odd ids draw from the same i%97 cycle → near-zero drift
    out = {r["event_type"]: r for r in features.psi_drift(ev).collect()}
    for r in out.values():
        assert abs(r["psi"]) < 0.05


def test_psi_flags_planted_drift(spark, ev):
    shifted = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 2 == 1, F.col("value") + 80.0).otherwise(
            F.col("value")
        ),
    )
    out = features.psi_drift(shifted).collect()
    assert all(r["psi"] > 0.2 for r in out), out  # conventional alarm level
    assert all(math.isfinite(r["psi"]) for r in out)  # eps kills ln(0)


def test_dsir_select_prefers_target_like_docs(spark):
    """Raw docs written in the target domain's vocabulary must outrank
    raw docs written in a disjoint vocabulary (the importance weight
    is exactly the target/raw bucket-model log-ratio)."""
    from dataframeutils_spark.operators import sampling

    a_vocab = "code data spark query join table scan filter merge sort"
    b_vocab = "moss fern lichen birch cedar alder willow aspen maple oak"
    rows = []
    for i in range(40):  # target slice: vocabulary A
        rows.append((i, f"{a_vocab} doc {i} " + a_vocab, "target_src", 100))
    for i in range(20):  # raw pool, target-like
        rows.append((100 + i, f"{a_vocab} sample {i} " + a_vocab, "raw_src", 100))
    for i in range(20):  # raw pool, off-domain
        rows.append((200 + i, f"{b_vocab} sample {i} " + b_vocab, "raw_src", 100))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    out = sampling.dsir_select(
        docs, target_sources=("target_src",), k=20
    ).collect()
    assert len(out) == 20
    picked = {r["doc_id"] for r in out}
    assert picked == {100 + i for i in range(20)}, picked
    assert all(r["selected"] for r in out)


def test_null_values_excluded_symmetrically(spark, ev):
    """NULL policy: NULL values join neither the boundaries nor the
    counts — and the exclusion happens in BOTH the Spark operator and
    the DuckDB oracle SQL. Without the explicit filter Spark's
    F.aggregate fold yields a NULL bin while DuckDB's list_filter
    yields bin 0 — a silent engine divergence the parquet testdata
    (no NULLs) would never surface."""
    import duckdb

    nulled = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value")),
    )
    out = features.quantile_bin(nulled, n_bins=10).collect()
    assert sum(r["n"] for r in out) == 2000 - 400  # NULL rows dropped
    assert all(r["bin"] is not None for r in out)

    psi = features.psi_drift(nulled).collect()
    assert all(r["n_ref"] + r["n_cur"] > 0 and r["psi"] is not None for r in psi)

    # oracle symmetry on the same NULL-bearing frame
    pdf = nulled.select("event_id", "event_type", "value").toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    want = con.execute(features.quantile_bin_sql()).fetchdf()
    assert int(want["n"].sum()) == 1600
    got = {(r["event_type"], r["bin"]): r["n"] for r in out}
    for _, w in want.iterrows():
        assert got[(w["event_type"], int(w["bin"]))] == int(w["n"])


def test_decayed_value_matches_closed_form(ev):
    """Hand-check one user against the closed-form sum; recency is the
    gap from the newest event anywhere in the corpus."""
    out = {r["user_id"]: r for r in features.decayed_value(ev, half_life_days=7.0).collect()}
    # corpus anchor = event 1999 at base + 1999 minutes
    rows = [(i, float(i % 97)) for i in range(2000) if i % 10 == 3]
    expect = sum(
        v * 0.5 ** (((1999 - i) * 60.0 / 86400.0) / 7.0) for i, v in rows
    )
    got = out[3]
    assert got["n"] == len(rows)
    assert math.isclose(got["decayed_sum"], expect, rel_tol=1e-5)
    # newest user-3 event is i=1993 → 6 minutes before the anchor
    assert math.isclose(got["recency_days"], 6 * 60.0 / 86400.0, rel_tol=1e-5)
    # weights ≤ 1 ⇒ decayed_n < n, and recency orders with activity
    assert 0 < got["decayed_n"] < got["n"]


def test_decayed_value_half_life_monotonic(ev):
    """A longer half-life decays less: every user's decayed_sum is
    non-decreasing in half_life (strict for any user with history)."""
    short = {r["user_id"]: r["decayed_sum"] for r in features.decayed_value(ev, half_life_days=1.0).collect()}
    long_ = {r["user_id"]: r["decayed_sum"] for r in features.decayed_value(ev, half_life_days=30.0).collect()}
    assert all(long_[u] >= short[u] for u in short)
    assert any(long_[u] > short[u] for u in short)


def test_winsorize_clips_tails_only(spark):
    """With 100 uniform values and [0.1, 0.9] bounds, ~10 clip on each
    side, the winsorized mean moves toward the center, and a group
    with no outliers is untouched."""
    rows = [(i, "u", float(i)) for i in range(101)] + [
        (200 + i, "flat", 5.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["event_type"]: r for r in features.winsorize_stats(df, lo=0.1, hi=0.9).collect()}
    u = out["u"]
    assert u["p_lo"] == 10.0 and u["p_hi"] == 90.0
    assert u["n_clipped_lo"] == 10 and u["n_clipped_hi"] == 10
    assert u["mean_raw"] == 50.0 and u["mean_winsorized"] == 50.0  # symmetric
    flat = out["flat"]
    assert flat["n_clipped_lo"] == 0 and flat["n_clipped_hi"] == 0
    assert flat["mean_winsorized"] == 5.0


def test_winsorize_asymmetric_outliers_shift_mean(spark):
    """A single huge outlier: the raw mean is inflated, the winsorized
    mean is not."""
    rows = [(i, "t", 1.0) for i in range(99)] + [(99, "t", 1e9)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = features.winsorize_stats(df, lo=0.01, hi=0.95).collect()[0]
    assert r["n_clipped_hi"] == 1
    assert r["mean_raw"] > 1e6 and r["mean_winsorized"] < 2.0

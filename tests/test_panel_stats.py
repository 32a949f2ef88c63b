"""Golden-file parity (vs /root/reference/out_*.csv) and DuckDB-oracle
parity for the closed-form panel statistics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dataframeutils_spark import driver, oracles
from dataframeutils_spark.operators import panel_stats
from dataframeutils_spark.schema import PanelSchema, melt_panel

from tests.conftest import SF_DIR, assert_matches_oracle
from tests.ref_fixture import golden, reference_panel

REF_SCHEMA = PanelSchema(date_col="date", group_cols=["name"])


@pytest.fixture(scope="module")
def ref_long(spark):
    pdf = reference_panel()
    sdf = spark.createDataFrame(pdf)
    return melt_panel(sdf, REF_SCHEMA).cache()


def _to_lookup(pdf: pd.DataFrame, keys: list[str], vals: list[str]):
    return {
        tuple(row[k] for k in keys): tuple(row[v] for v in vals)
        for _, row in pdf.iterrows()
    }


def test_distribution_matches_golden(ref_long):
    got = panel_stats.distribution_diagnostics(ref_long).toPandas()
    want = golden("out_distribution.csv")
    assert len(got) == len(want) == 15
    g = _to_lookup(got, ["grp", "feature"], ["mean", "std", "skew", "kurtosis"])
    for _, row in want.iterrows():
        m, s, sk, ku = g[(row["group"], row["feature"])]
        np.testing.assert_allclose(
            [m, s, sk, ku],
            [row["mean"], row["std"], row["skew"], row["kurtosis"]],
            rtol=1e-9,
        )


def test_ar1_matches_golden(ref_long):
    got = panel_stats.predictability_ar1(ref_long).toPandas()
    want = golden("out_ar1.csv")
    assert len(got) == len(want) == 15
    g = _to_lookup(got, ["grp", "feature"], ["ar1_r2"])
    for _, row in want.iterrows():
        np.testing.assert_allclose(
            g[(row["group"], row["feature"])][0], row["ar1_r2"], rtol=1e-9
        )


def test_dispersion_matches_golden(ref_long):
    got = panel_stats.cross_sectional_dispersion(ref_long, "feature_1").toPandas()
    want = golden("out_cross_section_dispersion_feature1.csv")
    assert len(got) == len(want) == 60
    got["date"] = pd.to_datetime(got["date"])
    want["date"] = pd.to_datetime(want["date"])
    merged = got.merge(want, on="date")
    np.testing.assert_allclose(
        merged["dispersion"], merged["dispersion_feature_1"], rtol=1e-9
    )


def test_distribution_nan_and_short_series(spark):
    """NULL policy on a tiny panel: n=1 → std NULL; NaN treated as missing."""
    pdf = pd.DataFrame(
        {
            "date": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-01"]),
            "name": ["A", "A", "A", "B"],
            "f": [1.0, np.nan, 3.0, 5.0],
        }
    )
    long_df = melt_panel(
        spark.createDataFrame(pdf), PanelSchema(date_col="date", group_cols=["name"])
    )
    got = panel_stats.distribution_diagnostics(long_df).toPandas().set_index("grp")
    assert got.loc["A", "n"] == 2  # NaN dropped
    assert got.loc["A", "mean"] == 2.0
    assert np.isclose(got.loc["A", "std"], np.std([1.0, 3.0], ddof=1))
    assert pd.isna(got.loc["A", "skew"])  # n < 3
    assert pd.isna(got.loc["B", "std"])  # n < 2


@pytest.mark.parametrize(
    "qname",
    ["panel_distribution", "panel_dispersion", "panel_ar1"],
)
def test_driver_oracle_parity(spark, ddb, qname):
    q = driver.all_queries()[qname]
    sql = driver.all_oracles()[qname]
    assert_matches_oracle(q(spark, SF_DIR), ddb, sql)


def test_forward_fill_semantics(spark):
    import datetime as dt

    rows = [
        ("A", dt.date(2024, 1, 1), "f", None),   # leading null stays null
        ("A", dt.date(2024, 1, 2), "f", 1.0),
        ("A", dt.date(2024, 1, 3), "f", None),   # filled with 1.0
        ("A", dt.date(2024, 1, 4), "f", 2.0),
        ("B", dt.date(2024, 1, 3), "f", None),   # other series: no bleed
    ]
    long_df = spark.createDataFrame(rows, "grp string, date date, feature string, value double")
    got = {
        (r["grp"], r["date"].isoformat()): (r["value_filled"], r["was_filled"])
        for r in panel_stats.forward_fill(long_df).collect()
    }
    assert got[("A", "2024-01-01")] == (None, False)
    assert got[("A", "2024-01-03")] == (1.0, True)
    assert got[("A", "2024-01-04")] == (2.0, False)
    assert got[("B", "2024-01-03")] == (None, False)


def test_resample_panel_weekly_ohlc(spark):
    import datetime as dt

    # 2024-01-01 is a Monday: days 1..7 one ISO week, day 8 the next
    rows = [("A", dt.date(2024, 1, d), "f", float(v)) for d, v in [(1, 5), (3, 9), (7, 2), (8, 4)]]
    long_df = spark.createDataFrame(rows, "grp string, date date, feature string, value double")
    got = {r["bucket"].isoformat(): r for r in panel_stats.resample_panel(long_df).collect()}
    w1 = got["2024-01-01"]
    assert (w1["n"], w1["open"], w1["high"], w1["low"], w1["close"], w1["mean"]) == (
        3, 5.0, 9.0, 2.0, 2.0, (5 + 9 + 2) / 3,
    )
    assert got["2024-01-08"]["n"] == 1 and got["2024-01-08"]["open"] == 4.0


@pytest.mark.parametrize("qname", ["panel_ffill", "panel_resample"])
def test_driver_oracle_parity_round4(spark, ddb, qname):
    q = driver.all_queries()[qname]
    sql = driver.all_oracles()[qname]
    assert_matches_oracle(q(spark, SF_DIR), ddb, sql)


def test_mad_outliers_resists_masking(spark):
    """One extreme point inflates stddev enough to mask a second,
    smaller outlier from the z-score — the MAD score flags both."""
    import datetime as dt

    from dataframeutils_spark.operators import outliers

    vals = [10.0] * 20 + [11.0] * 20 + [500.0, 60.0]
    rows = [
        ("A", dt.date(2024, 1, 1) + dt.timedelta(days=i), "feature_1", v)
        for i, v in enumerate(vals)
    ]
    long_df = spark.createDataFrame(
        rows, "grp string, date date, feature string, value double"
    )
    r = outliers.mad_outliers(long_df, "feature_1", threshold=3.5).collect()[0]
    assert r["n"] == 42
    assert r["med"] == 11.0 and r["mad"] == 1.0
    # both 500 and 60 exceed |M| > 3.5 under MAD scaling
    assert r["n_outliers"] == 2
    # plain z-score only catches the giant one: stddev ~75 masks 60
    z = outliers.zscore_outliers(long_df, "feature_1", threshold=3.0).collect()[0]
    assert z["n_outliers"] == 1


@pytest.mark.parametrize("qname", ["mad_outliers"])
def test_driver_oracle_parity_mad(spark, ddb, qname):
    q = driver.all_queries()[qname]
    sql = driver.all_oracles()[qname]
    assert_matches_oracle(q(spark, SF_DIR), ddb, sql)


def test_ar_yule_walker_recovers_ar1(spark):
    """On a synthetic AR(1) series the YW fit should put most weight
    on phi1 and the PACF should cut off: |pacf2|, |phi3| small; also
    statsmodels-free sanity via the analytic AR(1) ACF r_k = rho^k."""
    import numpy as np

    from dataframeutils_spark.operators import stat_tests

    rng = np.random.default_rng(11)
    rho, n = 0.7, 400
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + rng.normal()
    import datetime as dt
    rows = [
        ("g", "f", dt.date(2020, 1, 1) + dt.timedelta(days=i), float(x[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "grp string, feature string, date date, value double")
    r = stat_tests.ar_yule_walker(df).collect()[0]
    assert abs(r["acf1"] - rho) < 0.12
    assert abs(r["phi1"] - rho) < 0.15
    assert abs(r["phi3"]) < 0.12 and abs(r["pacf2"]) < 0.12
    assert 0.0 < r["resid_ratio"] < 1.0


def test_ar_yule_walker_exact_cramer(spark):
    """The Cramer solve must equal numpy.linalg.solve on the same
    rounded autocorrelations."""
    import numpy as np

    from dataframeutils_spark.operators import stat_tests

    rng = np.random.default_rng(5)
    x = np.cumsum(rng.normal(size=120))  # persistent series
    import datetime as dt
    rows = [
        ("g", "f", dt.date(2020, 1, 1) + dt.timedelta(days=i), float(v))
        for i, v in enumerate(x)
    ]
    df = spark.createDataFrame(rows, "grp string, feature string, date date, value double")
    r = stat_tests.ar_yule_walker(df).collect()[0]
    a, b, c = r["acf1"], r["acf2"], r["acf3"]
    R = np.array([[1, a, b], [a, 1, a], [b, a, 1]])
    phi = np.linalg.solve(R, np.array([a, b, c]))
    assert abs(r["phi1"] - phi[0]) < 1e-6
    assert abs(r["phi2"] - phi[1]) < 1e-6
    assert abs(r["phi3"] - phi[2]) < 1e-6

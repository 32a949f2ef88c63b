"""Golden-file parity for the fit-based operators (ADF/KPSS, Ljung-Box,
periodogram, cointegration, Granger) against the reference's committed
statsmodels outputs — exercised through the Spark operators.

Test statistics must match to ~1e-9 (the numpy kernels replicate the
algorithms exactly). ADF / Engle-Granger *p-values* use our MacKinnon
response-surface approximation → compared at 2-5% relative (documented
drift); KPSS p (table interpolation) and Granger/Ljung-Box p (exact
chi-square) match tightly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dataframeutils_spark import driver
from dataframeutils_spark.operators import stat_tests
from dataframeutils_spark.schema import PanelSchema, melt_panel

from tests.conftest import SF_DIR
from tests.ref_fixture import golden, reference_panel

REF_SCHEMA = PanelSchema(date_col="date", group_cols=["name"])
GOLDEN_PAIRS = [("feature_1", "feature_2"), ("feature_1", "feature_3")]


@pytest.fixture(scope="module")
def ref_long(spark):
    return melt_panel(spark.createDataFrame(reference_panel()), REF_SCHEMA).cache()


@pytest.fixture(scope="module")
def ref_wide(spark):
    return spark.createDataFrame(reference_panel()).withColumnRenamed("name", "grp").cache()


def test_stationarity_matches_golden(ref_long):
    got = stat_tests.stationarity_tests(ref_long).toPandas().set_index(["grp", "feature"])
    want = golden("out_stationarity.csv")
    assert len(got) == len(want) == 15
    for _, row in want.iterrows():
        g = got.loc[(row["group"], row["feature"])]
        np.testing.assert_allclose(g["adf_stat"], row["adf_stat"], rtol=1e-9)
        np.testing.assert_allclose(g["adf_p"], row["adf_p"], rtol=0.02)
        np.testing.assert_allclose(g["kpss_stat"], row["kpss_stat"], rtol=1e-9)
        np.testing.assert_allclose(g["kpss_p"], row["kpss_p"], rtol=1e-9)


def test_stationarity_summary_matches_golden(ref_long):
    res = stat_tests.stationarity_tests(ref_long)
    got = stat_tests.stationarity_summary(res).toPandas().set_index("feature")
    want = golden("out_stationarity_summary.csv").set_index("feature")
    assert len(got) == len(want) == 3
    for f in want.index:
        np.testing.assert_allclose(
            [got.loc[f, "prop_reject_unit_root"], got.loc[f, "prop_reject_stationarity"]],
            [want.loc[f, "prop_reject_unit_root"], want.loc[f, "prop_reject_stationarity"]],
            rtol=1e-12,
        )


def test_memory_dependence_matches_golden(ref_long):
    got = stat_tests.memory_dependence(ref_long).toPandas().set_index(["grp", "feature"])
    want = golden("out_memory.csv")
    assert len(got) == len(want) == 15
    for _, row in want.iterrows():
        g = got.loc[(row["group"], row["feature"])]
        np.testing.assert_allclose(
            [g["acf_lag1"], g["acf_lag5"], g["acf_lag10"], g["ljungbox_p"], g["hurst_exp"]],
            [row["acf_lag1"], row["acf_lag5"], row["acf_lag10"], row["ljungbox_p"], row["hurst_exp"]],
            rtol=1e-9,
        )


def test_frequency_domain_matches_golden(ref_long):
    got = stat_tests.frequency_domain(ref_long).toPandas().set_index(["grp", "feature"])
    want = golden("out_frequency.csv")
    assert len(got) == len(want) == 15
    for _, row in want.iterrows():
        g = got.loc[(row["group"], row["feature"])]
        np.testing.assert_allclose(
            [g["dom_freq"], g["dom_power"]], [row["dom_freq"], row["dom_power"]], rtol=1e-9
        )


def test_cointegration_matches_golden(ref_wide):
    got = (
        stat_tests.cointegration(ref_wide, GOLDEN_PAIRS, max_lag=6)
        .toPandas()
        .set_index(["grp", "pair"])
    )
    want = golden("out_cointegration.csv")
    assert len(got) == len(want) == 10
    for _, row in want.iterrows():
        g = got.loc[(row["group"], row["pair"])]
        np.testing.assert_allclose(g["coint_stat"], row["coint_stat"], rtol=1e-9)
        np.testing.assert_allclose(g["coint_p"], row["coint_p"], rtol=0.05)


def test_granger_matches_golden(ref_wide):
    got = (
        stat_tests.granger_causality(ref_wide, GOLDEN_PAIRS, max_lag=6)
        .toPandas()
        .set_index(["grp", "pair"])
    )
    want = golden("out_granger.csv")
    assert len(got) == len(want) == 10
    for _, row in want.iterrows():
        np.testing.assert_allclose(
            got.loc[(row["group"], row["pair"]), "pvalue"], row["pvalue"], rtol=1e-9
        )


@pytest.mark.parametrize(
    "qname",
    ["stationarity", "stationarity_summary", "memory_dependence",
     "frequency_domain", "cointegration", "granger"],
)
def test_rows_only_queries_run(spark, qname):
    """Driver rows-only contract: the query runs and returns rows."""
    got = driver.all_queries()[qname](spark, SF_DIR)
    assert got.count() > 0

def test_distribution_matches_golden(ref_long):
    """A1 vs out_distribution.csv: pandas G1/G2 bias corrections exact."""
    from dataframeutils_spark.operators import panel_stats

    got = (
        panel_stats.distribution_diagnostics(ref_long)
        .toPandas()
        .set_index(["grp", "feature"])
    )
    want = golden("out_distribution.csv")
    assert len(got) == len(want) == 15
    for _, row in want.iterrows():
        g = got.loc[(row["group"], row["feature"])]
        np.testing.assert_allclose(
            [g["mean"], g["std"], g["skew"], g["kurtosis"]],
            [row["mean"], row["std"], row["skew"], row["kurtosis"]],
            rtol=1e-9,
        )


def test_ar1_matches_golden(ref_long):
    """A7 vs out_ar1.csv: corr² closed form equals the reference's
    lstsq R² on every series."""
    from dataframeutils_spark.operators import panel_stats

    got = (
        panel_stats.predictability_ar1(ref_long)
        .toPandas()
        .set_index(["grp", "feature"])
    )
    want = golden("out_ar1.csv")
    assert len(got) == len(want) == 15
    for _, row in want.iterrows():
        np.testing.assert_allclose(
            got.loc[(row["group"], row["feature"]), "ar1_r2"],
            row["ar1_r2"],
            rtol=1e-9,
        )


def test_dispersion_matches_golden(ref_long):
    """A6 vs out_cross_section_dispersion_feature1.csv: groupBy(date)
    over the long frame equals the reference's pivot + std(axis=1)."""
    from dataframeutils_spark.operators import panel_stats

    got = (
        panel_stats.cross_sectional_dispersion(ref_long, "feature_1")
        .toPandas()
        .set_index("date")
    )
    want = golden("out_cross_section_dispersion_feature1.csv")
    assert len(got) == len(want) == 60
    for _, row in want.iterrows():
        key = pd.Timestamp(row["date"])
        np.testing.assert_allclose(
            got.loc[key, "dispersion"], row["dispersion_feature_1"], rtol=1e-9
        )


def test_lagged_corr_matches_golden(ref_wide):
    """A8 vs out_lagged_corr.csv: the wide (lag × pair) presentation
    shape, cross-group nanmean of per-group correlations."""
    from dataframeutils_spark.operators import cross_feature

    got = (
        cross_feature.lagged_cross_corr_wide(ref_wide, GOLDEN_PAIRS, max_lag=6)
        .toPandas()
        .set_index("lag")
    )
    want = golden("out_lagged_corr.csv").set_index("lag")
    assert len(got) == len(want) == 7
    for lag in want.index:
        for col in ("feature_1|feature_2", "feature_1|feature_3"):
            np.testing.assert_allclose(
                got.loc[lag, col], want.loc[lag, col], rtol=1e-9
            )


def test_mutual_info_matches_golden(ref_wide):
    """A12 vs out_mutual_info.csv: native width-bucket 2-D histogram MI
    equals the reference's numpy histogram2d plug-in estimate."""
    from dataframeutils_spark.operators import cross_feature

    got = (
        cross_feature.mutual_information(ref_wide, GOLDEN_PAIRS)
        .toPandas()
        .set_index(["grp", "pair"])
    )
    want = golden("out_mutual_info.csv")
    assert len(got) == len(want) == 10
    for _, row in want.iterrows():
        np.testing.assert_allclose(
            got.loc[(row["group"], row["pair"]), "mi"], row["mi"], rtol=1e-9
        )

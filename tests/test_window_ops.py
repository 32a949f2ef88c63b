"""Golden-file and pandas parity for the window-native operators
(ACF/Hurst, lagged cross-corr, rolling corr, mutual information, zscore
outliers), plus DuckDB oracle parity for their driver queries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dataframeutils_spark import driver
from dataframeutils_spark.operators import cross_feature, memory, outliers
from dataframeutils_spark.schema import PanelSchema, melt_panel

from tests.conftest import SF_DIR, assert_matches_oracle
from tests.ref_fixture import golden, reference_panel

REF_SCHEMA = PanelSchema(date_col="date", group_cols=["name"])
GOLDEN_PAIRS = [("feature_1", "feature_2"), ("feature_1", "feature_3")]


@pytest.fixture(scope="module")
def ref_wide(spark):
    pdf = reference_panel()
    sdf = spark.createDataFrame(pdf).withColumnRenamed("name", "grp")
    return sdf.cache()


@pytest.fixture(scope="module")
def ref_long(spark):
    pdf = reference_panel()
    return melt_panel(spark.createDataFrame(pdf), REF_SCHEMA).cache()


def test_acf_hurst_matches_golden(ref_long):
    got = memory.acf_hurst(ref_long).toPandas().set_index(["grp", "feature"])
    want = golden("out_memory.csv")
    assert len(got) == len(want) == 15
    for _, row in want.iterrows():
        g = got.loc[(row["group"], row["feature"])]
        np.testing.assert_allclose(
            [g["acf_lag1"], g["acf_lag5"], g["acf_lag10"], g["hurst_exp"]],
            [row["acf_lag1"], row["acf_lag5"], row["acf_lag10"], row["hurst_exp"]],
            rtol=1e-9,
        )


def test_lagged_corr_matches_golden(ref_wide):
    got = (
        cross_feature.lagged_cross_corr(ref_wide, GOLDEN_PAIRS, max_lag=6)
        .toPandas()
        .set_index(["pair", "lag"])
    )
    want = golden("out_lagged_corr.csv")  # pivoted: lag × pair columns
    assert len(got) == 14
    for _, row in want.iterrows():
        for pair in ["feature_1|feature_2", "feature_1|feature_3"]:
            np.testing.assert_allclose(
                got.loc[(pair, int(row["lag"])), "avg_corr"], row[pair], rtol=1e-9
            )


def test_mutual_info_matches_golden(ref_wide):
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


def test_rolling_corr_matches_pandas(ref_wide):
    got = (
        cross_feature.rolling_corr(ref_wide, "feature_1", "feature_2", window=10)
        .toPandas()
    )
    pdf = reference_panel()
    expected_rows = 0
    for name, g in pdf.groupby("name"):
        g = g.sort_values("date")
        roll = g["feature_1"].rolling(10).corr(g["feature_2"])
        sub = got[got["grp"] == name].sort_values("date")
        want_vals = roll.dropna().to_numpy()
        expected_rows += len(want_vals)
        np.testing.assert_allclose(
            sub["rolling_corr"].to_numpy(dtype=float), want_vals, rtol=1e-9
        )
    assert len(got) == expected_rows == 5 * 51  # only full windows emit


def test_zscore_outliers_matches_pandas(ref_long):
    got = outliers.zscore_outliers(ref_long, "feature_1").toPandas().set_index("grp")
    pdf = reference_panel()
    for name, g in pdf.groupby("name"):
        x = g["feature_1"].dropna()
        z = np.abs((x - x.mean()) / x.std(ddof=0))  # scipy zscore: ddof=0
        n_out = int((z > 3).sum())
        row = got.loc[name]
        assert row["n_outliers"] == n_out
        np.testing.assert_allclose(row["outlier_rate"], n_out / len(x), rtol=1e-12)
        np.testing.assert_allclose(row["max_outlier_score"], z.max(), rtol=1e-9)
        expected_avg = z[z > 3].mean() if n_out else 0.0
        np.testing.assert_allclose(row["avg_outlier_score"], expected_avg, rtol=1e-9)


def test_zscore_constant_group_counts_zero_not_null(spark):
    """Zero-variance group: every z is NULL (x/0); n_outliers must be 0
    (count-FILTER semantics, matching the oracle), never NULL (ADVICE r1)."""
    long_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "grp": "a",
                "feature": "f",
                "date": pd.date_range("2024-01-01", periods=12, freq="D"),
                "value": 5.0,
            }
        )
    )
    got = outliers.zscore_outliers(long_df, "f").toPandas()
    assert len(got) == 1
    assert got.loc[0, "n_outliers"] == 0
    assert got.loc[0, "outlier_rate"] == 0.0


@pytest.mark.parametrize(
    "qname",
    ["memory_acf_hurst", "lagged_corr", "rolling_corr", "mutual_info", "zscore_outliers"],
)
def test_driver_oracle_parity(spark, ddb, qname):
    q = driver.all_queries()[qname]
    sql = driver.all_oracles()[qname]
    assert_matches_oracle(q(spark, SF_DIR), ddb, sql)


def test_lagged_corr_wide_matches_golden_verbatim(ref_wide):
    """Facade wide pivot == reference golden CSV VERBATIM: same column
    names (lag, then one column per pair), same rows, same values."""
    got = cross_feature.lagged_cross_corr_wide(
        ref_wide, GOLDEN_PAIRS, max_lag=6
    ).toPandas()
    want = golden("out_lagged_corr.csv")
    assert list(got.columns) == list(want.columns)
    got = got.sort_values("lag").reset_index(drop=True)
    want = want.sort_values("lag").reset_index(drop=True)
    np.testing.assert_allclose(
        got.to_numpy(dtype=float), want.to_numpy(dtype=float), rtol=1e-9
    )

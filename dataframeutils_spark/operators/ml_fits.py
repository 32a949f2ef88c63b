"""Model-fitting operators (reference A13/A14/A15-forest/LOF) as
``applyInPandas`` kernels over :mod:`dataframeutils_spark.functions.ml`.

Reference surfaces:
* regime_detection — ``time_series_study.py:686-778`` (MarkovRegression)
* volatility_analysis — ``time_series_study.py:780-879`` (arch GARCH/
  EGARCH/GJR-GARCH)
* outlier_detection(isolation_forest | local_outlier_factor) —
  ``time_series_study.py:881-977``

Min-length gates (≥20 / ≥50 / ≥10) are pushed before the Python stage.
EM/MLE fits are deterministic under our seeds but not numerically
identical to statsmodels/arch (different optimizers) — driver records
rows-only checks; pytest asserts behavioral properties instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataframeutils_spark.schema import nan_to_null


def _gated_feature(long_df: DataFrame, feature: str, min_len: int) -> DataFrame:
    w = Window.partitionBy("grp")
    return (
        long_df.filter((F.col("feature") == feature) & F.col("value").isNotNull())
        .withColumn("_n", F.count("value").over(w))
        .filter(F.col("_n") >= min_len)
        .drop("_n")
    )


def regime_detection(
    long_df: DataFrame, feature: str, n_regimes: int = 2, min_len: int = 20
) -> DataFrame:
    """Markov-switching mean model per group. Output mirrors the
    reference's regime_stats plus flattened transition probabilities
    (regimes canonically ordered by ascending mean, which removes EM
    label-switching — the reference's regime numbering is arbitrary)."""
    gated = _gated_feature(long_df, feature, min_len)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from dataframeutils_spark.functions import ml

        x = pdf.sort_values("date")["value"].to_numpy(dtype=float)
        try:
            fit = ml.markov_switching_fit(x, k_regimes=n_regimes)
            probs = fit["smoothed_probs"]
            states = np.argmax(probs, axis=1)
            row = {
                "regime_1_prob": float(probs[:, 0].mean()),
                "regime_2_prob": float(probs[:, 1].mean()) if n_regimes > 1 else np.nan,
                "regime_switches": int((np.diff(states) != 0).sum()),
                "log_likelihood": fit["llf"],
                "aic": fit["aic"],
                "bic": fit["bic"],
                "p00": float(fit["transition"][0, 0]),
                "p11": float(fit["transition"][1, 1]) if n_regimes > 1 else np.nan,
            }
        except Exception:
            row = {
                "regime_1_prob": np.nan, "regime_2_prob": np.nan,
                "regime_switches": -1, "log_likelihood": np.nan,
                "aic": np.nan, "bic": np.nan, "p00": np.nan, "p11": np.nan,
            }
        row.update({"grp": pdf["grp"].iloc[0], "feature": feature})
        return pd.DataFrame([row])

    out = gated.groupBy("grp").applyInPandas(
        kernel,
        schema="regime_1_prob double, regime_2_prob double, regime_switches long, "
        "log_likelihood double, aic double, bic double, p00 double, p11 double, "
        "grp string, feature string",
    )
    float_cols = ["regime_1_prob", "regime_2_prob", "log_likelihood", "aic", "bic", "p00", "p11"]
    return out.select(
        "grp", "feature", "regime_switches",
        *[nan_to_null(F.col(c)).alias(c) for c in float_cols],
    )


def volatility_analysis(
    long_df: DataFrame, feature: str, model_type: str = "GARCH", min_len: int = 50
) -> DataFrame:
    """GARCH-family volatility fit per group; emits fit quality,
    conditional-volatility moments (pandas skew/kurt conventions) and
    persistence = alpha + beta (reference ``:839-842``)."""
    gated = _gated_feature(long_df, feature, min_len)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from dataframeutils_spark.functions import ml

        x = pdf.sort_values("date")["value"].to_numpy(dtype=float)
        try:
            fit = ml.garch_fit(x, model=model_type)
            cv = fit["cond_vol"]
            skew, kurt = ml._sample_skew_kurt(cv)
            row = {
                "log_likelihood": fit["llf"], "aic": fit["aic"], "bic": fit["bic"],
                "avg_volatility": float(cv.mean()),
                "vol_std": float(cv.std(ddof=1)),
                "vol_skew": skew, "vol_kurt": kurt,
                "persistence": fit["persistence"],
            }
        except Exception:
            row = dict.fromkeys(
                ["log_likelihood", "aic", "bic", "avg_volatility", "vol_std",
                 "vol_skew", "vol_kurt", "persistence"], np.nan)
        row.update({"grp": pdf["grp"].iloc[0], "feature": feature, "model_type": model_type})
        return pd.DataFrame([row])

    out = gated.groupBy("grp").applyInPandas(
        kernel,
        schema="log_likelihood double, aic double, bic double, avg_volatility double, "
        "vol_std double, vol_skew double, vol_kurt double, persistence double, "
        "grp string, feature string, model_type string",
    )
    float_cols = ["log_likelihood", "aic", "bic", "avg_volatility", "vol_std",
                  "vol_skew", "vol_kurt", "persistence"]
    return out.select(
        "grp", "feature", "model_type",
        *[nan_to_null(F.col(c)).alias(c) for c in float_cols],
    )


def ml_outliers(
    long_df: DataFrame, feature: str, method: str = "isolation_forest", min_len: int = 10
) -> DataFrame:
    """Isolation-forest / LOF outlier summary per group — same output
    schema as the native zscore variant (reference ``:941-954``)."""
    if method not in ("isolation_forest", "local_outlier_factor"):
        raise ValueError(f"Unknown method: {method}")
    gated = _gated_feature(long_df, feature, min_len)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from dataframeutils_spark.functions import ml

        x = pdf.sort_values("date")["value"].to_numpy(dtype=float)
        try:
            if method == "isolation_forest":
                labels, scores = ml.isolation_forest_labels(x, contamination=0.1, seed=42)
            else:
                labels, scores = ml.local_outlier_factor(
                    x, n_neighbors=min(20, len(x) // 2), contamination=0.1
                )
            n_out = int((labels == -1).sum())
            row = {
                "n_outliers": n_out,
                "outlier_rate": n_out / len(x),
                "avg_outlier_score": float(scores[labels == -1].mean()) if n_out else 0.0,
                "max_outlier_score": float(scores.max()),
                "min_outlier_score": float(scores.min()),
            }
        except Exception:
            row = {"n_outliers": -1, "outlier_rate": np.nan, "avg_outlier_score": np.nan,
                   "max_outlier_score": np.nan, "min_outlier_score": np.nan}
        row.update({"grp": pdf["grp"].iloc[0], "feature": feature, "method": method})
        return pd.DataFrame([row])

    out = gated.groupBy("grp").applyInPandas(
        kernel,
        schema="n_outliers long, outlier_rate double, avg_outlier_score double, "
        "max_outlier_score double, min_outlier_score double, "
        "grp string, feature string, method string",
    )
    float_cols = ["outlier_rate", "avg_outlier_score", "max_outlier_score", "min_outlier_score"]
    return out.select(
        "grp", "feature", "method", "n_outliers",
        *[nan_to_null(F.col(c)).alias(c) for c in float_cols],
    )

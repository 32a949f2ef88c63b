"""Memory & dependence diagnostics — the closed-form (window-native) part
of reference A4 (``time_series_study.py:289-343``): autocorrelations at
lags 1/5/10 and the rescaled-range Hurst exponent.

The Ljung–Box p-value (which needs a chi² survival function) lives in
:mod:`dataframeutils_spark.operators.stat_tests` as a pandas-UDF kernel;
this module stays 100% inside whole-stage codegen.

ACF semantics: pandas ``Series.autocorr(k)`` on the *dropna-compacted*
series — Pearson corr of the series with its positional shift. The
Spark equivalent is ``lag(value, k)`` over the NULL-filtered,
date-ordered partition, then ``corr`` (which skips the k leading NULL
pairs exactly as pandas' pairwise-complete corr does).

Hurst (reference ``:303-315``): single-window R/S estimate
``log(range(cumsum(x - mean)) / std(x, ddof=1)) / log(n)``;
``std == 0 → 0.5``; ``n < 20 → NULL``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataframeutils_spark.schema import nan_to_null

ACF_LAGS = (1, 5, 10)


def acf_hurst(long_df: DataFrame, min_len: int = 12, hurst_min_len: int = 20) -> DataFrame:
    d = long_df.filter(F.col("value").isNotNull())
    w_ord = Window.partitionBy("grp", "feature").orderBy("date")
    w_all = Window.partitionBy("grp", "feature")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)

    with_lags = d.select(
        "grp",
        "feature",
        "value",
        *[F.lag("value", k).over(w_ord).alias(f"xlag{k}") for k in ACF_LAGS],
        F.sum(F.col("value") - F.avg("value").over(w_all)).over(w_cum).alias("cum_dev"),
    )

    agg = with_lags.groupBy("grp", "feature").agg(
        F.count("value").alias("n"),
        *[F.corr("value", f"xlag{k}").alias(f"acf_lag{k}") for k in ACF_LAGS],
        F.max("cum_dev").alias("cum_max"),
        F.min("cum_dev").alias("cum_min"),
        F.stddev_samp("value").alias("sd"),
    )

    n = F.col("n")
    hurst = (
        F.when(n < hurst_min_len, F.lit(None).cast("double"))
        .when(F.col("sd") == 0, F.lit(0.5))
        .otherwise(
            F.log((F.col("cum_max") - F.col("cum_min")) / F.col("sd")) / F.log(n)
        )
    )
    return agg.filter(n >= min_len).select(
        "grp",
        "feature",
        "n",
        *[nan_to_null(F.col(f"acf_lag{k}")).alias(f"acf_lag{k}") for k in ACF_LAGS],
        nan_to_null(hurst).alias("hurst_exp"),
    )

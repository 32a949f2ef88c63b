"""Closed-form panel statistics — all pure DataFrame/Window, no Python UDFs.

Implements, over the canonical long layout ``(grp, date, feature, value)``
from :func:`dataframeutils_spark.schema.melt_panel`:

* :func:`distribution_diagnostics` — reference A1
  (``time_series_study.py:128-180``)
* :func:`cross_sectional_dispersion` — reference A6
  (``time_series_study.py:437-472``)
* :func:`predictability_ar1` — reference A7
  (``time_series_study.py:475-523``)

Scale notes: each operator is a single ``groupBy`` (one shuffle on the
group key), fully inside whole-stage codegen. The AR(1) fit is the
closed form R² = corr(x_t, x_{t-1})² — no per-group regression, just a
window lag plus one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataframeutils_spark.schema import nan_to_null


def distribution_diagnostics(long_df: DataFrame) -> DataFrame:
    """Per (grp × feature): n, mean, sample std, bias-corrected skew/kurtosis.

    Matches pandas ``Series.skew()`` / ``.kurtosis()`` (adjusted
    Fisher–Pearson G1 and excess G2). Spark's ``skewness``/``kurtosis``
    are the population g1/g2, so we apply the exact corrections::

        G1 = g1 * sqrt(n(n-1)) / (n-2)
        G2 = ((n+1) g2 + 6)(n-1) / ((n-2)(n-3))

    NULL policy (≡ pandas NaN): std NULL for n<2, skew NULL for n<3,
    kurtosis NULL for n<4.
    """
    d = long_df.filter(F.col("value").isNotNull())
    agg = d.groupBy("grp", "feature").agg(
        F.count("value").alias("n"),
        F.avg("value").alias("mean"),
        F.stddev_samp("value").alias("std_raw"),
        F.skewness("value").alias("g1"),
        F.kurtosis("value").alias("g2"),
    )
    n = F.col("n")
    g1_adj = F.col("g1") * F.sqrt(n * (n - 1)) / (n - 2)
    g2_adj = ((n + 1) * F.col("g2") + 6) * (n - 1) / ((n - 2) * (n - 3))
    return agg.select(
        "grp",
        "feature",
        "n",
        F.col("mean"),
        F.when(n >= 2, nan_to_null(F.col("std_raw"))).alias("std"),
        F.when(n >= 3, nan_to_null(g1_adj)).alias("skew"),
        F.when(n >= 4, nan_to_null(g2_adj)).alias("kurtosis"),
    )


def cross_sectional_dispersion(long_df: DataFrame, feature: str) -> DataFrame:
    """Per date: sample stddev of ``feature`` *across groups*.

    The reference pivots to wide and takes ``std(axis=1)``
    (``time_series_study.py:452-454``); in Spark that pivot is
    unnecessary — a single ``groupBy(date)`` over the long frame computes
    the same statistic without materializing a wide matrix whose column
    count equals the number of groups (which at 100 TB could be millions).
    Dates where only one group reports → NULL (pandas: NaN).
    """
    return (
        long_df.filter((F.col("feature") == feature) & F.col("value").isNotNull())
        .groupBy("date")
        .agg(
            F.count("value").alias("n_groups"),
            nan_to_null(F.stddev_samp("value")).alias("dispersion"),
        )
    )


def predictability_ar1(long_df: DataFrame, min_pairs: int = 10) -> DataFrame:
    """Per (grp × feature): R² of the OLS fit x[t] ~ const + x[t-1].

    Closed form: for simple regression with intercept, R² = corr(x, y)².
    The lag is *positional* over the date-ordered series including NULL
    rows (the reference shifts before masking — ``time_series_study.py:487-490``),
    then pairs with any NULL are dropped. Degenerate cases follow the
    reference's lstsq: var(y)=0 → NULL (ss_tot=0, ``:499``); var(x)=0
    with var(y)>0 → 0.0 (slope 0 fit explains nothing).

    Groups with fewer than ``min_pairs`` complete pairs are dropped
    (``:491``).
    """
    w = Window.partitionBy("grp", "feature").orderBy("date")
    pairs = (
        long_df.withColumn("xlag", F.lag("value", 1).over(w))
        .filter(F.col("value").isNotNull() & F.col("xlag").isNotNull())
    )
    agg = pairs.groupBy("grp", "feature").agg(
        F.count("*").alias("n_pairs"),
        F.var_samp("value").alias("var_y"),
        F.var_samp("xlag").alias("var_x"),
        F.corr("xlag", "value").alias("r"),
    )
    r2 = (
        F.when(F.col("var_y") == 0, F.lit(None).cast("double"))
        .when(F.col("var_x") == 0, F.lit(0.0))
        .otherwise(nan_to_null(F.pow(F.col("r"), 2)))
    )
    return agg.filter(F.col("n_pairs") >= min_pairs).select(
        "grp", "feature", "n_pairs", r2.alias("ar1_r2")
    )


def forward_fill(long_df: DataFrame) -> DataFrame:
    """Per-series forward fill — the missing-data repair the reference's
    pandas users get from ``DataFrame.ffill()``: (grp, date, feature,
    value, value_filled, was_filled).

    ``value_filled`` carries the last non-null observation at or before
    each date within its (grp, feature) series; leading nulls stay null
    (``was_filled`` false). One window over the series ordering — the
    same single shuffle every other panel statistic pays, entirely
    inside whole-stage codegen.
    """
    w = (
        Window.partitionBy("grp", "feature")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.last("value", ignorenulls=True).over(w)
    return long_df.select(
        "grp",
        "date",
        "feature",
        "value",
        filled.alias("value_filled"),
        (F.col("value").isNull() & filled.isNotNull()).alias("was_filled"),
    )


def resample_panel(long_df: DataFrame, unit: str = "week") -> DataFrame:
    """Calendar-bucket downsampling of every (grp, feature) series —
    pandas ``resample('W')`` for the panel: per (grp, feature, bucket)
    — n, open (value at the bucket's first date), high, low, close
    (value at the last date), mean.

    ``date_trunc`` gives identical ISO Monday-start weeks in Spark and
    DuckDB, so the bucketing is engine-exact. One map-side-combinable
    groupBy (open/close via ``min_by``/``max_by``) — resampling 100 TB
    of ticks to bars is exactly this one aggregate, no window, no
    explode.
    """
    d = long_df.filter(F.col("value").isNotNull())
    bucket = F.date_trunc(unit, F.col("date")).cast("date")
    return d.groupBy("grp", "feature", bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min_by("value", "date").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "date").alias("close"),
        F.avg("value").alias("mean"),
    )

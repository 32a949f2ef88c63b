"""Outlier detection (reference A15, ``time_series_study.py:881-977``).

``zscore`` is fully native (this module): ``|x − μ| / σ_pop > 3`` per
group — scipy's ``stats.zscore`` uses ddof=0, hence ``stddev_pop``.

``isolation_forest`` and ``local_outlier_factor`` are seeded numpy
kernels over ``applyInPandas`` — see
:mod:`dataframeutils_spark.operators.ml_outliers`.

Output mirrors the reference's per-group summary: n_outliers,
outlier_rate, avg/max/min scores (avg over *outliers only*, 0.0 when
none — ``:951``; max/min over all scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_outliers(
    long_df: DataFrame,
    feature: str,
    threshold: float = 3.0,
    min_len: int = 10,
) -> DataFrame:
    d = long_df.filter((F.col("feature") == feature) & F.col("value").isNotNull())
    w = Window.partitionBy("grp")
    scored = d.select(
        "grp",
        # try_divide: a zero-variance group divides by 0, which under
        # ANSI mode (the Spark 4 default — and the driver's vanilla
        # session) would THROW; try_divide yields NULL like DuckDB
        F.abs(
            F.try_divide(
                F.col("value") - F.avg("value").over(w), F.stddev_pop("value").over(w)
            )
        ).alias("z"),
    )
    agg = scored.groupBy("grp").agg(
        F.count("*").alias("n"),
        # count(when(...)) not sum(cast): in a zero-variance group every
        # z is NULL (x/0), sum over all-NULL is NULL but the oracle's
        # count(*) FILTER is 0 — count() skips NULLs and agrees
        F.count(F.when(F.col("z") > threshold, F.lit(1))).alias("n_outliers"),
        F.avg(F.when(F.col("z") > threshold, F.col("z"))).alias("avg_out"),
        F.max("z").alias("max_outlier_score"),
        F.min("z").alias("min_outlier_score"),
    )
    return agg.filter(F.col("n") >= min_len).select(
        "grp",
        F.lit(feature).alias("feature"),
        F.lit("zscore").alias("method"),
        "n_outliers",
        (F.col("n_outliers") / F.col("n")).alias("outlier_rate"),
        F.coalesce(F.col("avg_out"), F.lit(0.0)).alias("avg_outlier_score"),
        "max_outlier_score",
        "min_outlier_score",
    )


def mad_outliers(
    long_df: DataFrame,
    feature: str,
    threshold: float = 3.5,
    min_len: int = 10,
) -> DataFrame:
    """Robust (median/MAD) outlier detection per group — the
    modified z-score of Iglewicz & Hoaglin ("How to Detect and Handle
    Outliers", 1993, public): M_i = 0.6745·(x−med)/MAD, flag |M|>3.5.
    Immune to the masking that inflates the plain z-score's stddev when
    the outliers themselves are extreme — the robust companion to
    :func:`zscore_outliers` (reference A15 family).

    Output per grp: (grp, n, med, mad, n_outliers, max_robust_z).

    Plan: two grouped aggregates (median, then MAD of deviations) with
    a broadcast of the tiny per-group median table between them —
    percentile is Spark's exact linear-interpolation kernel, the same
    one the events profile already matches against DuckDB's
    quantile_cont bit-for-bit.
    """
    d = long_df.filter((F.col("feature") == feature) & F.col("value").isNotNull())
    med = d.groupBy("grp").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = d.join(F.broadcast(med), "grp").select(
        "grp", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("grp").agg(
        F.first("med").alias("med"),
        F.count("*").alias("n"),
        F.percentile("dev", F.lit(0.5)).alias("mad"),
    )
    scored = dev.join(
        F.broadcast(mad.select("grp", F.col("mad").alias("m"))), "grp"
    ).select(
        "grp",
        # try_divide: an all-constant group has MAD 0 → NULL scores
        # (ANSI mode would throw on /0), matching the oracle's NULLIF
        (F.lit(0.6745) * F.try_divide(F.col("dev"), F.col("m"))).alias("rz"),
    )
    agg = scored.groupBy("grp").agg(
        F.count(F.when(F.col("rz") > threshold, F.lit(1))).alias("n_outliers"),
        F.max("rz").alias("max_robust_z"),
    )
    return (
        mad.join(agg, "grp")
        .filter(F.col("n") >= min_len)
        .select("grp", "n", "med", "mad", "n_outliers", "max_robust_z")
    )


def mad_outliers_sql(
    feature: str,
    threshold: float = 3.5,
    min_len: int = 10,
) -> str:
    """DuckDB oracle fragment body for :func:`mad_outliers` — callers
    wrap with the panel/melt CTEs (oracles.with_panel); the fragment
    opens with a comma to continue that WITH list."""
    return f"""
, f AS (
  SELECT grp, value FROM melt
  WHERE feature = \'{feature}\' AND value IS NOT NULL
),
med AS (
  SELECT grp, count(*) AS n, quantile_cont(value, 0.5) AS med
  FROM f GROUP BY grp
),
dev AS (
  SELECT f.grp, abs(f.value - med.med) AS dev FROM f JOIN med USING (grp)
),
mad AS (
  SELECT grp, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY grp
),
scored AS (
  SELECT dev.grp, 0.6745 * dev.dev / NULLIF(mad.mad, 0) AS rz
  FROM dev JOIN mad USING (grp)
)
SELECT med.grp, med.n, med.med, mad.mad,
       CAST(count(*) FILTER (WHERE rz > {threshold}) AS BIGINT) AS n_outliers,
       max(rz) AS max_robust_z
FROM scored JOIN med USING (grp) JOIN mad USING (grp)
WHERE med.n >= {min_len}
GROUP BY med.grp, med.n, med.med, mad.mad
"""

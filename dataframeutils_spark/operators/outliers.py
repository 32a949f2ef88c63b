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


# ---------------------------------------------------------------------------
# multivariate Mahalanobis outliers (sufficient statistics)
# ---------------------------------------------------------------------------

# chi-square(3 dof) upper 2.5% point — the standard multivariate
# outlier cutoff for 3 features under approximate normality
CHI2_3_975 = 9.3484036254


def mahalanobis_outliers(
    panel: DataFrame,
    f1: str = "feature_1",
    f2: str = "feature_2",
    f3: str = "feature_3",
    threshold: float = CHI2_3_975,
    min_len: int = 10,
) -> DataFrame:
    """Multivariate outlier audit per group: squared Mahalanobis
    distance d²(x) = (x−μ)' Σ⁻¹ (x−μ) against the chi²(3) cutoff.

    The multivariate extension of :func:`zscore_outliers` — catches a
    row whose three features are each unremarkable but jointly
    inconsistent (off the correlation structure). Sufficient-statistics
    shape: ONE combinable aggregate per group (means + the six
    covariances), the 3×3 inverse closed-form via the adjugate, then
    one scoring scan against the broadcast per-group parameter row —
    never a collect, never a second shuffle of the data.

    The argmax date ranks the decimal-ROUNDED d² (pre-ranking round
    discipline); the cutoff compares the rounded d² too, so both
    engines agree on every discontinuous step. Groups with a singular
    covariance (det == 0) are dropped, mirroring panel_ols.

    Output: (grp, n, n_outliers, outlier_rate, mean_md2, max_md2,
    max_md2_date).
    """
    from dataframeutils_spark.schema import decround

    base = panel.select(
        "grp",
        F.col("date"),
        F.col(f1).cast("double").alias("x1"),
        F.col(f2).cast("double").alias("x2"),
        F.col(f3).cast("double").alias("x3"),
    ).dropna()
    x1, x2, x3 = F.col("x1"), F.col("x2"), F.col("x3")
    stats = base.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.avg(x1).alias("m1"),
        F.avg(x2).alias("m2"),
        F.avg(x3).alias("m3"),
        F.var_samp(x1).alias("c11"),
        F.var_samp(x2).alias("c22"),
        F.var_samp(x3).alias("c33"),
        F.covar_samp(x1, x2).alias("c12"),
        F.covar_samp(x1, x3).alias("c13"),
        F.covar_samp(x2, x3).alias("c23"),
    ).filter(F.col("n") >= min_len)
    c11, c22, c33 = F.col("c11"), F.col("c22"), F.col("c33")
    c12, c13, c23 = F.col("c12"), F.col("c13"), F.col("c23")
    det = (
        c11 * (c22 * c33 - c23 * c23)
        - c12 * (c12 * c33 - c23 * c13)
        + c13 * (c12 * c23 - c22 * c13)
    )
    params = stats.filter(F.abs(det) > 0).select(
        "grp",
        "n",
        "m1",
        "m2",
        "m3",
        ((c22 * c33 - c23 * c23) / det).alias("i11"),
        (-(c12 * c33 - c13 * c23) / det).alias("i12"),
        ((c12 * c23 - c13 * c22) / det).alias("i13"),
        ((c11 * c33 - c13 * c13) / det).alias("i22"),
        (-(c11 * c23 - c12 * c13) / det).alias("i23"),
        ((c11 * c22 - c12 * c12) / det).alias("i33"),
    )
    j = base.join(F.broadcast(params), on="grp")
    d1 = F.col("x1") - F.col("m1")
    d2 = F.col("x2") - F.col("m2")
    d3 = F.col("x3") - F.col("m3")
    md2 = decround(
        F.col("i11") * d1 * d1
        + F.col("i22") * d2 * d2
        + F.col("i33") * d3 * d3
        + F.lit(2.0)
        * (F.col("i12") * d1 * d2 + F.col("i13") * d1 * d3 + F.col("i23") * d2 * d3)
    )
    scored = j.select("grp", "n", "date", md2.alias("md2"))
    w = Window.partitionBy("grp").orderBy(F.desc("md2"), F.asc("date"))
    agg = scored.groupBy("grp").agg(
        F.first("n").alias("n"),
        F.count(F.when(F.col("md2") > threshold, F.lit(1))).alias("n_outliers"),
        F.avg("md2").alias("mean_md2"),
    )
    top = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("grp", F.col("md2").alias("max_md2"), F.col("date").alias("max_md2_date"))
    )
    return agg.join(top, on="grp").select(
        "grp",
        "n",
        "n_outliers",
        (F.col("n_outliers") / F.col("n")).alias("outlier_rate"),
        "mean_md2",
        "max_md2",
        "max_md2_date",
    )


def mahalanobis_outliers_sql(threshold: float = CHI2_3_975, min_len: int = 10) -> str:
    """DuckDB oracle for :func:`mahalanobis_outliers` over the standard
    panel (callers prepend the panel CTE): identical sufficient
    statistics, adjugate inverse and rounded quadratic form."""
    from dataframeutils_spark.schema import decround_sql, siground_sql

    md2 = (
        "i11 * d1 * d1 + i22 * d2 * d2 + i33 * d3 * d3 "
        "+ 2.0 * (i12 * d1 * d2 + i13 * d1 * d3 + i23 * d2 * d3)"
    )
    return f"""
, base AS (
  SELECT grp, date,
         CAST(feature_1 AS DOUBLE) AS x1,
         CAST(feature_2 AS DOUBLE) AS x2,
         CAST(feature_3 AS DOUBLE) AS x3
  FROM panel
  WHERE feature_1 IS NOT NULL AND feature_2 IS NOT NULL AND feature_3 IS NOT NULL
), stats AS (
  SELECT grp, count(*) AS n,
         avg(x1) AS m1, avg(x2) AS m2, avg(x3) AS m3,
         var_samp(x1) AS c11, var_samp(x2) AS c22, var_samp(x3) AS c33,
         covar_samp(x1, x2) AS c12, covar_samp(x1, x3) AS c13,
         covar_samp(x2, x3) AS c23
  FROM base GROUP BY grp
  HAVING count(*) >= {min_len}
), dets AS (
  SELECT *,
         c11 * (c22 * c33 - c23 * c23)
         - c12 * (c12 * c33 - c23 * c13)
         + c13 * (c12 * c23 - c22 * c13) AS det
  FROM stats
), params AS (
  SELECT grp, n, m1, m2, m3,
         (c22 * c33 - c23 * c23) / det AS i11,
         -(c12 * c33 - c13 * c23) / det AS i12,
         (c12 * c23 - c13 * c22) / det AS i13,
         (c11 * c33 - c13 * c13) / det AS i22,
         -(c11 * c23 - c12 * c13) / det AS i23,
         (c11 * c22 - c12 * c12) / det AS i33
  FROM dets WHERE abs(det) > 0
), scored AS (
  SELECT b.grp, p.n, b.date,
         {decround_sql(md2)} AS md2
  FROM base b
  JOIN params p ON p.grp = b.grp,
  LATERAL (SELECT b.x1 - p.m1 AS d1, b.x2 - p.m2 AS d2, b.x3 - p.m3 AS d3) dd
), top AS (
  SELECT grp, md2 AS max_md2, date AS max_md2_date
  FROM (
    SELECT *, row_number() OVER (PARTITION BY grp ORDER BY md2 DESC, date ASC) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT s.grp, any_value(s.n) AS n,
       CAST(count(*) FILTER (WHERE s.md2 > {threshold}) AS BIGINT) AS n_outliers,
       {decround_sql(f'count(*) FILTER (WHERE s.md2 > {threshold}) * 1.0 / any_value(s.n)')} AS outlier_rate,
       {decround_sql('avg(s.md2)')} AS mean_md2,
       {decround_sql('any_value(t.max_md2)')} AS max_md2,
       any_value(t.max_md2_date) AS max_md2_date
FROM scored s JOIN top t ON t.grp = s.grp
GROUP BY s.grp
"""

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

"""Cross-feature comparisons — the window/join-native part of reference
A8/A9/A12 (``time_series_study.py:525-684``): lagged cross-correlations
averaged across groups, rolling correlation, and discretized mutual
information.

Engle–Granger cointegration (A10) and Granger causality (A11) need
iterative regressions with p-value surfaces → pandas-UDF kernels in
:mod:`dataframeutils_spark.operators.stat_tests`.

All operators take the *wide* panel ``(date, grp, <features...>)`` —
pairs are materialized with a union, not a pivot, so the plan stays a
narrow scan regardless of the number of groups.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataframeutils_spark.schema import nan_to_null


def _pair_frame(panel: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """(grp, date, pair, a, b) — one slice per feature pair, unioned.

    Pair label format ``"fa|fb"`` matches the reference's golden output
    contract (``time_series_study.py:602``).
    """
    slices = [
        panel.select(
            "grp",
            "date",
            F.lit(f"{fa}|{fb}").alias("pair"),
            F.col(fa).cast("double").alias("a"),
            F.col(fb).cast("double").alias("b"),
        )
        for fa, fb in pairs
    ]
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    return out


def default_pairs(features: list[str]) -> list[tuple[str, str]]:
    return list(itertools.combinations(features, 2))


def lagged_cross_corr(
    panel: DataFrame,
    pairs: list[tuple[str, str]],
    max_lag: int = 10,
    min_pairs: int = 10,
) -> DataFrame:
    """Corr(a[t−L], b[t]) per (pair × group × lag), averaged across groups.

    The lag is *positional within the group's date-ordered rows* (the
    reference shifts the raw series before dropping NaN pairs —
    ``time_series_study.py:591-599``), so the alignment is a self-join
    on ``row_number`` offsets: one shuffle, all lags at once — no
    per-lag re-sort. Groups contribute only with ≥ ``min_pairs``
    complete pairs; the cross-group mean skips NULL correlations
    (≡ ``np.nanmean``, ``:602``).
    """
    pf = _pair_frame(panel, pairs)
    w = Window.partitionBy("pair", "grp").orderBy("date")
    pf = pf.withColumn("rn", F.row_number().over(w))

    b_side = pf.select(
        "pair", "grp", "rn", F.col("b").alias("b_val"),
        F.explode(F.sequence(F.lit(0), F.lit(max_lag))).alias("lag"),
    )
    a_side = pf.select("pair", "grp", F.col("rn").alias("a_rn"), F.col("a").alias("a_val"))
    joined = b_side.join(
        a_side,
        on=[
            b_side.pair == a_side.pair,
            b_side.grp == a_side.grp,
            (b_side.rn - b_side.lag) == a_side.a_rn,
        ],
    ).select(b_side.pair, b_side.grp, "lag", "a_val", "b_val")

    per_group = (
        joined.filter(F.col("a_val").isNotNull() & F.col("b_val").isNotNull())
        .groupBy("pair", "grp", "lag")
        .agg(F.count("*").alias("n_pairs"), F.corr("a_val", "b_val").alias("c"))
        .filter(F.col("n_pairs") >= min_pairs)
    )
    return per_group.groupBy("pair", "lag").agg(
        F.count("c").alias("n_groups"),
        nan_to_null(F.avg("c")).alias("avg_corr"),
    )


def lagged_cross_corr_wide(
    panel: DataFrame,
    pairs: list[tuple[str, str]],
    max_lag: int = 10,
    min_pairs: int = 10,
) -> DataFrame:
    """Reference presentation shape for :func:`lagged_cross_corr`: one
    row per lag, one column per pair (``time_series_study.py:604``
    pivots to a ``lag × pair`` matrix; golden ``out_lagged_corr.csv`` is
    wide). Long format is the engine-native shape; this is the
    migration-compatible view. Pivot values are passed explicitly (they
    are known from ``pairs``), so no extra distinct job runs and the
    column order is deterministic.
    """
    long = lagged_cross_corr(panel, pairs, max_lag=max_lag, min_pairs=min_pairs)
    pair_names = [f"{fa}|{fb}" for fa, fb in pairs]
    return (
        long.groupBy("lag")
        .pivot("pair", pair_names)
        .agg(F.first("avg_corr"))
        .orderBy("lag")
    )


def rolling_corr(
    panel: DataFrame, fa: str, fb: str, window: int = 10
) -> DataFrame:
    """Rolling-window corr(a, b) per group (reference A9, plot input).

    Emits only complete windows (pandas ``rolling(w).corr()`` default
    ``min_periods == window`` — verified against the reference output).
    """
    w_roll = (
        Window.partitionBy("grp").orderBy("date").rowsBetween(-(window - 1), 0)
    )
    w_ord = Window.partitionBy("grp").orderBy("date")
    return (
        panel.select(
            "grp", "date",
            F.col(fa).cast("double").alias("a"),
            F.col(fb).cast("double").alias("b"),
        )
        .withColumn("rolling_corr", nan_to_null(F.corr("a", "b").over(w_roll)))
        .withColumn("rn", F.row_number().over(w_ord))
        .filter(F.col("rn") >= window)
        .select("grp", "date", "rolling_corr")
    )


def mutual_information(
    panel: DataFrame,
    pairs: list[tuple[str, str]],
    bins: int = 10,
    min_len: int = 20,
) -> DataFrame:
    """Plug-in mutual information on a bins×bins 2-D histogram
    (reference A12, ``time_series_study.py:554-568``): per (pair × group),
    equal-width bins over the aligned pairs' [min, max],
    ``MI = Σ p_xy·(ln(p_xy+ε) − ln(p_x+ε) − ln(p_y+ε))``, ε = 1e-12.

    Fully native: per-group extremes via window, width_bucket-style
    binning, cell counts via groupBy, marginals via window sums over the
    cells — no Python. Groups with < ``min_len`` aligned pairs are
    dropped (reference emits NaN; the facade re-adds those rows).
    """
    eps = F.lit(1e-12)
    pf = _pair_frame(panel, pairs).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    w_all = Window.partitionBy("pair", "grp")
    pf = pf.select(
        "pair", "grp", "a", "b",
        F.min("a").over(w_all).alias("amin"),
        F.max("a").over(w_all).alias("amax"),
        F.min("b").over(w_all).alias("bmin"),
        F.max("b").over(w_all).alias("bmax"),
        F.count("*").over(w_all).alias("n"),
    ).filter(F.col("n") >= min_len)

    def _bucket(v, lo, hi):
        # numpy histogram semantics: right-open bins, max value → last bin;
        # degenerate range (lo==hi) → numpy centers on [v-0.5, v+0.5] → bin 5
        return (
            F.when(F.col(hi) == F.col(lo), F.lit(bins // 2))
            .otherwise(
                F.least(
                    F.floor((F.col(v) - F.col(lo)) / ((F.col(hi) - F.col(lo)) / bins)),
                    F.lit(bins - 1),
                )
            )
            .cast("int")
        )

    cells = (
        pf.select(
            "pair", "grp", "n",
            _bucket("a", "amin", "amax").alias("bx"),
            _bucket("b", "bmin", "bmax").alias("by"),
        )
        .groupBy("pair", "grp", "n", "bx", "by")
        .agg(F.count("*").alias("cnt"))
    )
    w_x = Window.partitionBy("pair", "grp", "bx")
    w_y = Window.partitionBy("pair", "grp", "by")
    probs = cells.select(
        "pair", "grp", "n",
        (F.col("cnt") / F.col("n")).alias("pxy"),
        (F.sum("cnt").over(w_x) / F.col("n")).alias("px"),
        (F.sum("cnt").over(w_y) / F.col("n")).alias("py"),
    )
    term = F.col("pxy") * (
        F.log(F.col("pxy") + eps) - F.log(F.col("px") + eps) - F.log(F.col("py") + eps)
    )
    return probs.groupBy("pair", "grp").agg(
        F.max("n").alias("n_pairs"), F.sum(term).alias("mi")
    )

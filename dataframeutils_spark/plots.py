"""Reference-style per-analysis plot renderings (O10 presentation layer).

The reference draws specific figure styles per analysis
(``time_series_study.py:164-177`` histograms for distribution moments,
``:247-284`` rejection bars + a p-value dumbbell for stationarity) on a
spine-less minimalist axes style (``:96-111``). These renderers
reproduce those figure *shapes* from the engine's small result tables —
driver-side pandas frames of a few hundred rows at most; the 100 TB
input never reaches the driver.

Same import contract as :func:`dataframeutils_spark.api.save_plot`:
matplotlib missing → loud ``RuntimeError``, never a silent no-op.
"""

from __future__ import annotations

import os

import pandas as pd

# black/accent-first ordering like the reference's palette; values are
# matplotlib "tab" defaults, not the reference's custom hex set
PALETTE = ["black", "tab:red", "tab:blue", "tab:green", "tab:orange", "tab:purple"]


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "publish_plot=True requires matplotlib, which is not installed "
            "in this environment; install matplotlib or pass "
            "publish_plot=False"
        ) from exc
    plt.ioff()
    return plt


def _tidy(ax, title: str | None = None) -> None:
    """Minimalist axes: no spines, no grid, sparse small ticks."""
    for s in ax.spines.values():
        s.set_visible(False)
    ax.grid(False)
    if title:
        ax.set_title(title, fontsize=12, pad=8)
    ax.tick_params(axis="both", which="both", length=0, labelsize=9)


def plot_distribution_histograms(pdf: pd.DataFrame, out_dir: str) -> list[str]:
    """Per feature: side-by-side histograms of the cross-group skew and
    kurtosis distributions (reference ``time_series_study.py:164-177``).
    Input = the distribution_diagnostics result table (one row per
    group × feature)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    for feature, fdf in pdf.groupby("feature"):
        fig, axes = plt.subplots(1, 2, figsize=(9, 3))
        axes[0].hist(fdf["skew"].dropna(), bins=16, color=PALETTE[1])
        _tidy(axes[0], title=f"Skew: {feature}")
        axes[1].hist(fdf["kurtosis"].dropna(), bins=16, color=PALETTE[2])
        _tidy(axes[1], title=f"Kurtosis: {feature}")
        fig.tight_layout()
        path = os.path.join(out_dir, f"distribution_{feature}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths


def plot_stationarity(
    results_pdf: pd.DataFrame, summary_pdf: pd.DataFrame, out_dir: str
) -> list[str]:
    """Reference stationarity figures (``time_series_study.py:247-284``):
    a grouped rejection-proportion bar chart per feature, then one
    dumbbell figure per feature connecting each group's ADF p to its
    KPSS p."""
    import numpy as np

    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []

    if len(summary_pdf):
        fig, ax = plt.subplots(figsize=(6, 3))
        x = np.arange(len(summary_pdf))
        w = 0.35
        ax.bar(
            x - w / 2,
            summary_pdf["prop_reject_unit_root"].to_numpy(),
            width=w,
            color=PALETTE[1],
            label="ADF rejects",
        )
        ax.bar(
            x + w / 2,
            summary_pdf["prop_reject_stationarity"].to_numpy(),
            width=w,
            color=PALETTE[2],
            label="KPSS rejects",
        )
        ax.set_xticks(x)
        ax.set_xticklabels(summary_pdf["feature"].to_numpy(), fontsize=9)
        _tidy(ax, title="Stationarity rejections")
        ax.legend(frameon=False, fontsize=8, loc="upper right")
        fig.tight_layout()
        path = os.path.join(out_dir, "stationarity_summary.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)

    for feature, fdf in results_pdf.groupby("feature"):
        if not len(fdf):
            continue
        fig, ax = plt.subplots(figsize=(7, 4))
        y = np.arange(len(fdf))
        adf_p = fdf["adf_p"].to_numpy()
        kpss_p = fdf["kpss_p"].to_numpy()
        for i in range(len(y)):
            ax.plot([adf_p[i], kpss_p[i]], [y[i], y[i]], color=PALETTE[0], linewidth=2)
        ax.scatter(adf_p, y, color=PALETTE[1], s=16, label="ADF p")
        ax.scatter(kpss_p, y, color=PALETTE[2], s=16, label="KPSS p")
        ax.set_xlabel("p-value")
        ax.set_yticks([])
        _tidy(ax, title=f"Stationarity p-values: {feature}")
        ax.legend(frameon=False, fontsize=8, loc="lower right")
        fig.tight_layout()
        path = os.path.join(out_dir, f"stationarity_dumbbell_{feature}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths


def _save(fig, plt, out_dir: str, name: str, dpi: int = 150) -> str:
    path = os.path.join(out_dir, name)
    fig.tight_layout()
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_hurst(pdf: pd.DataFrame, out_dir: str) -> list[str]:
    """Per-feature Hurst-exponent histogram (reference ``:355-362``).
    Input = the memory_dependence result table (``hurst_exp`` column)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for feature, fdf in pdf.groupby("feature"):
        fig, ax = plt.subplots(figsize=(6, 3))
        ax.hist(fdf["hurst_exp"].dropna(), bins=16, color=PALETTE[2])
        _tidy(ax, title=f"Hurst exponent: {feature}")
        paths.append(_save(fig, plt, out_dir, f"hurst_{feature}.png"))
    return paths


def plot_dominant_frequency(pdf: pd.DataFrame, out_dir: str) -> list[str]:
    """Per-feature dom_freq × dom_power scatter (reference ``:418-431``).
    Input = the frequency_domain result table."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for feature, fdf in pdf.groupby("feature"):
        fig, ax = plt.subplots(figsize=(6, 3))
        ax.scatter(fdf["dom_freq"], fdf["dom_power"], color=PALETTE[1], s=14)
        ax.set_xlabel("dom freq")
        ax.set_ylabel("power")
        _tidy(ax, title=f"Dominant frequency: {feature}")
        paths.append(_save(fig, plt, out_dir, f"dom_freq_{feature}.png"))
    return paths


def plot_dispersion(pdf: pd.DataFrame, feature: str, out_dir: str) -> str:
    """Cross-sectional dispersion line over dates (reference
    ``:461-470``). Input = the dispersion result table, already sorted
    by date via the deterministic head."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    fdf = pdf.sort_values("date")
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(fdf["date"], fdf["dispersion"], color=PALETTE[0], linewidth=2)
    _tidy(ax, title=f"Dispersion: {feature}")
    return _save(fig, plt, out_dir, f"dispersion_{feature}.png")


def plot_ar1(pdf: pd.DataFrame, out_dir: str) -> list[str]:
    """Per-feature AR(1) R² histogram (reference ``:510-521``)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for feature, fdf in pdf.groupby("feature"):
        fig, ax = plt.subplots(figsize=(6, 3))
        ax.hist(fdf["ar1_r2"].dropna(), bins=16, color=PALETTE[1])
        _tidy(ax, title=f"AR(1) R²: {feature}")
        paths.append(_save(fig, plt, out_dir, f"ar1_r2_{feature}.png"))
    return paths


def plot_lagged_corr(pdf: pd.DataFrame, out_dir: str, top_pairs: int = 5) -> str:
    """Avg lagged-correlation lines for the top pairs (reference
    ``:644-659``). Input = the long lagged_corr result table
    (``pair, lag, avg_corr``)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 3))
    for i, (pair, fdf) in enumerate(pdf.groupby("pair")):
        if i >= top_pairs:
            break
        fdf = fdf.sort_values("lag")
        ax.plot(
            fdf["lag"], fdf["avg_corr"], linewidth=2,
            color=PALETTE[i % len(PALETTE)], label=pair,
        )
    _tidy(ax, title=f"Avg lagged correlations (top {top_pairs} pairs)")
    ax.legend(frameon=False, fontsize=7, loc="upper right", ncol=1)
    return _save(fig, plt, out_dir, "lagged_corr.png")


def plot_rolling_corr_example(
    pdf: pd.DataFrame, fa: str, fb: str, out_dir: str, example_group: str | None = None
) -> str:
    """Rolling-corr line for one example group (reference ``:660-676``).
    Input = the rolling_corr result table (``grp, date,
    rolling_corr``); defaults to the first group in sort order."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    gkey = example_group if example_group is not None else sorted(pdf["grp"].unique())[0]
    fdf = pdf[pdf["grp"] == gkey].sort_values("date")
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(fdf["date"], fdf["rolling_corr"], color=PALETTE[1], linewidth=2, label=f"{fa}|{fb}")
    _tidy(ax, title=f"Rolling corr ({fa} vs {fb}) - {gkey}")
    ax.legend(frameon=False, fontsize=7, loc="upper right")
    return _save(fig, plt, out_dir, "rolling_corr_example.png")


def _panel_2x2(plt, suptitle: str):
    fig, axes = plt.subplots(2, 2, figsize=(12, 10))
    fig.suptitle(suptitle, fontsize=16, fontweight="bold")
    return fig, axes


def _tidy_panel(axes) -> None:
    for ax in axes.flat:
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
        ax.grid(False)


def plot_regime_analysis(pdf: pd.DataFrame, feature: str, out_dir: str) -> str:
    """2×2 regime panel (reference ``:979-1020``): probability scatter,
    switch histogram, AIC×BIC scatter, log-likelihood histogram."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = _panel_2x2(plt, f"Regime Detection Analysis: {feature}")
    axes[0, 0].scatter(pdf["regime_1_prob"], pdf["regime_2_prob"], c=PALETTE[0], s=60, alpha=0.7)
    axes[0, 0].set_xlabel("Regime 1 Probability")
    axes[0, 0].set_ylabel("Regime 2 Probability")
    axes[0, 0].set_title("Regime Probability Distribution")
    axes[0, 1].hist(pdf["regime_switches"], bins=10, color=PALETTE[1], alpha=0.7)
    axes[0, 1].set_xlabel("Number of Regime Switches")
    axes[0, 1].set_ylabel("Frequency")
    axes[0, 1].set_title("Regime Switch Distribution")
    axes[1, 0].scatter(pdf["aic"], pdf["bic"], c=PALETTE[2], s=60, alpha=0.7)
    axes[1, 0].set_xlabel("AIC")
    axes[1, 0].set_ylabel("BIC")
    axes[1, 0].set_title("Model Fit Comparison")
    axes[1, 1].hist(pdf["log_likelihood"].dropna(), bins=10, color=PALETTE[3], alpha=0.7)
    axes[1, 1].set_xlabel("Log Likelihood")
    axes[1, 1].set_ylabel("Frequency")
    axes[1, 1].set_title("Log Likelihood Distribution")
    _tidy_panel(axes)
    return _save(fig, plt, out_dir, f"regime_detection_{feature}.png", dpi=300)


def plot_volatility_analysis(
    pdf: pd.DataFrame, feature: str, model_type: str, out_dir: str
) -> str:
    """2×2 volatility panel (reference ``:1021-1062``)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = _panel_2x2(plt, f"Volatility Analysis ({model_type}): {feature}")
    axes[0, 0].scatter(pdf["persistence"], pdf["avg_volatility"], c=PALETTE[0], s=60, alpha=0.7)
    axes[0, 0].set_xlabel("Persistence")
    axes[0, 0].set_ylabel("Average Volatility")
    axes[0, 0].set_title("Persistence vs Volatility")
    axes[0, 1].hist(pdf["avg_volatility"].dropna(), bins=10, color=PALETTE[1], alpha=0.7)
    axes[0, 1].set_xlabel("Average Volatility")
    axes[0, 1].set_ylabel("Frequency")
    axes[0, 1].set_title("Volatility Distribution")
    axes[1, 0].scatter(pdf["aic"], pdf["bic"], c=PALETTE[2], s=60, alpha=0.7)
    axes[1, 0].set_xlabel("AIC")
    axes[1, 0].set_ylabel("BIC")
    axes[1, 0].set_title("Model Fit Comparison")
    axes[1, 1].hist(pdf["vol_skew"].dropna(), bins=10, color=PALETTE[3], alpha=0.7)
    axes[1, 1].set_xlabel("Volatility Skewness")
    axes[1, 1].set_ylabel("Frequency")
    axes[1, 1].set_title("Volatility Skewness Distribution")
    _tidy_panel(axes)
    return _save(
        fig, plt, out_dir, f"volatility_analysis_{model_type.lower()}_{feature}.png", dpi=300
    )


def plot_outlier_analysis(
    pdf: pd.DataFrame, feature: str, method: str, out_dir: str
) -> str:
    """2×2 outlier panel (reference ``:1064-1107``), including the
    with/without-outliers pie."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = _panel_2x2(plt, f"Outlier Detection ({method}): {feature}")
    axes[0, 0].hist(pdf["outlier_rate"].dropna(), bins=10, color=PALETTE[0], alpha=0.7)
    axes[0, 0].set_xlabel("Outlier Rate")
    axes[0, 0].set_ylabel("Frequency")
    axes[0, 0].set_title("Outlier Rate Distribution")
    axes[0, 1].hist(pdf["n_outliers"], bins=10, color=PALETTE[1], alpha=0.7)
    axes[0, 1].set_xlabel("Number of Outliers")
    axes[0, 1].set_ylabel("Frequency")
    axes[0, 1].set_title("Outlier Count Distribution")
    axes[1, 0].scatter(
        pdf["avg_outlier_score"], pdf["max_outlier_score"], c=PALETTE[2], s=60, alpha=0.7
    )
    axes[1, 0].set_xlabel("Average Outlier Score")
    axes[1, 0].set_ylabel("Max Outlier Score")
    axes[1, 0].set_title("Outlier Score Comparison")
    n_with = int((pdf["n_outliers"] > 0).sum())
    axes[1, 1].pie(
        [n_with, len(pdf) - n_with],
        labels=["With Outliers", "No Outliers"],
        colors=[PALETTE[3], PALETTE[4]],
        autopct="%1.1f%%",
    )
    axes[1, 1].set_title("Groups with Outliers")
    _tidy_panel(axes)
    return _save(fig, plt, out_dir, f"outlier_detection_{method}_{feature}.png", dpi=300)

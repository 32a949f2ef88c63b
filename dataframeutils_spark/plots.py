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

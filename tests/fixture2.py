"""Second seeded fixture for the from-scratch statistical kernels
(VERDICT r6 #3).

The first fixture (tests/ref_fixture.py) pins the kernels to the
reference's committed statsmodels goldens on ONE 60-point panel — the
GIF-codec episode showed that a single fixture lets "tuned to the
fixture" bugs survive. This module provides an INDEPENDENT second
fixture: statsmodels/arch cannot run in this sandbox, so instead of a
second library golden the suite in tests/test_stat_kernels2.py checks

* engineered series with analytically KNOWN qualitative answers
  (exact random walk, near-unit-root AR(0.98), stationary AR(0.5),
  deterministic trend, high-persistence GARCH(1,1), a cointegrated
  pair, a one-lag Granger-causal pair, a 2-state Markov chain);
* every closed-form statistic recomputed through an INDEPENDENT
  numerical path (QR-based OLS vs the kernels' lstsq/pinv,
  pandas-shift lag matrices vs _lagmat, np.correlate ACF, O(n²)
  direct DFT vs rfft, mpmath special functions vs the Numerical
  Recipes series/continued-fraction code);
* parameter recovery on long simulations with known truth.

Provenance is recorded in FIXTURES.md §F6. Everything is seeded
(default_rng) and deterministic.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

SEED = 7
N = 400


def fixture2_series(seed: int = SEED, n: int = N) -> dict[str, np.ndarray]:
    """Five named series with known stationarity structure.

    Draw order is fixed (rw noise, near noise, ar05 noise, trend noise,
    then the pair/garch draws happen in their own builders) so adding a
    series never silently changes an existing one.
    """
    rng = np.random.default_rng(seed)
    rw = np.cumsum(rng.normal(0.0, 1.0, n))  # exact unit root
    near = _ar1(rng.normal(0.0, 1.0, n), 0.98)  # near-unit-root
    ar05 = _ar1(rng.normal(0.0, 1.0, n), 0.5)  # clearly stationary
    trend = 0.05 * np.arange(n) + rng.normal(0.0, 1.0, n)  # trend-stationary
    return {"rw": rw, "near_ur": near, "ar05": ar05, "trend": trend}


def _ar1(eps: np.ndarray, phi: float) -> np.ndarray:
    x = np.empty(len(eps))
    x[0] = eps[0]
    for i in range(1, len(eps)):
        x[i] = phi * x[i - 1] + eps[i]
    return x


def cointegrated_pair(seed: int = SEED, n: int = N):
    """(y, x): x a random walk, y = 2x + AR(0.3) noise → cointegrated.
    Also returns an independent random walk for the negative case."""
    rng = np.random.default_rng(seed + 1)
    x = np.cumsum(rng.normal(0.0, 1.0, n))
    noise = _ar1(rng.normal(0.0, 0.5, n), 0.3)
    y = 2.0 * x + noise
    other = np.cumsum(rng.normal(0.0, 1.0, n))
    return y, x, other


def granger_pair(seed: int = SEED, n: int = N):
    """(x1, x2) with x1_t = 0.6·x2_{t-1} + ε: x2 Granger-causes x1,
    not the reverse."""
    rng = np.random.default_rng(seed + 2)
    x2 = rng.normal(0.0, 1.0, n)
    x1 = np.empty(n)
    x1[0] = 0.0
    for i in range(1, n):
        x1[i] = 0.6 * x2[i - 1] + rng.normal(0.0, 0.5)
    return x1, x2


GARCH_TRUE = {"omega": 0.05, "alpha": 0.05, "beta": 0.92}  # persistence 0.97


def garch_series(seed: int = SEED, n: int = 3000) -> np.ndarray:
    """High-persistence GARCH(1,1) with known parameters, started at the
    unconditional variance."""
    om, al, be = GARCH_TRUE["omega"], GARCH_TRUE["alpha"], GARCH_TRUE["beta"]
    rng = np.random.default_rng(seed + 3)
    z = rng.normal(0.0, 1.0, n)
    s2 = np.empty(n)
    x = np.empty(n)
    s2[0] = om / (1.0 - al - be)
    x[0] = math.sqrt(s2[0]) * z[0]
    for t in range(1, n):
        s2[t] = om + al * x[t - 1] ** 2 + be * s2[t - 1]
        x[t] = math.sqrt(s2[t]) * z[t]
    return x


MARKOV_TRUE = {"mu": (-2.0, 2.0), "sigma": 0.5, "stay": 0.95}


def markov_series(seed: int = SEED, n: int = 2000):
    """2-state switching-mean Gaussian series with known truth; returns
    (x, states)."""
    mu = MARKOV_TRUE["mu"]
    stay = MARKOV_TRUE["stay"]
    rng = np.random.default_rng(seed + 4)
    states = np.empty(n, dtype=int)
    states[0] = 0
    for t in range(1, n):
        states[t] = states[t - 1] if rng.random() < stay else 1 - states[t - 1]
    x = np.array([mu[s] for s in states]) + rng.normal(0.0, MARKOV_TRUE["sigma"], n)
    return x, states


def fixture2_panel(seed: int = SEED, n: int = N) -> pd.DataFrame:
    """The named series as a long panel (date, name, feature_1) — one
    group per series — for running the Spark operators end-to-end on
    the second fixture."""
    series = fixture2_series(seed, n)
    dates = pd.date_range("2023-01-01", periods=n, freq="D")
    rows = []
    for name, x in series.items():
        for d, v in zip(dates, x):
            rows.append((d.to_pydatetime(), name, float(v)))
    return pd.DataFrame(rows, columns=["date", "name", "feature_1"])

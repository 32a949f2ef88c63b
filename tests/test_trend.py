"""Trend & structural-change operators vs independent numpy oracles.

Each test rebuilds the statistic with plain numpy (an independent
implementation, not the operator's own code path) on a synthetic
panel and compares the Spark output value-for-value.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pandas as pd
import pytest

from dataframeutils_spark.operators import trend

EPOCH = dt.date(1970, 1, 1)


def _long_df(spark, series: dict[tuple[str, str], np.ndarray], start=dt.date(1995, 1, 1)):
    rows = []
    for (grp, feature), vals in series.items():
        for i, v in enumerate(vals):
            rows.append((grp, feature, start + dt.timedelta(days=i), float(v)))
    return spark.createDataFrame(rows, "grp string, feature string, date date, value double")


def _rng(seed=7):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------


def test_cusum_detects_known_shift(spark):
    r = _rng()
    n = 200
    x = np.concatenate([r.normal(0.0, 1.0, 120), r.normal(3.0, 1.0, 80)])
    quiet = r.normal(5.0, 1.0, n)
    df = _long_df(spark, {("g", "shift"): x, ("g", "quiet"): quiet})
    out = {row["feature"]: row for row in trend.changepoint_cusum(df).collect()}

    # independent numpy CUSUM
    s = np.cumsum(x - x.mean())
    stat = np.max(np.abs(s)) / (x.std(ddof=1) * np.sqrt(n))
    t = int(np.argmax(np.abs(s)))
    got = out["shift"]
    assert got["n"] == n
    assert abs(got["cusum_stat"] - stat) < 1e-5
    assert got["cp_date"] == dt.date(1995, 1, 1) + dt.timedelta(days=t)
    assert got["shift_detected"] is True
    assert abs(got["mean_before"] - x[: t + 1].mean()) < 1e-4
    assert abs(got["mean_after"] - x[t + 1 :].mean()) < 1e-4
    # Kolmogorov p-value: detected shift -> tiny, quiet series -> large
    assert got["p_value"] < 1e-6
    q = out["quiet"]
    assert q["shift_detected"] is False and q["p_value"] > 0.05


def test_cusum_p_value_formula(spark):
    r = _rng(3)
    x = r.normal(0.0, 1.0, 64)
    df = _long_df(spark, {("g", "f"): x})
    row = trend.changepoint_cusum(df).collect()[0]
    lam = row["cusum_stat"]
    p = 2.0 * sum((-1) ** (k + 1) * np.exp(-2.0 * k * k * lam * lam) for k in range(1, 6))
    assert abs(row["p_value"] - min(1.0, max(0.0, p))) < 1e-6


# ---------------------------------------------------------------------------
# seasonal decomposition
# ---------------------------------------------------------------------------


def _numpy_decompose(x: np.ndarray, start: dt.date, period=7):
    """Classical additive decomposition (centered MA, phase averages)."""
    n = len(x)
    half = period // 2
    trend_ = np.full(n, np.nan)
    for i in range(half, n - half):
        trend_[i] = x[i - half : i + half + 1].mean()
    detr = x - trend_
    phase = (np.array([(start - EPOCH).days + i for i in range(n)])) % period
    sraw = np.array([np.nanmean(detr[phase == p]) for p in range(period)])
    seasonal_idx = sraw - sraw.mean()
    seas = seasonal_idx[phase]
    mask = ~np.isnan(detr)
    rem = detr[mask] - seas[mask]
    vr, vd = np.var(rem, ddof=1), np.var(detr[mask], ddof=1)
    vt = np.var(x[mask] - seas[mask], ddof=1)
    s_strength = max(0.0, 1 - vr / vd)
    t_strength = max(0.0, 1 - vr / vt)
    return seasonal_idx, s_strength, t_strength


def test_seasonal_decompose_vs_numpy(spark):
    r = _rng(11)
    n = 140
    start = dt.date(1995, 1, 1)
    tdays = np.arange(n)
    weekly = np.array([5, -3, 0, 2, -1, -4, 1])
    phase0 = (start - EPOCH).days % 7
    x = 0.05 * tdays + weekly[(phase0 + tdays) % 7] + r.normal(0, 0.3, n)
    df = _long_df(spark, {("g", "f"): x}, start=start)
    out = trend.seasonal_decompose(df).toPandas().sort_values("phase")
    seasonal_idx, s_str, t_str = _numpy_decompose(x, start)
    assert len(out) == 7
    np.testing.assert_allclose(
        out["seasonal"].to_numpy(), seasonal_idx[out["phase"].to_numpy()], atol=1e-9
    )
    np.testing.assert_allclose(out["seasonal_strength"].iloc[0], s_str, atol=1e-9)
    np.testing.assert_allclose(out["trend_strength"].iloc[0], t_str, atol=1e-9)
    # a genuinely weekly series must be detected as strongly seasonal
    assert s_str > 0.95
    # recovered seasonal effects track the planted weekly pattern:
    # x[i] adds weekly[(phase0 + i) % 7], i.e. weekly[phase(i)], so the
    # recovered index at epoch phase p estimates centered weekly[p]
    planted = weekly - weekly.mean()
    got = out.set_index("phase")["seasonal"]
    for p in range(7):
        assert abs(got[p] - planted[p]) < 0.2


def test_seasonal_decompose_rejects_even_period(spark):
    with pytest.raises(ValueError):
        trend.seasonal_decompose(_long_df(spark, {("g", "f"): np.ones(40)}), period=4)


# ---------------------------------------------------------------------------
# sufficient-statistics OLS
# ---------------------------------------------------------------------------


def test_panel_ols_vs_numpy(spark):
    r = _rng(5)
    n = 300
    x1 = r.normal(10, 3, n)
    x2 = r.normal(-2, 1.5, n)
    y = 4.0 + 2.5 * x1 - 1.25 * x2 + r.normal(0, 0.8, n)
    pdf = pd.DataFrame(
        {"grp": "A", "date": [dt.date(1995, 1, 1)] * n, "feature_1": x1, "feature_2": x2, "feature_3": y}
    )
    panel = spark.createDataFrame(pdf)
    row = trend.panel_ols(panel).collect()[0]

    X = np.column_stack([np.ones(n), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    sse = resid @ resid
    sigma2 = sse / (n - 3)
    cov = sigma2 * np.linalg.inv(X.T @ X)
    se = np.sqrt(np.diag(cov))
    sst = ((y - y.mean()) ** 2).sum()

    assert row["n"] == n
    np.testing.assert_allclose(
        [row["beta0"], row["beta1"], row["beta2"]], beta, rtol=1e-9
    )
    np.testing.assert_allclose([row["se_beta1"], row["se_beta2"]], se[1:], rtol=1e-9)
    np.testing.assert_allclose(
        [row["t_beta1"], row["t_beta2"]], beta[1:] / se[1:], rtol=1e-9
    )
    np.testing.assert_allclose(row["r2"], 1 - sse / sst, rtol=1e-9)


def test_panel_ols_perfect_fit_guard(spark, ddb):
    """Degenerate perfect-fit group (y EXACTLY linear in x1, x2):
    fp rounding can land sse a hair below zero, where DuckDB's
    sqrt(negative) ERRORS while Spark NaNs — both sides clamp with
    greatest(0.0, sse). Pin the guard in BOTH engines: the group
    survives, se == 0, t-stats NULL, r2 == 1, and neither engine
    raises."""
    import numpy as np

    from dataframeutils_spark import oracles

    r = _rng(13)
    n = 120
    x1 = r.normal(10, 3, n)
    x2 = r.normal(-2, 1.5, n)
    y = 4.0 + 2.5 * x1 - 1.25 * x2  # zero residual by construction
    pdf = pd.DataFrame(
        {
            "grp": "A",
            "date": [dt.date(1995, 1, 1)] * n,
            "feature_1": x1,
            "feature_2": x2,
            "feature_3": y,
        }
    )
    row = trend.panel_ols(spark.createDataFrame(pdf)).collect()[0]
    assert row["se_beta1"] == 0.0 and row["se_beta2"] == 0.0
    assert row["t_beta1"] is None and row["t_beta2"] is None
    np.testing.assert_allclose(
        [row["beta0"], row["beta1"], row["beta2"]], [4.0, 2.5, -1.25],
        rtol=1e-9,
    )
    assert row["r2"] == pytest.approx(1.0, abs=1e-12)
    # oracle side: swap the lineitem-derived panel for the fixture and
    # run the SAME guarded SQL — must not raise, must agree
    ddb.register("fit_panel", pdf)
    sql = oracles.OLS_SQL.replace(
        oracles.PANEL_CTE, "panel AS (SELECT * FROM fit_panel)"
    )
    orow = ddb.execute(sql).fetchdf().iloc[0]
    assert float(orow["se_beta1"]) == 0.0
    assert pd.isna(orow["t_beta1"]) and pd.isna(orow["t_beta2"])
    np.testing.assert_allclose(
        [orow["beta0"], orow["beta1"], orow["beta2"]], [4.0, 2.5, -1.25],
        rtol=1e-6,
    )


def test_panel_ols_collinear_guarded(spark):
    # x2 = 2*x1 exactly -> det == 0 -> the group is dropped, not NaN'd
    n = 50
    x1 = np.arange(n, dtype=float)
    pdf = pd.DataFrame(
        {"grp": "A", "feature_1": x1, "feature_2": 2 * x1, "feature_3": x1 + 1}
    )
    assert trend.panel_ols(spark.createDataFrame(pdf)).count() == 0


# ---------------------------------------------------------------------------
# Theil-Sen
# ---------------------------------------------------------------------------


def _portable_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_theilsen_vs_numpy(spark):
    r = _rng(13)
    n = 400
    start = dt.date(1995, 1, 1)
    x = np.arange(n, dtype=float) + (start - EPOCH).days
    v = 0.7 * x - 30.0 + r.normal(0, 5.0, n)
    # plant gross outliers the robust estimator must shrug off
    v[::50] += 500.0
    df = _long_df(spark, {("g", "f"): v}, start=start)
    row = trend.theilsen_slope(df, cap=320).collect()[0]

    # replicate the deterministic sample (P = ceil(n/cap))
    P = (n + 319) // 320
    keep = np.array(
        [
            _portable_hash60(f"g|f|{(start + dt.timedelta(days=i)).isoformat()}") % P == 0
            for i in range(n)
        ]
    )
    xs, vs = x[keep], v[keep]
    slopes = [
        (vs[j] - vs[i]) / (xs[j] - xs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    ]
    slope = np.median(slopes)
    intercept = np.median(vs - slope * xs)

    assert row["n"] == n
    assert row["n_sampled"] == int(keep.sum())
    assert row["n_pairs"] == len(slopes)
    np.testing.assert_allclose(row["slope"], slope, rtol=1e-9)
    np.testing.assert_allclose(row["intercept"], intercept, rtol=1e-9)
    # robust to the planted outliers
    assert abs(row["slope"] - 0.7) < 0.05


def test_theilsen_pair_count_bounded(spark):
    """The sample predicate keeps the pair join ~cap^2/2 regardless of n."""
    r = _rng(17)
    n = 2000
    v = np.arange(n) * 0.1 + r.normal(0, 1, n)
    df = _long_df(spark, {("g", "f"): v})
    row = trend.theilsen_slope(df, cap=100).collect()[0]
    # with P = ceil(2000/100) = 20 the expected sample is ~100 rows
    assert row["n_sampled"] < 250
    assert row["n_pairs"] < 250 * 249 / 2


# ---------------------------------------------------------------------------
# Mahalanobis outliers (sufficient-statistics multivariate tier)
# ---------------------------------------------------------------------------


def test_mahalanobis_vs_numpy(spark):
    from dataframeutils_spark.operators import outliers

    r = _rng(23)
    n = 250
    # correlated features + a few joint-inconsistent rows
    x1 = r.normal(0, 1, n)
    x2 = 0.8 * x1 + r.normal(0, 0.6, n)
    x3 = -0.5 * x1 + 0.3 * x2 + r.normal(0, 0.7, n)
    # break the correlation structure without extreme marginals
    for i in (10, 77, 150):
        x2[i] = -0.8 * x1[i] * 3
    pdf = pd.DataFrame(
        {
            "grp": "A",
            "date": [dt.date(1995, 1, 1) + dt.timedelta(days=i) for i in range(n)],
            "feature_1": x1,
            "feature_2": x2,
            "feature_3": x3,
        }
    )
    row = outliers.mahalanobis_outliers(spark.createDataFrame(pdf)).collect()[0]

    X = np.column_stack([x1, x2, x3])
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    inv = np.linalg.inv(cov)
    d = X - mu
    md2 = np.einsum("ij,jk,ik->i", d, inv, d)
    thr = outliers.CHI2_3_975
    assert row["n"] == n
    assert row["n_outliers"] == int((np.round(md2, 6) > thr).sum())
    np.testing.assert_allclose(row["mean_md2"], md2.mean(), rtol=1e-6)
    np.testing.assert_allclose(row["max_md2"], md2.max(), rtol=1e-6)
    assert row["max_md2_date"] == pdf["date"].iloc[int(np.argmax(md2))]
    # the planted joint-inconsistent rows are detected
    assert row["n_outliers"] >= 3


def test_mahalanobis_singular_cov_dropped(spark):
    # feature_2 = 2 * feature_1 exactly -> singular covariance -> dropped
    from dataframeutils_spark.operators import outliers

    n = 40
    x = np.arange(n, dtype=float)
    pdf = pd.DataFrame(
        {
            "grp": "A",
            "date": [dt.date(1995, 1, 1) + dt.timedelta(days=i) for i in range(n)],
            "feature_1": x,
            "feature_2": 2 * x,
            "feature_3": np.sin(x),
        }
    )
    assert outliers.mahalanobis_outliers(spark.createDataFrame(pdf)).count() == 0


# ---------------------------------------------------------------------------
# DTW (weekly, exact-oracled)
# ---------------------------------------------------------------------------


def _dtw_ref(a, b):
    """Independent reference: plain-python iterative DP (no recursion —
    a raised recursion limit leaks into other tests and trips
    hypothesis's cross-thread check)."""
    n, m = len(a), len(b)
    inf = float("inf")
    prev = [inf] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [inf] * (m + 1)
        for j in range(1, m + 1):
            cur[j] = abs(a[i - 1] - b[j - 1]) + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return prev[m]


def _weekly_panel(spark, vals_a, vals_b, grp="A", start=dt.date(1995, 1, 2)):
    # one row per week (start is a Monday) so weekly resample is 1:1
    rows = [
        (grp, start + dt.timedelta(weeks=i), float(va), 0.0, float(vb))
        for i, (va, vb) in enumerate(zip(vals_a, vals_b))
    ]
    return spark.createDataFrame(
        rows, "grp string, date date, feature_1 double, feature_2 double, feature_3 double"
    )


def test_dtw_vs_reference(spark):
    r = _rng(31)
    n = 60
    a = np.cumsum(r.normal(0, 1, n))
    b = np.roll(a, 3) + r.normal(0, 0.1, n)  # time-shifted twin
    df = _weekly_panel(spark, a, b)
    row = trend.dtw_weekly(df, min_len=20).collect()[0]
    za = (a - a.mean()) / a.std(ddof=1)
    zb = (b - b.mean()) / b.std(ddof=1)
    want = _dtw_ref(tuple(za), tuple(zb))
    assert row["n_weeks"] == n
    np.testing.assert_allclose(row["dtw_l1"], want, rtol=1e-9)
    np.testing.assert_allclose(row["dtw_per_step"], want / n, rtol=1e-9)


def test_dtw_identity_and_shift_elasticity(spark):
    r = _rng(37)
    n = 52
    a = np.cumsum(r.normal(0, 1, n))
    # identical series -> distance 0
    row = trend.dtw_weekly(_weekly_panel(spark, a, a), min_len=20).collect()[0]
    assert row["dtw_l1"] == 0.0
    # a time-shifted copy must be far closer under DTW than under
    # rigid alignment (the reason DTW exists)
    b = np.roll(a, 5)
    za = (a - a.mean()) / a.std(ddof=1)
    zb = (b - b.mean()) / b.std(ddof=1)
    rigid = float(np.abs(za - zb).sum())
    row = trend.dtw_weekly(_weekly_panel(spark, a, b), min_len=20).collect()[0]
    assert row["dtw_l1"] < 0.5 * rigid


def test_dtw_constant_series_gated(spark):
    # zero variance -> z-normalization undefined -> group dropped
    a = np.ones(40)
    b = np.arange(40, dtype=float)
    assert trend.dtw_weekly(_weekly_panel(spark, a, b), min_len=20).count() == 0


# ---------------------------------------------------------------------------
# two-sample KS drift
# ---------------------------------------------------------------------------


def _ks_ref(x1, x2):
    xs = np.unique(np.round(np.concatenate([x1, x2]), 6))
    f1 = np.searchsorted(np.sort(np.round(x1, 6)), xs, side="right") / len(x1)
    f2 = np.searchsorted(np.sort(np.round(x2, 6)), xs, side="right") / len(x2)
    return np.max(np.abs(f1 - f2))


def test_ks_drift_vs_reference(spark):
    r = _rng(43)
    n = 200
    drifted = np.concatenate([r.normal(0, 1, n // 2), r.normal(1.5, 1, n // 2)])
    stable = r.normal(3, 1, n)
    df = _long_df(spark, {("g", "drift"): drifted, ("g", "stable"): stable})
    out = {row["feature"]: row for row in trend.ks_two_sample(df).collect()}

    for name, series in (("drift", drifted), ("stable", stable)):
        row = out[name]
        # engine splits at the integer midpoint day; replicate exactly
        days = np.arange(n) + (dt.date(1995, 1, 1) - EPOCH).days
        side1 = days * 2 < days.min() + days.max()
        d = _ks_ref(series[side1], series[~side1])
        assert row["n1"] == side1.sum() and row["n2"] == (~side1).sum()
        np.testing.assert_allclose(row["ks_stat"], d, atol=1e-6)
    assert out["drift"]["drift_detected"] is True
    assert out["drift"]["p_value"] < 1e-6
    assert out["stable"]["drift_detected"] is False
    assert out["stable"]["p_value"] > 0.05


def test_ks_kolmogorov_p_formula(spark):
    r = _rng(47)
    x = r.normal(0, 1, 100)
    df = _long_df(spark, {("g", "f"): x})
    row = trend.ks_two_sample(df).collect()[0]
    ne = row["n1"] * row["n2"] / (row["n1"] + row["n2"])
    lam = (np.sqrt(ne) + 0.12 + 0.11 / np.sqrt(ne)) * row["ks_stat"]
    p = 2 * sum((-1) ** (k + 1) * np.exp(-2 * k * k * lam * lam) for k in range(1, 6))
    np.testing.assert_allclose(row["p_value"], min(1.0, max(0.0, p)), atol=1e-6)


def test_holt_forecast_matches_python_replay(spark):
    """Independent sequential replay (plain Python floats, same
    init/recurrence) must reproduce level/trend/RMSE/forecasts — the
    ewma_control pinning discipline for in-plan folds."""
    r = _rng(21)
    n = 40
    y = 10.0 + 0.7 * np.arange(n) + r.normal(0, 1.5, n)
    dates = [dt.date(1995, 1, 1) + dt.timedelta(days=i) for i in range(n)]
    pdf = pd.DataFrame(
        {"grp": "A", "feature": "f", "date": dates, "value": y}
    )
    row = trend.holt_forecast(
        spark.createDataFrame(pdf), alpha=0.3, beta=0.1, min_len=30
    ).collect()[0]

    a, b1 = 0.3, 0.1
    l, b, sse = float(y[0]), 0.0, 0.0
    for t in range(1, n):
        pred = l + b
        e = float(y[t]) - pred
        l_new = a * float(y[t]) + (1 - a) * pred
        b = b1 * (l_new - l) + (1 - b1) * b
        l = l_new
        sse += e * e
    assert row["n"] == n
    assert row["level"] == pytest.approx(l, abs=5.1e-7)
    assert row["trend"] == pytest.approx(b, abs=5.1e-7)
    assert row["rmse"] == pytest.approx((sse / (n - 1)) ** 0.5, abs=5.1e-7)
    for h in range(1, 5):
        assert row[f"fc_{h}"] == pytest.approx(l + h * b, abs=5.1e-7)
    # a clean upward-trend series forecasts higher than its level
    assert row["fc_4"] > row["fc_1"] > 0


def test_holt_forecast_min_len_gate(spark):
    pdf = pd.DataFrame(
        {
            "grp": "A",
            "feature": "f",
            "date": [dt.date(1995, 1, 1 + i) for i in range(5)],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    assert trend.holt_forecast(spark.createDataFrame(pdf), min_len=30).count() == 0


def test_seasonal_anomalies_finds_planted_spike(spark):
    """A clean weekly series with ONE planted spike: exactly that
    observation (and only it) must surface, with expected ≈ the
    clean value and z large; the spike-free twin series emits no
    rows."""
    r = _rng(17)
    n = 140
    start = dt.date(1995, 1, 1)
    phase0 = (start - EPOCH).days % 7
    weekly = np.array([5.0, -3.0, 0.0, 2.0, -1.0, -4.0, 1.0])
    base = 0.05 * np.arange(n) + weekly[(phase0 + np.arange(n)) % 7]
    clean = base + r.normal(0, 0.2, n)
    spiked = clean.copy()
    spiked[70] += 8.0  # ~40 sigma of the noise
    df = _long_df(spark, {("g", "spiked"): spiked, ("g", "clean"): clean},
                  start=start)
    out = trend.seasonal_anomalies(df).collect()
    hits = [x for x in out if x["feature"] == "spiked"]
    assert len(hits) >= 1
    top = max(hits, key=lambda x: abs(x["z"]))
    assert top["date"] == start + dt.timedelta(days=70)
    assert abs(top["z"]) > 5
    # expected tracks the clean structure: the planted +8 shows up as
    # the residual, not as a shifted expectation
    assert top["resid"] > 5
    assert not [x for x in out if x["feature"] == "clean"]

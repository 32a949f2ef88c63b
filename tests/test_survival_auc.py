"""Kaplan-Meier survival and centroid ROC-AUC vs brute force."""

from __future__ import annotations

import datetime as dt

import numpy as np

from dataframeutils_spark.operators import events as events_ops
from dataframeutils_spark.operators import similarity


def _km_ref(durations, censored):
    """Independent KM: dict duration -> (n_risk, d, c, S(t)) at event times."""
    import collections

    tab = collections.defaultdict(lambda: [0, 0])
    for dur, cen in zip(durations, censored):
        tab[dur][1 if cen else 0] += 1
    out, s, at_risk = {}, 1.0, len(durations)
    for t in sorted(tab):
        d, c = tab[t]
        if d > 0:
            s *= 1.0 - d / at_risk
            out[t] = (at_risk, d, c, s)
        at_risk -= d + c
    return out


def test_survival_km_vs_reference(spark):
    rng = np.random.default_rng(19)
    durations = [int(x) for x in rng.integers(0, 40, 500)]
    censored = [bool(x) for x in rng.random(500) < 0.25]
    df = spark.createDataFrame(
        list(zip(["g"] * 500, durations, censored)),
        "cohort string, dur long, censored boolean",
    )
    got = {r["t"]: r for r in events_ops.survival_km(df).collect()}
    want = _km_ref(durations, censored)
    assert set(got) == set(want)
    for t, (n_risk, d, c, s) in want.items():
        r = got[t]
        assert (r["n_risk"], r["n_events"], r["n_censored"]) == (n_risk, d, c)
        np.testing.assert_allclose(r["survival"], s, atol=1e-6)
    ts = sorted(got)
    surv = [got[t]["survival"] for t in ts]
    assert all(a >= b - 1e-12 for a, b in zip(surv, surv[1:]))


def test_survival_km_all_events_at_last_time(spark):
    # every subject dies at t=7 -> survival hits exactly 0 (the
    # ln(0)-vs-NULL engine divergence path)
    rows = [("g", 7, False)] * 20 + [("g", 3, False)] * 5
    df = spark.createDataFrame(rows, "cohort string, dur long, censored boolean")
    out = {r["t"]: r["survival"] for r in events_ops.survival_km(df).collect()}
    assert out[7] == 0.0 and 0 < out[3] < 1


def test_event_gap_durations(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10, "view"),
        (2, base + dt.timedelta(hours=5), 10, "purchase"),
        (3, base + dt.timedelta(hours=12), 10, "view"),
        (4, base + dt.timedelta(hours=20), 20, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = sorted(
        (r["cohort"], r["dur"], r["censored"])
        for r in events_ops.event_gap_durations(df).collect()
    )
    # study end = hour 20. user 10: view->+5h, purchase->+7h,
    # view->censored 8h; user 20: view->censored 0h
    assert got == [
        ("purchase", 7, False),
        ("view", 0, True),
        ("view", 5, False),
        ("view", 8, True),
    ]


def _auc_ref(scores, labels):
    order = np.argsort(scores, kind="mergesort")
    s = np.asarray(scores)[order]
    y = np.asarray(labels)[order]
    n = len(s)
    ranks = np.empty(n)
    i = 0
    while i < n:
        j = i
        while j < n and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0
        i = j
    npos = int(y.sum())
    nneg = n - npos
    return (ranks[y == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)


def test_embedding_auc_vs_reference(spark):
    rng = np.random.default_rng(23)
    dim, per_class = 8, 60
    rows = []
    vecs, labs = [], []
    for c in range(3):
        center = rng.normal(0, 1, dim)
        for i in range(per_class):
            v = center + rng.normal(0, 0.9, dim)
            rows.append((c * per_class + i, [float(x) for x in v], c))
            vecs.append(v)
            labs.append(c)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["class"]: r for r in similarity.embedding_auc(df).collect()}

    V = np.array([np.array(v, dtype=np.float32).astype(float) for v in vecs])
    L = np.array(labs)
    for c in range(3):
        cent = V[L == c].mean(axis=0)
        scores = np.round(
            (V @ cent) / (np.linalg.norm(V, axis=1) * np.linalg.norm(cent)), 6
        )
        want = _auc_ref(scores, (L == c).astype(int))
        r = got[c]
        assert r["n_pos"] == per_class and r["n_neg"] == 2 * per_class
        np.testing.assert_allclose(r["auc"], want, atol=2e-6)
        # clustered data must separate well
        assert r["auc"] > 0.8


def test_embedding_auc_random_labels_near_half(spark):
    rng = np.random.default_rng(29)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 8)], int(rng.integers(0, 2)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    for r in similarity.embedding_auc(df).collect():
        assert 0.35 < r["auc"] < 0.65


# ---------------------------------------------------------------------------
# chi-square independence
# ---------------------------------------------------------------------------


def test_chi2_independence_vs_reference(spark):
    import math

    rng = np.random.default_rng(53)
    base = dt.datetime(2024, 1, 1)
    rows = []
    # planted dependence: type 'a' concentrates on phase 0
    types = ["a", "b", "c", "d", "e"]
    eid = 0
    for _ in range(6000):
        t = types[int(rng.integers(0, 5))]
        day = int(rng.integers(0, 28))
        if t == "a" and rng.random() < 0.5:
            day = (day // 7) * 7  # snap to phase of day 0
        rows.append((eid, base + dt.timedelta(days=day), eid % 97, t))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = events_ops.chi2_independence(df).collect()
    assert len(out) == 35  # 5 types x 7 phases

    # brute-force contingency
    from collections import Counter

    phase0 = (base.date() - dt.date(1970, 1, 1)).days % 7
    cnt = Counter()
    for _, ts, _, t in rows:
        cnt[(t, (ts.date() - dt.date(1970, 1, 1)).days % 7)] += 1
    n = sum(cnt.values())
    rt = Counter()
    ct = Counter()
    for (t, p), c in cnt.items():
        rt[t] += c
        ct[p] += c
    chi2 = sum(
        (cnt[(t, p)] - rt[t] * ct[p] / n) ** 2 / (rt[t] * ct[p] / n)
        for t in types
        for p in range(7)
    )
    x2 = chi2 / 2
    p_ref = math.exp(-x2) * sum(x2**i / math.factorial(i) for i in range(12))
    v_ref = math.sqrt(chi2 / (n * 4))

    r0 = out[0]
    np.testing.assert_allclose(r0["chi2"], chi2, rtol=1e-6)
    assert r0["dof"] == 24
    np.testing.assert_allclose(r0["p_value"], p_ref, atol=1e-6)
    np.testing.assert_allclose(r0["cramers_v"], v_ref, atol=1e-6)
    # dependence is detected and localized to the planted cell
    assert r0["p_value"] < 0.01
    cell = {(r["event_type"], r["dow"]): r for r in out}
    assert cell[("a", phase0)]["std_residual"] > 3
    for r in out:
        np.testing.assert_allclose(
            r["expected"], rt[r["event_type"]] * ct[r["dow"]] / n, rtol=1e-6
        )
        assert r["observed"] == cnt[(r["event_type"], r["dow"])]


def test_chi2_independence_null_case(spark):
    rng = np.random.default_rng(59)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(days=int(rng.integers(0, 28))),
            i % 31,
            "abcde"[int(rng.integers(0, 5))],
        )
        for i in range(8000)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r0 = events_ops.chi2_independence(df).collect()[0]
    # independent by construction -> p not extreme
    assert r0["p_value"] > 0.001
    assert r0["cramers_v"] < 0.05


# ---------------------------------------------------------------------------
# A/B test readout
# ---------------------------------------------------------------------------


def test_ab_test_vs_reference(spark):
    import hashlib

    rng = np.random.default_rng(61)
    base = dt.datetime(2024, 1, 1)
    rows = []
    # planted lift: users in arm 1 (hash-determined) get +2 on 'treat'
    def arm_of(uid):
        return int(hashlib.md5(f"exp1:{uid}".encode()).hexdigest()[:15], 16) % 2

    vals = {"treat": ([], []), "flat": ([], [])}
    for i in range(4000):
        uid = i % 400
        a = arm_of(uid)
        for t in ("treat", "flat"):
            v = float(rng.normal(10, 2)) + (2.0 if (t == "treat" and a == 1) else 0.0)
            rows.append((len(rows), base, uid, t, v))
            vals[t][a].append(v)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["slice"]: r for r in events_ops.ab_test_report(df).collect()}

    for t in ("treat", "flat"):
        va, vb = np.array(vals[t][0]), np.array(vals[t][1])
        r = out[t]
        assert r["n_a"] == len(va) and r["n_b"] == len(vb)
        np.testing.assert_allclose(r["mean_a"], va.mean(), rtol=1e-5)
        np.testing.assert_allclose(r["mean_b"], vb.mean(), rtol=1e-5)
        se = np.sqrt(va.var(ddof=1) / len(va) + vb.var(ddof=1) / len(vb))
        np.testing.assert_allclose(r["z"], (vb.mean() - va.mean()) / se, atol=1e-4)
        pooled = np.sqrt(
            ((len(va) - 1) * va.var(ddof=1) + (len(vb) - 1) * vb.var(ddof=1))
            / (len(va) + len(vb) - 2)
        )
        np.testing.assert_allclose(
            r["cohens_d"], (vb.mean() - va.mean()) / pooled, atol=1e-4
        )
    assert out["treat"]["significant"] is True and out["treat"]["z"] > 10
    assert out["flat"]["significant"] is False


def test_calibration_audit_closed_form(spark):
    """Hand-computed ECE/Brier on a 1-D embedding with two classes
    whose centroids sit at +1 and -1: cosine of every vector to its
    own centroid is ±1, so p ∈ {0, 1} exactly and the audit's bins,
    gaps and Brier are closed-form."""
    from dataframeutils_spark.operators import similarity

    rows = [(1, [1.0], "a"), (2, [2.0], "a"), (3, [-1.0], "b"),
            (4, [-3.0], "b")]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = {r["class"]: r for r in
           similarity.calibration_audit(emb, n_bins=10).collect()}
    # class a: scored against both centroids -> 4 rows; vectors of a
    # give p=1 (y=1), vectors of b give p=0 (y=0): perfectly
    # calibrated -> ece=0, brier=0, two occupied bins
    for cls in ("a", "b"):
        r = out[cls]
        assert r["n"] == 4 and r["n_bins_occupied"] == 2
        assert r["ece"] == 0.0 and r["brier"] == 0.0 and r["max_gap"] == 0.0


def test_calibration_audit_detects_miscalibration(spark):
    """A class whose members sit at the centroid of the OTHER class
    shows a nonzero gap."""
    from dataframeutils_spark.operators import similarity

    # class a vectors point negative (toward b's centroid direction)
    rows = [(1, [1.0, 0.0], "a"), (2, [-1.0, 0.1], "a"),
            (3, [-1.0, 0.0], "b"), (4, [-1.0, -0.1], "b")]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = {r["class"]: r for r in
           similarity.calibration_audit(emb, n_bins=4).collect()}
    assert out["b"]["ece"] > 0.0
    assert out["b"]["brier"] > 0.0


def test_mmd_drift_sees_shape_change_centroid_misses(spark):
    """MMD detects a pure VARIANCE change (centroid unchanged) — the
    case embedding_drift's centroid cosine is blind to."""
    import numpy as np

    from dataframeutils_spark.operators import similarity

    rng = np.random.default_rng(3)
    dim = 8

    def mk(scale, n, label):
        return [
            (i, [float(x) for x in rng.normal(0, scale, dim)], label)
            for i in range(n)
        ]

    # ref: unit variance; cur: same mean (0), tripled variance
    old = spark.createDataFrame(
        mk(1.0, 300, 1), "vec_id long, embedding array<float>, label int"
    )
    new_same = spark.createDataFrame(
        mk(1.0, 300, 1), "vec_id long, embedding array<float>, label int"
    )
    new_wide = spark.createDataFrame(
        mk(3.0, 300, 1), "vec_id long, embedding array<float>, label int"
    )
    base = similarity.mmd_drift(old, new_same, sigma=2.0).collect()[0]
    wide = similarity.mmd_drift(old, new_wide, sigma=2.0).collect()[0]
    assert wide["mmd2"] > 10 * max(base["mmd2"], 1e-9)
    assert not base["drifted"]

"""Association rules, Benford audit and hybrid RRF vs brute force."""

from __future__ import annotations

import itertools
import math
import random
from collections import Counter

from dataframeutils_spark.operators import cleaning, graph, text


def test_association_rules_brute_force(spark):
    rng = random.Random(5)
    catalog = list("abcdefgh")
    baskets = [
        (g, it)
        for g in range(200)
        for it in rng.sample(catalog, rng.randint(2, 4))
    ]
    # plant a strong rule: whenever 'a' appears, add 'b'
    extra = [(g, "b") for g, it in baskets if it == "a"]
    rows = list({(g, i) for g, i in baskets + extra})
    df = spark.createDataFrame(rows, "g int, p string")
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in graph.association_rules(df, "g", "p", min_pair_count=3, top_k=10000).collect()
    }

    by_basket: dict[int, set] = {}
    for g, i in rows:
        by_basket.setdefault(g, set()).add(i)
    n = len(by_basket)
    item_cnt = Counter(i for s in by_basket.values() for i in s)
    pair_cnt = Counter(
        p for s in by_basket.values() for p in itertools.combinations(sorted(s), 2)
    )
    want = {}
    for (u, v), c in pair_cnt.items():
        if c >= 3:
            for a, b in ((u, v), (v, u)):
                want[(a, b)] = (
                    c,
                    c / n,
                    c / item_cnt[a],
                    (c * n) / (item_cnt[a] * item_cnt[b]),
                )
    assert set(got) == set(want)
    for key, (c, sup, conf, lift) in want.items():
        r = got[key]
        assert r["pair_count"] == c
        assert abs(r["support"] - sup) < 1e-6
        assert abs(r["confidence"] - conf) < 1e-6
        assert abs(r["lift"] - lift) < 1e-5
    # the planted a->b rule has confidence 1.0 and lift > 1
    assert got[("a", "b")]["confidence"] == 1.0
    assert got[("a", "b")]["lift"] > 1.0


def test_benford_natural_vs_uniform(spark):
    rng = random.Random(11)
    # multi-scale (log-uniform) amounts follow Benford; uniform doesn't
    # exactly 6 decades: Benford is exact for log-uniform over an
    # integer number of decades (fractional decades bias the digits)
    natural = [(math.exp(rng.uniform(0, 6 * math.log(10))),) for _ in range(20000)]
    uniform = [(rng.uniform(100, 999),) for _ in range(20000)]
    chi_nat = (
        cleaning.benford_audit(
            spark.createDataFrame(natural, "amt double"), "amt"
        ).collect()[0]["chi2"]
    )
    chi_uni = (
        cleaning.benford_audit(
            spark.createDataFrame(uniform, "amt double"), "amt"
        ).collect()[0]["chi2"]
    )
    assert chi_nat < 30  # consistent with Benford (8 dof)
    assert chi_uni > 1000  # grossly inconsistent


def test_benford_digit_extraction_exact(spark):
    rows = [(1.0,), (0.01,), (999.99,), (100.00,), (0.09,), (95000.5,)]
    out = {
        r["digit"]: r["n_obs"]
        for r in cleaning.benford_audit(
            spark.createDataFrame(rows, "amt double"), "amt"
        ).collect()
    }
    assert out == {1: 3, 9: 3}  # 1.0, 0.01, 100.00 -> 1; 999.99, 0.09, 95000.5 -> 9
    # shares are integer ratios
    full = cleaning.benford_audit(
        spark.createDataFrame(rows, "amt double"), "amt"
    ).collect()
    assert all(abs(r["obs_share"] - 0.5) < 1e-9 for r in full)


def test_hybrid_rrf_brute_force(spark):
    docs = [
        (1, "fast join scan on the cluster"),
        (2, "slow scan with a broken join"),
        (3, "the quick brown fox"),
        (4, "join join join scan slow slow"),
        (5, "completely unrelated text here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = text.hybrid_search_rrf(
        df, query_terms=("join", "scan", "slow"), query_string="join scan slow", k=5
    ).collect()
    got = {r["doc_id"]: r for r in out}

    b = {r["doc_id"]: r["rank"] for r in text.bm25_search(df, ("join", "scan", "slow"), k=50).collect()}
    c = {r["doc_id"]: r["rank"] for r in text.chargram_search(df, "join scan slow", k=50).collect()}
    for d in set(b) | set(c):
        want = (1.0 / (60 + b[d]) if d in b else 0.0) + (
            1.0 / (60 + c[d]) if d in c else 0.0
        )
        assert abs(got[d]["rrf_score"] - want) < 1e-9
        assert got[d]["bm25_rank"] == b.get(d)
        assert got[d]["chargram_rank"] == c.get(d)
    # doc 4 is the strongest on both arms -> fused winner
    best = max(out, key=lambda r: r["rrf_score"])
    assert best["doc_id"] == 4
    # the irrelevant doc never surfaces
    assert 5 not in got or got[5]["rrf_score"] < best["rrf_score"] / 2


def test_chargram_search_typo_robust(spark):
    docs = [
        (1, "database connection pooling"),
        (2, "connectoin poolin for databases"),  # typo'd twin
        (3, "unrelated gardening tips"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = text.chargram_search(df, "database connection pooling", k=3).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert ranks[1] == 1  # exact phrasing wins
    assert ranks.get(2) == 2  # typo'd twin still retrieved second


# ---------------------------------------------------------------------------
# concentration (Gini) and jackknife CI
# ---------------------------------------------------------------------------


def _gini_ref(xs):
    xs = sorted(xs)
    n = len(xs)
    tot = sum(xs)
    return 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (n + 1) / n


def test_concentration_vs_reference(spark):
    from dataframeutils_spark.operators import skew

    rng = random.Random(31)
    rows = []
    vals = {}
    for g, shape in (("equal", "flat"), ("skewed", "pareto")):
        xs = []
        for e in range(80):
            amt = 100.0 if shape == "flat" else 100.0 / (e + 1)
            # several orders per entity; flat group gets a FIXED order
            # count so entity totals are exactly equal (gini == 0)
            n_orders = 2 if shape == "flat" else rng.randint(1, 3)
            for k in range(n_orders):
                part = amt / n_orders
                rows.append((g, e, part))
                xs.append(part)
        vals[g] = {}
        for gg, e, a in rows:
            if gg == g:
                vals[g][e] = vals[g].get(e, 0.0) + a
    df = spark.createDataFrame(rows, "grp string, ent int, amt double")
    got = {
        r["grp"]: r
        for r in skew.concentration_report(df, "grp", "ent", "amt").collect()
    }
    for g in ("equal", "skewed"):
        totals = list(vals[g].values())
        assert got[g]["n_entities"] == 80
        assert abs(got[g]["gini"] - _gini_ref(totals)) < 1e-6
        top = sorted(totals)[-8:]  # ceil(0.1 * 80)
        assert got[g]["top_n"] == 8
        assert abs(got[g]["top_share"] - sum(top) / sum(totals)) < 1e-6
    assert got["equal"]["gini"] < 0.2 < 0.5 < got["skewed"]["gini"]


def test_jackknife_ci_vs_reference(spark):
    import hashlib

    import numpy as np

    from dataframeutils_spark.operators import features

    rng = np.random.default_rng(41)
    n = 4000
    vals = rng.normal(10.0, 3.0, n)
    rows = [(int(i), "g", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, grp string, value double")
    row = features.jackknife_ci(df, "grp", "value", "event_id", n_blocks=50).collect()[0]

    blocks = np.array(
        [int(hashlib.md5(f"jk:{i}".encode()).hexdigest()[:15], 16) % 50 for i in range(n)]
    )
    S, N = vals.sum(), n
    thetas = np.array(
        [(S - vals[blocks == k].sum()) / (N - (blocks == k).sum()) for k in range(50)]
    )
    k = 50
    var_j = (k - 1) / k * ((thetas**2).sum() - k * thetas.mean() ** 2)
    se = np.sqrt(max(0.0, var_j))
    assert row["n"] == n
    np.testing.assert_allclose(row["mean"], vals.mean(), rtol=1e-6)
    np.testing.assert_allclose(row["se_jack"], se, atol=2e-6)
    # jackknife SE of the mean ~ sigma/sqrt(n)
    assert 0.5 * 3 / np.sqrt(n) < row["se_jack"] < 2.0 * 3 / np.sqrt(n)
    assert row["ci_lo"] < 10.0 < row["ci_hi"]


# ---------------------------------------------------------------------------
# degenerate-input guards (ANSI divide-by-zero review findings)
# ---------------------------------------------------------------------------


def test_benford_subcent_amounts_excluded(spark):
    from dataframeutils_spark.operators import cleaning

    # 0.004 rounds to integer cents 0 -> "first digit 0" must be
    # excluded, not crash log(1 + 1/0) under ANSI
    rows = [(0.004,), (0.0001,), (1.25,)]
    out = cleaning.benford_audit(
        spark.createDataFrame(rows, "amt double"), "amt"
    ).collect()
    assert len(out) == 1 and out[0]["digit"] == 1 and out[0]["n_obs"] == 1


def test_jackknife_null_values_excluded(spark):
    from dataframeutils_spark.operators import features

    rows = [(i, "g", 10.0) for i in range(100)] + [
        (i + 100, "g", None) for i in range(20)
    ]
    row = features.jackknife_ci(
        spark.createDataFrame(rows, "event_id long, grp string, value double"),
        "grp", "value", "event_id",
    ).collect()[0]
    # NULLs must not inflate the denominator: mean is exactly 10
    assert row["n"] == 100 and row["mean"] == 10.0


def test_embedding_auc_zero_norm_filtered(spark):
    from dataframeutils_spark.operators import similarity

    rows = [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [0.0, 1.0], 1),
            (4, [0.1, 0.9], 1), (5, [0.0, 0.0], 0)]  # zero vector
    out = similarity.embedding_auc(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    ).collect()
    # no crash; the zero vector is excluded from every class's ranking
    assert {r["class"] for r in out} == {0, 1}
    for r in out:
        assert r["n_pos"] + r["n_neg"] == 4


def test_chi2_single_category_nulls_not_crash(spark):
    import datetime as dt

    from dataframeutils_spark.operators import events as events_ops

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(days=i % 14), i, "only") for i in range(50)]
    out = events_ops.chi2_independence(
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
    ).collect()
    # r == 1: chi2 == 0, dof == 0, V is NULL (0/0), p NULL (dof != 24)
    assert all(r["dof"] == 0 for r in out)
    assert all(r["cramers_v"] is None for r in out)
    assert all(r["p_value"] is None for r in out)


def test_panel_ols_tiny_group_dropped(spark):
    import pandas as pd

    from dataframeutils_spark.operators import trend

    pdf = pd.DataFrame(
        {"grp": "A", "feature_1": [1.0, 2.0, 4.0], "feature_2": [3.0, 1.0, 2.0],
         "feature_3": [2.0, 5.0, 9.0]}
    )
    # n == 3 -> sigma2 would divide by zero; the group must be dropped
    assert trend.panel_ols(spark.createDataFrame(pdf)).count() == 0


def test_seasonal_decompose_constant_series_survives(spark):
    import datetime as dt

    import numpy as np

    from dataframeutils_spark.operators import trend

    rows = [
        ("g", "f", dt.date(1995, 1, 1) + dt.timedelta(days=i), 5.0)
        for i in range(60)
    ]
    out = spark.createDataFrame(
        rows, "grp string, feature string, date date, value double"
    )
    res = trend.seasonal_decompose(out).collect()
    # flat series: no crash; strengths degrade to 0.0 (greatest(0, NULL))
    assert len(res) == 7
    assert all(r["seasonal_strength"] == 0.0 and r["trend_strength"] == 0.0 for r in res)

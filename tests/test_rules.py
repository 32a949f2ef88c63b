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

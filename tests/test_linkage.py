"""Record linkage, triangle counting and l-diversity vs brute force."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.operators import cleaning, graph, linkage


def _lev(a: str, b: str) -> int:
    # textbook DP, the independent oracle
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


# ---------------------------------------------------------------------------
# deletion-neighborhood fuzzy matching
# ---------------------------------------------------------------------------


def test_fuzzy_match_completeness_random_edits(spark):
    """Every string within edit distance 1 of an original is found —
    the FastSS blocking completeness proof, exercised empirically over
    random deletes/substitutes/inserts."""
    rng = random.Random(42)
    alphabet = "abcdefghij"
    originals = ["".join(rng.choice(alphabet) for _ in range(12)) for _ in range(40)]
    dirty = []
    for i, s in enumerate(originals):
        op = rng.choice(["del", "sub", "ins", "eq"])
        p = rng.randrange(len(s))
        if op == "del":
            t = s[:p] + s[p + 1 :]
        elif op == "sub":
            t = s[:p] + rng.choice(alphabet.upper()) + s[p + 1 :]
        elif op == "ins":
            t = s[:p] + rng.choice(alphabet.upper()) + s[p:]
        else:
            t = s
        dirty.append((i, t))

    left = spark.createDataFrame(dirty, "id int, name string")
    right = spark.createDataFrame(
        list(enumerate(originals)), "id int, name string"
    )
    got = {
        (r["left_id"], r["right_id"], r["dist"])
        for r in linkage.fuzzy_match_pairs(left, right).collect()
    }
    want = {
        (i, j, _lev(t, s))
        for (i, t), (j, s) in itertools.product(dirty, enumerate(originals))
        if _lev(t, s) <= 1
    }
    assert got == want
    # every dirty record recovered its own original
    assert all(any(l == r == i for l, r, _ in got) for i, _ in dirty)


def test_deterministic_corruption_is_single_deletion(spark):
    df = spark.createDataFrame(
        [(1, "Customer#000000001"), (2, "abcdefgh")], "k long, nm string"
    )
    out = {r["id"]: r["name"] for r in linkage.deterministic_corruption(df, "k", "nm").collect()}
    assert _lev(out[1], "Customer#000000001") == 1 and len(out[1]) == 17
    assert _lev(out[2], "abcdefgh") == 1 and len(out[2]) == 7


def test_resolve_entities_merges_shared_match(spark):
    # one dirty record matches two originals -> all three in one entity
    pairs = spark.createDataFrame(
        [(10, 1, "x", "y", 1), (10, 2, "x", "z", 1), (11, 3, "q", "r", 1)],
        "left_id int, right_id int, left_name string, right_name string, dist int",
    )
    ent = {r["node"]: r for r in linkage.resolve_entities(pairs).collect()}
    assert ent["L:10"]["entity_id"] == ent["R:1"]["entity_id"] == ent["R:2"]["entity_id"]
    assert ent["L:10"]["entity_size"] == 3
    assert ent["L:11"]["entity_size"] == 2
    canon = [n for n, r in ent.items() if r["is_canonical"]]
    assert sorted(canon) == ["L:10", "L:11"]


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------


def _brute_triangles(edge_list):
    nodes = sorted({x for e in edge_list for x in e})
    es = {frozenset(e) for e in edge_list}
    tri = {v: 0 for v in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            frozenset((a, b)) in es
            and frozenset((b, c)) in es
            and frozenset((a, c)) in es
        ):
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    deg = {v: sum(1 for e in es if v in e) for v in nodes}
    return tri, deg


def test_triangle_counts_vs_brute_force(spark):
    rng = random.Random(7)
    nodes = list(range(30))
    edge_list = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.2
    ]
    edges = spark.createDataFrame(edge_list, "u int, v int")
    got = {r["node"]: r for r in graph.triangle_counts(edges, top_k=1000).collect()}
    tri, deg = _brute_triangles(edge_list)
    want = {v: t for v, t in tri.items() if t > 0}
    assert {v: r["triangles"] for v, r in got.items()} == want
    for v, r in got.items():
        assert r["degree"] == deg[v]
        cc = 2.0 * tri[v] / (deg[v] * (deg[v] - 1))
        assert abs(r["clustering_coeff"] - cc) < 1e-6


def test_triangle_counts_k4_and_top_k(spark):
    # K4: every node sits in C(3,2)=3 triangles, clustering coeff 1.0
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    edges = spark.createDataFrame(k4 + [(4, 5)], "u int, v int")
    rows = graph.triangle_counts(edges, top_k=2).collect()
    assert len(rows) == 2  # top-k limit applied
    assert all(r["triangles"] == 3 and r["clustering_coeff"] == 1.0 for r in rows)
    assert [r["node"] for r in rows] == [0, 1]  # ties broken by node asc


def test_cooccurrence_edges_bounded_and_distinct(spark):
    items = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "b"), (1, "c"), (2, "a"), (2, "b")],
        "g int, p string",
    )
    got = {
        (r["u"], r["v"])
        for r in graph.cooccurrence_edges(items, "g", "p").collect()
    }
    # duplicates collapsed, u < v orientation
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


# ---------------------------------------------------------------------------
# l-diversity
# ---------------------------------------------------------------------------


def test_l_diversity_brute_force(spark):
    rows = [
        # class (x,1): 3 distinct users -> diverse
        ("x", 1, "u1"), ("x", 1, "u2"), ("x", 1, "u3"), ("x", 1, "u1"),
        # class (x,2): 1 distinct user, 3 rows -> at risk
        ("x", 2, "u9"), ("x", 2, "u9"), ("x", 2, "u9"),
        # class (y,1): 2 distinct -> below l=3
        ("y", 1, "u1"), ("y", 1, "u5"),
    ]
    df = spark.createDataFrame(rows, "qa string, qb int, user string")
    out = cleaning.l_diversity(df, ["qa", "qb"], "user", l=3).collect()[0]
    assert out["l"] == 3
    assert out["n_rows"] == 9
    assert out["n_classes"] == 3
    assert out["n_classes_below_l"] == 2
    assert out["n_rows_at_risk"] == 5
    assert abs(out["risk_pct"] - 5 / 9) < 1e-6
    assert out["min_diversity"] == 1 and out["max_diversity"] == 3

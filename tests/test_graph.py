"""PageRank / TextRank over native DataFrame fixpoint loops."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.operators import graph


def test_pagerank_uniform_cycle(spark):
    # a 4-cycle is perfectly symmetric → every node ends at rank 1/4
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node int")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4, 1.0) for i in range(4)], "src int, dst int, w double"
    )
    out = graph.pagerank(nodes, edges, iters=10).collect()
    assert all(abs(r["rank"] - 0.25) < 1e-12 for r in out)


def test_pagerank_sink_attracts_mass(spark):
    # star pointing at node 0 → node 0 outranks the spokes
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node int")
    edges = spark.createDataFrame(
        [(i, 0, 1.0) for i in range(1, 5)], "src int, dst int, w double"
    )
    ranks = {r["node"]: r["rank"] for r in graph.pagerank(nodes, edges, iters=5).collect()}
    assert ranks[0] > ranks[1]
    assert abs(ranks[1] - ranks[4]) < 1e-12


def test_pagerank_isolated_node_gets_base_rank(spark):
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node int")
    edges = spark.createDataFrame([(0, 1, 1.0)], "src int, dst int, w double")
    ranks = {r["node"]: r["rank"] for r in graph.pagerank(nodes, edges, iters=3, damping=0.85).collect()}
    # node 2 has no in-edges: rank = (1-d)/n exactly
    assert abs(ranks[2] - 0.15 / 3) < 1e-12


def test_textrank_hub_term_wins(spark):
    # 'hub' is adjacent to everything → highest co-occurrence centrality
    docs = spark.createDataFrame(
        [
            (1, "hub alpha hub beta hub gamma"),
            (2, "hub delta hub epsilon"),
            (3, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    out = graph.textrank_keywords(docs, k=3).collect()
    assert out[0]["term"] == "hub" and out[0]["rank"] == 1


def test_textrank_matches_duckdb_oracle(spark, ddb):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [
        (r["term"], r["rank"], r["score"])
        for r in graph.textrank_keywords(docs, k=20).orderBy("rank").collect()
    ]
    want = [
        tuple(t)
        for t in ddb.execute(
            graph.textrank_keywords_sql(k=20) + " ORDER BY rank"
        ).fetchall()
    ]
    assert got == want


def test_degree_assortativity_known_graphs(spark):
    """Closed-form checks: a star is maximally disassortative
    (r = -1 on any star with >2 leaves has r undefined denominator?
    no — star K1,3: all edges join degree 3 to degree 1, zero degree
    variance on each side per edge position mix gives r = -1); a
    cycle (all degrees equal) has zero variance -> NULL."""
    from dataframeutils_spark.operators import graph

    # 4-cycle: every degree = 2 -> denominator 0 -> NULL
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "u long, v long"
    )
    r = graph.degree_assortativity(cyc).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 4
    assert r["avg_degree"] == 2.0 and r["max_degree"] == 2
    assert r["assortativity"] is None
    # star K1,4 : hub degree 4, leaves degree 1 -> r = -1
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], "u long, v long"
    )
    r = graph.degree_assortativity(star).collect()[0]
    assert abs(r["assortativity"] - (-1.0)) < 1e-9
    # path 1-2-3-4: hand-computed r = -0.5
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "u long, v long")
    r = graph.degree_assortativity(path).collect()[0]
    assert abs(r["assortativity"] - (-0.5)) < 1e-9


def test_k_core_hand_computed(spark):
    """Planted graph: a K4 clique (every degree 3) plus a pendant
    chain. The 3-core is exactly the clique; the chain peels away."""
    from dataframeutils_spark.operators import graph

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
             (4, 5), (5, 6)]  # pendant chain
    e = spark.createDataFrame(edges, "u long, v long")
    r = graph.k_core_summary(e, k=3, rounds=5).collect()[0]
    assert r["converged"] is True
    assert r["n_nodes"] == 4 and r["n_edges"] == 6
    assert r["min_degree"] == 3 and r["max_degree"] == 3
    # k=4: nothing survives (K4 degrees are 3)
    r = graph.k_core_summary(e, k=4, rounds=5).collect()[0]
    assert r["n_nodes"] == 0 and r["converged"] is True
    assert r["min_degree"] is None


def test_k_core_cascade(spark):
    """Peeling must CASCADE: node 5's removal (degree 1 < 2) drops
    node 4 to degree 1, which then also peels — a single-pass filter
    would wrongly keep node 4."""
    from dataframeutils_spark.operators import graph

    # triangle 1-2-3, tail 3-4, 4-5
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "u long, v long"
    )
    r = graph.k_core_summary(e, k=2, rounds=5).collect()[0]
    assert r["n_nodes"] == 3 and r["n_edges"] == 3
    assert r["converged"] is True


def test_k_core_local_matches_distributed(spark):
    """The driver-local numpy peel must produce exactly the distributed
    loop's summary row — including decround(avg_degree) and the
    unconverged flag — on a random graph and on a slow-peeling path."""
    import random

    rng = random.Random(7)
    edges = list({(min(a, b), max(a, b))
                  for a, b in (sorted(rng.sample(range(60), 2))
                               for _ in range(300))})
    e = spark.createDataFrame(edges, "u long, v long")
    from dataframeutils_spark.operators import graph

    local = graph.k_core_summary(e, k=8, rounds=4).collect()[0]
    dist = graph.k_core_summary(
        e, k=8, rounds=4, local_edge_threshold=0).collect()[0]
    assert local.asDict() == dist.asDict()

    # long path with k=2 peels one node per round per end: rounds=2
    # must leave survivors below k (converged=False), identically
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "u long, v long")
    local = graph.k_core_summary(path, k=2, rounds=2).collect()[0]
    dist = graph.k_core_summary(
        path, k=2, rounds=2, local_edge_threshold=0).collect()[0]
    assert local.asDict() == dist.asDict()
    assert local["converged"] is False


def test_pagerank_local_matches_distributed(spark):
    """The driver-local numpy power iteration must reproduce the
    distributed loop's ranks — including after the siground rounding
    textrank applies — on a weighted digraph with dangling nodes,
    isolated nodes and skewed in-degree (r14; the boundary audit
    measured ≥ 8 orders of magnitude of rounding headroom, this pins
    the equality end to end)."""
    import random

    from dataframeutils_spark.schema import siground

    rng = random.Random(11)
    nodes = spark.createDataFrame([(i,) for i in range(40)], "node int")
    # skewed: node 0 receives many edges; nodes 30..39 dangling/isolated
    edges = [(rng.randrange(30), rng.randrange(12), float(rng.randint(1, 5)))
             for _ in range(150)]
    e = spark.createDataFrame(edges, "src int, dst int, w double")
    local = graph.pagerank(nodes, e, iters=5)
    dist = graph.pagerank(nodes, e, iters=5, local_edge_threshold=0)
    ls = {r["node"]: r["rank"] for r in
          local.select("node", siground(F.col("rank")).alias("rank")).collect()}
    ds = {r["node"]: r["rank"] for r in
          dist.select("node", siground(F.col("rank")).alias("rank")).collect()}
    assert ls == ds
    # string nodes (the textrank shape) keep working on the local path
    sn = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    se = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    sl = {r["node"]: r["rank"] for r in graph.pagerank(sn, se, iters=4).collect()}
    sd = {r["node"]: r["rank"] for r in
          graph.pagerank(sn, se, iters=4, local_edge_threshold=0).collect()}
    assert set(sl) == set(sd)
    for k in sl:
        assert abs(sl[k] - sd[k]) < 1e-12


def test_cooccurrence_edges_matches_naive_self_join(spark):
    """The one-exchange (repartition-on-g + dedup + checkpoint) edge
    construction must emit exactly the naive distinct-then-self-join
    edge set — including duplicate (g, u) rows collapsing and repeat
    co-occurrences across groups deduping."""
    from dataframeutils_spark.operators import graph

    rows = [
        # group 10: basket {1, 2, 3} with a duplicated (10, 2) row
        (10, 1), (10, 2), (10, 2), (10, 3),
        # group 20 repeats a pair from group 10 plus a new item
        (20, 2), (20, 3), (20, 7),
        # singleton group contributes no edge
        (30, 9),
    ]
    items = spark.createDataFrame(rows, "g long, p long")
    got = {
        (r["u"], r["v"])
        for r in graph.cooccurrence_edges(items, "g", "p").collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3), (2, 7), (3, 7)}

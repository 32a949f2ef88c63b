"""Unit tests for the retrieval-quality audit (nDCG@k / MRR@k over
the BM25 and hybrid-RRF arms vs the deterministic graded-relevance
oracle, operators/text.py)."""

from __future__ import annotations

import math

import pytest

from dataframeutils_spark.operators import text


def test_retrieval_quality_closed_form(spark):
    """Hand-checkable corpus: relevance grades and both metrics must
    equal the textbook formulas. Query = ('apple',); doc grades are
    min(4, tf) so doc 1 (tf 5 → rel 4), doc 2 (tf 2 → rel 2),
    doc 3 (tf 1 → rel 1), doc 4 (rel 0)."""
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple apple apple"),
            (2, "apple apple pear"),
            (3, "apple banana banana banana banana"),
            (4, "pear plum cherry"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["query_id"], r["arm"]): r
        for r in text.retrieval_quality(
            docs, (("q0", ("apple",), "apple"),), k=3
        ).collect()
    }
    r = out[("q0", "bm25")]
    assert r["n_relevant"] == 3
    # BM25 ranks doc1 (highest tf) first; but rank order among 2/3
    # depends on dl — whatever the order, DCG uses the arm's ranks
    # and IDCG the ideal (rel desc) order; with all 3 relevant docs
    # retrieved in ideal order, ndcg == 1.0
    ideal = [4, 2, 1]
    idcg = sum((2**g - 1) / math.log2(i + 2) for i, g in enumerate(ideal))
    assert r["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert r["mrr"] == pytest.approx(1.0)
    assert 0.0 < r["ndcg"] <= 1.0
    rr = out[("q0", "rrf")]
    assert rr["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert rr["n_relevant"] == 3


def test_retrieval_quality_no_relevant_docs_nulls(spark):
    """A query matching nothing must yield NULL ndcg/mrr (not 0, not a
    crash): dcg = NULL-sum over an empty gain set, idcg = NULL."""
    docs = spark.createDataFrame(
        [(1, "pear plum"), (2, "cherry fig")], "doc_id long, text string"
    )
    rows = text.retrieval_quality(
        docs, (("q0", ("zebra",), "zebra"),), k=3
    ).collect()
    for r in rows:
        assert r["n_relevant"] == 0
        assert r["ndcg"] is None
        assert r["mrr"] is None


def test_retrieval_quality_matches_oracle(spark, ddb):
    """Engine ≡ DuckDB oracle at sf0.001 on the registered eval set."""
    from dataframeutils_spark.driver import RETRIEVAL_EVAL_QUERIES

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        tuple(r)
        for r in text.retrieval_quality(
            docs, RETRIEVAL_EVAL_QUERIES, k=10
        ).collect()
    )
    want = sorted(
        tuple(t)
        for t in ddb.execute(
            text.retrieval_quality_sql(RETRIEVAL_EVAL_QUERIES, k=10)
        ).fetchall()
    )
    assert len(got) == len(RETRIEVAL_EVAL_QUERIES) * 2
    assert got == want

"""Embedding covariance / PCA spectrum (operators/pca.py)."""

from __future__ import annotations

import numpy as np
import pytest

from dataframeutils_spark.operators import pca


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    # anisotropic: dim 0 dominates, dims correlated in pairs
    base = rng.randn(300, 2)
    m = np.zeros((300, 6))
    m[:, 0] = base[:, 0] * 5.0
    m[:, 1] = base[:, 0] * 5.0 + rng.randn(300) * 0.1
    m[:, 2] = base[:, 1]
    m[:, 3:] = rng.randn(300, 3) * 0.01
    rows = [(i, [float(x) for x in m[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, m.astype("float32").astype("float64")


def test_covariance_matches_numpy(emb):
    df, m = emb
    got = {(r["i"], r["j"]): r["cov"] for r in pca.embedding_covariance(df).collect()}
    want = np.cov(m, rowvar=False)
    assert len(got) == 6 * 7 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(want[i, j], rel=1e-5), (i, j)


def test_pca_spectrum_matches_numpy_eigh(emb):
    df, m = emb
    out = pca.embedding_pca(df, k=6).collect()
    want = np.linalg.eigvalsh(np.cov(m, rowvar=False))[::-1]
    got = [r["eigenvalue"] for r in sorted(out, key=lambda r: r["component"])]
    assert got == sorted(got, reverse=True)
    for g, w in zip(got, want):
        assert g == pytest.approx(float(w), rel=1e-5)
    # explained ratios sum to ~1 over all D components
    ratios = [r["explained_ratio"] for r in out]
    assert abs(sum(ratios) - 1.0) < 1e-4
    # the engineered dominant pair of dims carries ~all the variance
    assert out[0]["cum_ratio"] > 0.9


def test_pca_partials_are_batch_bounded(emb, spark):
    """The moments relation has one row per Arrow batch (not per
    vector) — the scale contract."""
    df, _ = emb
    small = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    parts = pca._partial_moments(df.coalesce(1), "embedding").collect()
    assert 1 <= len(parts) <= 300 // 1 and sum(r["n"] for r in parts) == 300
    d = 6
    assert all(len(r["moments"]) == d + d * (d + 1) // 2 for r in parts)


def test_covariance_degenerate_inputs_fail_loudly(spark):
    """n < 2 would make every covariance cell NULL (divide by n-1=0);
    the operator raises instead of emitting nulls mid-plan."""
    one = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="at least 2 vectors"):
        pca.embedding_covariance(one)
    with pytest.raises(ValueError, match="at least 2 vectors"):
        pca.embedding_pca(one)


def test_pca_constant_embeddings_fail_loudly(spark):
    """An all-constant embedding column has zero covariance trace —
    explained_ratio would divide by zero; raise a clear error."""
    const = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="trace is 0"):
        pca.embedding_pca(const)


def test_blocked_covariance_equals_unblocked(emb):
    """VERDICT r8 #7: the dimension-blocked layout (for D > 2k
    embeddings) must reproduce the unblocked cells bit-for-bit after
    siground — block=2 on D=6 forces 3x3 block-pairs including ragged
    none (6 % 2 == 0) plus off-diagonal rects."""
    df, _ = emb
    un = {(r["i"], r["j"]): r["cov"] for r in pca.embedding_covariance(df).collect()}
    bl = {
        (r["i"], r["j"]): r["cov"]
        for r in pca.embedding_covariance(df, block=2).collect()
    }
    assert bl == un


def test_blocked_covariance_ragged_tail_block(spark):
    """D=5 with block=2 leaves a width-1 tail block — the slicing and
    triangle assembly must stay exact on the ragged block-pairs."""
    rng = np.random.RandomState(3)
    m = rng.randn(80, 5)
    df = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    un = {(r["i"], r["j"]): r["cov"] for r in pca.embedding_covariance(df).collect()}
    bl = {
        (r["i"], r["j"]): r["cov"]
        for r in pca.embedding_covariance(df, block=2).collect()
    }
    assert bl == un
    assert len(bl) == 5 * 6 // 2


def test_blocked_pca_equals_unblocked(emb):
    df, _ = emb
    un = pca.embedding_pca(df, k=6).collect()
    bl = pca.embedding_pca(df, k=6, block=2).collect()
    key = lambda rows: [
        (r["component"], r["eigenvalue"], r["explained_ratio"], r["cum_ratio"])
        for r in sorted(rows, key=lambda r: r["component"])
    ]
    assert key(bl) == key(un)

"""Embedding covariance / PCA — the whitening and dimensionality
analysis an embedding-centric pipeline (SemDeDup clustering, IVF
routing, dedup thresholds) runs before trusting cosine distances.

No counterpart in the reference (SURVEY §2.3) — north-star embedding
tier next to the per-dimension moment stats (N36).

Scale design (100 TB): the only pass over the vectors is an Arrow
``mapInPandas`` that emits ONE partial row per batch — (n, Σx, ΣxxT
flattened) — so the exchange carries ``n_batches × (D + D²)`` doubles,
never vectors. The D×D covariance itself is a bounded object (D=64 →
4,096 cells ≈ 32 KB): reducing it on the driver and eigendecomposing
with numpy is the same bounded-small-side pattern as the k-means
centroid table, NOT a driver-side loop over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataframeutils_spark.schema import siground, siground_sql


def _partial_moments(emb: DataFrame, vec_col: str) -> DataFrame:
    """One row per Arrow batch: (n, concat(Σx, flatten(ΣxxT))),
    accumulated in float64."""

    def part(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            s = m.sum(axis=0)
            o = (m.T @ m).ravel()
            yield pd.DataFrame(
                {"n": [len(m)], "moments": [np.concatenate([s, o])]}
            )

    return emb.select(vec_col).mapInPandas(part, "n long, moments array<double>")


def embedding_covariance(
    emb: DataFrame, vec_col: str = "embedding", upper_only: bool = True
) -> DataFrame:
    """Sample covariance matrix of the embedding column as (i, j, cov)
    rows, i ≤ j — exactly oracle-checkable, and the bounded input to
    :func:`embedding_pca`.

    cov(i,j) = (Σ x_i·x_j − Σx_i·Σx_j / n) / (n−1), accumulated in
    float64 on both engines; the batch-partial summation-order residue
    is absorbed by the siground contract. D is recovered from the cell
    count (|cells| = D + D²), so the operator is dimension-agnostic
    with zero driver round-trips.
    """
    # n < 2 makes every covariance cell NULL (division by n-1 = 0);
    # fail loudly instead. limit(2) keeps the probe a single-partition
    # peek, not a count of the table.
    if emb.limit(2).count() < 2:
        raise ValueError(
            "embedding_covariance needs at least 2 vectors to form a "
            "sample covariance"
        )
    parts = _partial_moments(emb, vec_col)
    # bounded reduce: the exchange carries ≤ n_batches × (D + D²) cells
    cells = (
        parts.select(F.posexplode("moments").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
    )
    n_row = parts.agg(F.sum("n").alias("n_total"))
    dim = cells.agg(
        ((F.sqrt(F.lit(1.0) + F.lit(4.0) * F.count("*")) - F.lit(1.0)) / F.lit(2.0))
        .cast("int")
        .alias("d")
    )
    with_d = cells.crossJoin(F.broadcast(dim))
    means = with_d.filter(F.col("pos") < F.col("d")).select(
        F.col("pos").cast("int").alias("i"), F.col("s").alias("s_i")
    )
    outer = with_d.filter(F.col("pos") >= F.col("d")).select(
        ((F.col("pos") - F.col("d")) / F.col("d")).cast("int").alias("i"),
        ((F.col("pos") - F.col("d")) % F.col("d")).cast("int").alias("j"),
        F.col("s").alias("xx"),
    )
    j_means = means.select(F.col("i").alias("j"), F.col("s_i").alias("s_j"))
    out = (
        outer.join(F.broadcast(means), "i")
        .join(F.broadcast(j_means), "j")
        .crossJoin(F.broadcast(n_row))
        .select(
            "i",
            "j",
            siground(
                (F.col("xx") - F.col("s_i") * F.col("s_j") / F.col("n_total"))
                / (F.col("n_total") - F.lit(1))
            ).alias("cov"),
        )
    )
    if upper_only:
        out = out.filter(F.col("i") <= F.col("j"))
    return out


def embedding_covariance_sql(
    table: str = "embeddings", vec_col: str = "embedding"
) -> str:
    """DuckDB oracle: explode positions, per-vector self-join — exact
    at oracle scale (N·D² product rows), which is precisely why the
    engine side uses batch partials instead."""
    cov = siground_sql("(sxy - si.s * sj.s / agg.n) / (agg.n - 1.0)")
    return f"""
WITH pos AS (
  SELECT vec_id, i, CAST(v[i] AS DOUBLE) AS val
  FROM (SELECT vec_id, {vec_col} AS v FROM {table}),
       LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) t
), agg AS (
  SELECT a.i AS i, b.i AS j, sum(a.val * b.val) AS sxy, count(*) AS n
  FROM pos a JOIN pos b USING (vec_id)
  WHERE a.i <= b.i GROUP BY a.i, b.i
), stats AS (
  SELECT i, sum(val) AS s FROM pos GROUP BY i
)
SELECT CAST(agg.i - 1 AS INT) AS i, CAST(agg.j - 1 AS INT) AS j, {cov} AS cov
FROM agg JOIN stats si ON agg.i = si.i JOIN stats sj ON agg.j = sj.i
"""


def embedding_pca(
    emb: DataFrame, vec_col: str = "embedding", k: int = 8
) -> DataFrame:
    """Top-k PCA spectrum of the embedding column: (component,
    eigenvalue, explained_ratio, cum_ratio) — eigenvalues are
    sign-unambiguous (unlike eigenvectors), so the output is
    deterministic. Not SQL-expressible (eigendecomposition) → rows-only
    driver check; pinned against a direct numpy covariance+eigh in
    pytest.

    The spectrum answers the pipeline questions: how many effective
    dimensions the embeddings use (whitening depth for SemDeDup /
    IVF), and whether the space has collapsed (one dominant ratio).
    The collect is the bounded batch-partial table (n_batches ×
    (D + D²) doubles), the same class as the k-means centroid pull —
    data never reaches the driver.
    """
    import numpy as np

    parts = _partial_moments(emb, vec_col)
    rows = parts.collect()  # bounded: one row per Arrow batch
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError(
            f"embedding_pca needs at least 2 vectors to form a sample "
            f"covariance (got n={n})"
        )
    acc = np.sum([np.asarray(r["moments"]) for r in rows], axis=0)
    d = int(round((-1 + (1 + 4 * len(acc)) ** 0.5) / 2))
    s, o = acc[:d], acc[d:].reshape(d, d)
    cov = (o - np.outer(s, s) / n) / (n - 1)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(evals.sum())
    if total <= 0.0:
        raise ValueError(
            "embedding_pca: covariance trace is 0 — the embedding column "
            "is constant (no variance to decompose)"
        )
    data, cum = [], 0.0
    for c in range(min(k, d)):
        ev = float(evals[c])
        cum += ev / total
        data.append((c, ev, ev / total, cum))
    out = emb.sparkSession.createDataFrame(
        data,
        "component int, eigenvalue double, explained_ratio double, cum_ratio double",
    )
    return out.select(
        "component",
        siground(F.col("eigenvalue")).alias("eigenvalue"),
        siground(F.col("explained_ratio")).alias("explained_ratio"),
        siground(F.col("cum_ratio")).alias("cum_ratio"),
    )

"""Deterministic sampling / dataset-split operators.

No counterpart in the reference (SURVEY §2.3) — north-star pipeline
surface: a training-data pipeline needs reproducible train/val/test
assignment and reproducible downsampling that (a) never depends on row
order or partitioning, (b) is stable across reruns and engines, and
(c) assigns a document the same way no matter which shard it arrives
in. Random samplers (``df.sample``/``rand()``) violate all three;
hash-bucket assignment on the stable key is the standard answer.

Scale notes: pure scan-side projection — zero shuffle for assignment
itself, one map-side-combinable groupBy for the summary. The portable
md5 hash keeps the operator exactly oracle-checkable; ``xxhash64`` is
the production hash at 100 TB (same plan shape, rows-only check), as
in :mod:`dataframeutils_spark.operators.dedup`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataframeutils_spark.operators.dedup import (
    fast_hash64,
    portable_hash60,
    portable_hash60_sql,
)

SPLIT_BUCKETS = 100


def _bucket(id_col: Column, salt: str, portable: bool) -> Column:
    salted = F.concat(F.lit(salt + ":"), id_col.cast("string"))
    if portable:
        return portable_hash60(salted) % SPLIT_BUCKETS
    return F.pmod(fast_hash64(salted), F.lit(SPLIT_BUCKETS))


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
    portable: bool = True,
) -> DataFrame:
    """Input plus a deterministic ``split`` column ('train'/'val'/'test').

    bucket = hash(salt:id) mod 100; train = [0, train_pct), val =
    [train_pct, train_pct+val_pct), test = the rest. Changing ``salt``
    re-rolls the assignment; growing the corpus never reassigns an
    existing id (the property random splits lack).
    """
    b = _bucket(F.col(id_col), salt, portable)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.withColumn("split", split)


def split_summary(
    docs: DataFrame,
    id_col: str = "doc_id",
    strat_col: str = "lang",
    size_col: str = "n_chars",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
    portable: bool = True,
) -> DataFrame:
    """Stratification audit of the split: per (split, stratum) —
    (split, lang, n_docs, sum_chars, min_doc_id, max_doc_id).

    The check a pipeline runs before training: are the strata (language,
    source, …) represented proportionally in every split? Integer-exact
    output — hash-identical across engines with no float rounding.
    """
    return (
        split_assign(docs, id_col, train_pct, val_pct, salt, portable)
        .groupBy("split", F.col(strat_col).alias("stratum"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(size_col)).alias("sum_chars"),
            F.min(F.col(id_col)).alias("min_doc_id"),
            F.max(F.col(id_col)).alias("max_doc_id"),
        )
    )


def hash_sample(
    df: DataFrame,
    rate_pct: int,
    id_col: str = "doc_id",
    salt: str = "sample",
    portable: bool = True,
) -> DataFrame:
    """Deterministic ``rate_pct``-percent downsample: keep rows whose
    hash bucket < rate_pct. Samples are NESTED across rates (the 5 %
    sample is a subset of the 10 % sample — hash_sample(5) ⊆
    hash_sample(10) for equal salt), which makes scaling-law runs
    comparable; a fresh ``salt`` draws an independent sample."""
    return df.filter(_bucket(F.col(id_col), salt, portable) < rate_pct)


def hash_sample_summary(
    df: DataFrame,
    rates: tuple[int, ...] = (5, 10, 20),
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    salt: str = "sample",
    portable: bool = True,
) -> DataFrame:
    """Audit of :func:`hash_sample` across ``rates``: per rate —
    (rate_pct, n_rows, sum_chars, nested_violations).

    ``nested_violations`` counts rows present in the ``rate`` sample but
    absent from the next-larger one — 0 by construction (bucket < r ⇒
    bucket < r'), which is exactly what the audit proves: the 5 % sample
    IS a subset of the 10 %, so scaling-law runs are comparable.

    One scan, one map-side-combinable groupBy over len(rates) × rows
    exploded pairs — no joins, no window, scale-free.
    """
    rates = tuple(sorted(rates))
    nxt = dict(zip(rates, rates[1:]))
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("rate_pct"),
                F.lit(nxt.get(r, -1)).cast("long").alias("next_pct"),
            )
            for r in rates
        ]
    )
    b = _bucket(F.col(id_col), salt, portable)
    exploded = (
        df.select(b.alias("bucket"), F.col(size_col).alias("sz"))
        .select("bucket", "sz", F.explode(pairs).alias("rp"))
        .select("bucket", "sz", F.col("rp.rate_pct").alias("rate_pct"), F.col("rp.next_pct").alias("next_pct"))
        .filter(F.col("bucket") < F.col("rate_pct"))
    )
    in_sample_but_not_next = (F.col("next_pct") >= 0) & (
        F.col("bucket") >= F.col("next_pct")
    )
    return exploded.groupBy("rate_pct").agg(
        F.count("*").alias("n_rows"),
        F.sum("sz").alias("sum_chars"),
        F.sum(in_sample_but_not_next.cast("long")).alias("nested_violations"),
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, int],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    default_pct: int = 100,
    salt: str = "mix",
    portable: bool = True,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the data-MIXTURE op: keep
    ``rates[stratum]`` percent of each stratum (default ``default_pct``
    for unlisted strata). Rebalancing overrepresented languages/sources
    before training is the canonical use.

    Same hash-bucket machinery as :func:`hash_sample`, so all its
    properties carry over: order/partitioning-independent, stable across
    reruns and engines, nested across rates per stratum, and growing the
    corpus never reassigns an existing id. Scan-side filter — zero
    shuffle.
    """
    m = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    pct = F.coalesce(m[F.col(strat_col)], F.lit(default_pct))
    return df.filter(_bucket(F.col(id_col), salt, portable) < pct)


def stratified_sample_summary(
    df: DataFrame,
    rates: dict[str, int],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    default_pct: int = 100,
    salt: str = "mix",
    portable: bool = True,
) -> DataFrame:
    """Mixture audit: per stratum — (stratum, rate_pct, n_total, n_kept,
    kept_chars). Integer-exact; one map-side-combinable groupBy."""
    m = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    pct = F.coalesce(m[F.col(strat_col)], F.lit(default_pct))
    kept = _bucket(F.col(id_col), salt, portable) < pct
    return df.groupBy(F.col(strat_col).alias("stratum")).agg(
        F.max(pct).cast("long").alias("rate_pct"),
        F.count("*").alias("n_total"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.when(kept, F.col(size_col)).otherwise(F.lit(0))).alias("kept_chars"),
    )


def stratified_sample_summary_sql(
    rates: dict[str, int],
    table: str = "documents",
    strat_col: str = "lang",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    default_pct: int = 100,
    salt: str = "mix",
) -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in rates.items())
    pct = f"(CASE {strat_col} {whens} ELSE {default_pct} END)"
    b = _bucket_sql(id_col, salt)
    return f"""
SELECT {strat_col} AS stratum,
       CAST(max({pct}) AS BIGINT) AS rate_pct,
       count(*) AS n_total,
       CAST(sum(CASE WHEN {b} < {pct} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN {b} < {pct} THEN {size_col} ELSE 0 END) AS BIGINT) AS kept_chars
FROM {table}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# DuckDB oracle SQL builders (portable hash only)
# ---------------------------------------------------------------------------


def _bucket_sql(id_expr: str, salt: str) -> str:
    salted = f"('{salt}:' || {id_expr}::VARCHAR)"
    return f"{portable_hash60_sql(salted)} % {SPLIT_BUCKETS}"


def split_summary_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    strat_col: str = "lang",
    size_col: str = "n_chars",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> str:
    b = _bucket_sql(id_col, salt)
    return f"""
SELECT CASE WHEN {b} < {train_pct} THEN 'train'
            WHEN {b} < {train_pct + val_pct} THEN 'val'
            ELSE 'test' END AS split,
       {strat_col} AS stratum,
       count(*) AS n_docs,
       CAST(sum({size_col}) AS BIGINT) AS sum_chars,
       min({id_col}) AS min_doc_id,
       max({id_col}) AS max_doc_id
FROM {table}
GROUP BY 1, 2
"""


def hash_sample_summary_sql(
    rates: tuple[int, ...] = (5, 10, 20),
    table: str = "documents",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    salt: str = "sample",
) -> str:
    rates = tuple(sorted(rates))
    nxt = dict(zip(rates, rates[1:]))
    values = ", ".join(f"({r}, {nxt.get(r, -1)})" for r in rates)
    b = _bucket_sql(id_col, salt)
    return f"""
WITH b AS (
  SELECT {b} AS bucket, {size_col} AS sz FROM {table}
)
SELECT CAST(r.rate_pct AS BIGINT) AS rate_pct,
       count(*) AS n_rows,
       CAST(sum(b.sz) AS BIGINT) AS sum_chars,
       CAST(sum(CASE WHEN r.next_pct >= 0 AND b.bucket >= r.next_pct
                     THEN 1 ELSE 0 END) AS BIGINT) AS nested_violations
FROM b, (VALUES {values}) r(rate_pct, next_pct)
WHERE b.bucket < r.rate_pct
GROUP BY 1
"""

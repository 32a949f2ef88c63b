"""Deduplication operators for large-scale training-data pipelines.

No counterpart in the reference (SURVEY §2.3) — these are the
BASELINE.json north-star operators, built Spark-native:

* :func:`exact_dedup` — hash-groupBy on md5(text).
* :func:`shingles` / :func:`minhash_signatures` /
  :func:`lsh_candidate_pairs` — classic MinHash+LSH
  (shingle → k permuted hashes → min → band → bucket join).
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard verification over
  min-shingle-blocked candidates (LSH with k=1 identity permutation).
* :func:`simhash` — 60-bit SimHash from token hashes via conditional
  bit sums (fully native, no UDF).
* :func:`embedding_dup_pairs` — cosine near-duplicate pairs over an
  ``array<float>`` embedding column.

Hashing: the default ``portable`` scheme derives 60-bit integers from
md5 hex substrings — computable identically in Spark and DuckDB, which
is what makes even the MinHash/LSH pipeline fully oracle-checkable.
``xxhash64`` is the production path at 100 TB (one JVM intrinsic
instead of md5+substring+base-conversion per shingle); both flow
through the same plan shapes.

Scale notes: every stage is explode → hash → groupBy — linear in
corpus size, shuffling only (doc_id | shingle | band) keys. Candidate
verification joins only LSH-blocked pairs, never the full cross
product. Skewed shingles (stopword n-grams) are the classic hot-key
hazard: distinct-per-doc dedup happens before the shingle shuffle, and
AQE skew-join handles the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# hashing schemes
# ---------------------------------------------------------------------------


def portable_hash60(col: Column) -> Column:
    """60-bit integer hash = first 15 hex chars of md5 — bit-identical
    in Spark (conv) and DuckDB (hex-literal cast)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def fast_hash64(col: Column) -> Column:
    """Production hash: xxhash64 JVM intrinsic (no DuckDB equivalent —
    queries built on it get rows-only driver checks)."""
    return F.xxhash64(col)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts: (text_hash, n_docs, keep_doc_id).

    ``keep_doc_id`` = min id per hash group — the canonical survivor a
    dedup pipeline would retain. One shuffle on the 32-hex-char hash,
    never on the text payload itself (at 100 TB the md5 is computed
    scan-side and only 32 bytes/row shuffle).
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("id"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keep_doc_id"))
    )


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).

    Tokenization: split on whitespace runs. Distinctness before any
    shuffle keeps hot shingles from multiplying.
    """
    toks = F.split(F.col(text_col), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0) - 1))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingle_df: DataFrame, num_perm: int = 16, portable: bool = True
) -> DataFrame:
    """MinHash signature in long layout: (doc_id, perm, min_hash).

    Permutation i hashes ``"<i>:<shingle>"`` — k independent hash
    functions from one base hash. One explode (×num_perm) + one
    groupBy(doc_id, perm) min — a single shuffle keyed on doc_id.
    """
    perms = F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm")
    hashed = shingle_df.select("doc_id", "shingle", perms)
    salted = F.concat(F.col("perm").cast("string"), F.lit(":"), F.col("shingle"))
    h = portable_hash60(salted) if portable else fast_hash64(salted)
    return (
        hashed.select("doc_id", "perm", h.alias("h"))
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("min_hash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, num_perm: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature and emit candidate pairs sharing any band.

    (doc_a, doc_b) with doc_a < doc_b, distinct. Probability theory of
    MinHash-LSH: with r = num_perm/bands rows per band, a pair with
    Jaccard j collides on ≥1 band with prob 1-(1-j^r)^bands.
    """
    rows_per_band = num_perm // bands
    banded = signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
    band_hash = (
        banded.groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("_", F.sort_array(F.collect_list("min_hash")))).alias("bh"))
    )
    a = band_hash.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    b = band_hash.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    return (
        a.join(b, on=["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    shingle_df: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs:
    (doc_a, doc_b, n_inter, n_union, jaccard).

    Without an explicit candidate set, blocks on the lexicographic
    *minimum shingle* per doc (MinHash with the identity permutation,
    k=1) — a deterministic, engine-portable blocker.
    """
    counts = shingle_df.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if candidates is None:
        min_sh = shingle_df.groupBy("doc_id").agg(F.min("shingle").alias("msh"))
        a = min_sh.select(F.col("doc_id").alias("doc_a"), "msh")
        b = min_sh.select(F.col("doc_id").alias("doc_b"), "msh")
        candidates = (
            a.join(b, "msh").filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
        )
    sa = shingle_df.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    sb = shingle_df.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("sh_b"))
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == sb.doc_b) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash (fully native — no UDF)
# ---------------------------------------------------------------------------


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60
) -> DataFrame:
    """60-bit SimHash per doc: (doc_id, simhash).

    Token multiset → per-token 60-bit hash → for every bit position,
    sum(+1 if set else −1) weighted by token count → sign vector →
    integer. Entirely conditional aggregation: one explode + one
    groupBy, no Python.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    counted = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("w"))
    hashed = counted.select("doc_id", "w", portable_hash60(F.col("tok")).alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = hashed.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else (sim + term)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(sim_df: DataFrame, max_hamming: int = 3, bands: int = 4, bits: int = 60) -> DataFrame:
    """Hamming-distance ≤ max_hamming pairs via band blocking: split the
    hash into ``bands`` segments; any pair within distance
    ``bands - 1`` shares at least one exact segment (pigeonhole).
    Output (doc_a, doc_b, hamming)."""
    seg = bits // bands
    mask = (1 << seg) - 1
    segs = sim_df.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("simhash"), i * seg).bitwiseAND(F.lit(mask)).alias("seg"),
                )
                for i in range(bands)
            ])
        ).alias("bs"),
    ).select("doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.seg").alias("seg"))
    a = segs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "band", "seg")
    b = segs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "band", "seg")
    pairs = (
        a.join(b, ["band", "seg"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding near-duplicates
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold: (vec_a, vec_b, cos_sim).

    Brute-force formulation (the correctness baseline): normalize once,
    self-join, fold the dot product with ``zip_with``+``aggregate`` —
    JVM-side higher-order functions, no Python. For 100 TB use the
    LSH-bucketed variant in
    :mod:`dataframeutils_spark.operators.similarity` — this one is
    O(n²) by design for exactness at oracle scale.
    """
    norm = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    e = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), norm.alias("nrm")
    ).filter(F.col("nrm") > 0)
    a = e.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", (dot / (F.col("na") * F.col("nb"))).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )

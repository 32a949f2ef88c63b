"""North-star operators (dedup / similarity / text): semantic unit tests
on tiny in-memory frames plus driver-style oracle checks at sf0.001."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.operators import dedup, similarity, text
from tests.conftest import SF_DIR, assert_matches_oracle


# ---------------------------------------------------------------------------
# semantic unit tests
# ---------------------------------------------------------------------------


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_identical_texts(spark):
    df = docs_df(spark, [(1, "a b c"), (2, "a b c"), (3, "different text")])
    out = {r["keep_doc_id"]: r["n_docs"] for r in dedup.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_shingles_short_doc_contributes_nothing(spark):
    df = docs_df(spark, [(1, "only two"), (2, "one two three four")])
    got = dedup.shingles(df, n=3).collect()
    assert {r["doc_id"] for r in got} == {2}
    assert {r["shingle"] for r in got} == {"one two three", "two three four"}


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely unrelated words about spark engines and parquet columnar files"
    df = docs_df(spark, [(1, base), (2, near), (3, far)])
    sigs = dedup.minhash_signatures(dedup.shingles(df), num_perm=16)
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_exact_value(spark):
    # doc1: shingles {a b c, b c d}; doc2: {a b c}; same min shingle →
    # blocked together; jaccard = 1/2
    df = docs_df(spark, [(1, "a b c d"), (2, "a b c")])
    got = dedup.ngram_jaccard_pairs(dedup.shingles(df)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"], r["n_inter"], r["n_union"]) == (1, 2, 1, 2)
    assert abs(r["jaccard"] - 0.5) < 1e-12


def test_simhash_identical_and_disjoint(spark):
    df = docs_df(spark, [(1, "x y z"), (2, "x y z"), (3, "p q r s t u v w")])
    sims = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    assert sims[1] == sims[2]
    assert sims[1] != sims[3]
    near = dedup.simhash_near_pairs(dedup.simhash(df), max_hamming=0)
    assert [(r["doc_a"], r["doc_b"]) for r in near.collect()] == [(1, 2)]


def test_simhash_matches_column_built_reference(spark):
    """r14 rewrote simhash's 60 bit-sum aggregates and the 60-term bit
    recombination from Column-builder loops to parsed F.expr strings
    (plan-construction cost, guide §fixed-tail). This pins the rewrite
    against the pre-r14 Column construction kept verbatim below: the
    analyzed plans must be semantically identical and the values equal
    on mixed-weight docs."""
    from pyspark.sql import functions as F

    from dataframeutils_spark.operators.dedup import portable_hash60

    df = docs_df(
        spark,
        [
            (1, "alpha beta gamma alpha alpha"),
            (2, "alpha beta gamma"),
            (3, "zeta eta theta iota kappa"),
            (4, ""),
        ],
    )
    bits = 60
    par = spark.sparkContext.defaultParallelism
    toks = df.repartition(par, F.col("doc_id")).select(
        F.col("doc_id"),
        F.explode(F.split(F.col("text"), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    counted = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("w"))
    hashed = counted.select(
        "doc_id", "w", portable_hash60(F.col("tok")).alias("h")
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                F.col("w"),
            ).otherwise(-F.col("w"))
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = hashed.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(bits):
        term = (
            F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        sim = term if sim is None else (sim + term)
    ref = agg.select("doc_id", sim.alias("simhash"))
    new = dedup.simhash(df)
    assert (
        new._jdf.queryExecution().analyzed()
        .sameResult(ref._jdf.queryExecution().analyzed())
    )
    assert new.exceptAll(ref).count() == 0
    assert ref.exceptAll(new).count() == 0


def test_embedding_dup_pairs_cosine(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = dedup.embedding_dup_pairs(df, threshold=0.99)
    rows = got.collect()
    assert [(r["vec_a"], r["vec_b"]) for r in rows] == [(1, 2)]
    assert abs(rows[0]["cos_sim"] - 1.0) < 1e-12


def test_brute_force_topk_orders_by_cosine(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = similarity.brute_force_topk(df, k=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    assert sorted(by_q[1]) == [(1, 2), (2, 3)]
    assert sorted(by_q[3])[0] == (1, 2)


def test_ann_recalls_exact_duplicate_bucket(spark):
    # identical vectors share every hyperplane sign → same buckets
    rows = [(i, [float(i % 7 + 1), float((i * 3) % 5 + 1), 1.0]) for i in range(9)]
    rows.append((9, rows[0][1]))  # vec 9 duplicates vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.ann_topk(df, k=3, bits=8, bands=4).collect()
    r1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert r1[0] == 9 and r1[9] == 0


def test_text_stats_known_values(spark):
    df = docs_df(spark, [(1, "The cat and the dog sat, happily!")])
    r = text.text_stats(df).collect()[0]
    assert r["n_tokens"] == 7
    assert r["n_punct"] == 2  # ',' and '!'
    assert r["n_wordish"] == 9  # 7 words + 2 punct
    # stopwords: 'The', 'and', 'the' → 3/7
    assert abs(r["stopword_ratio"] - 3 / 7) < 1e-12
    assert 0.0 <= r["quality"] <= 1.0


def test_language_id_picks_stopword_language(spark):
    df = docs_df(
        spark,
        [
            (1, "the cat is in the house and that is fine"),
            (2, "der hund ist nicht mit der katze und das ist gut"),
            (3, "zzz qqq www"),
        ],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in text.language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_fingerprint_equal_iff_same_token_stream(spark):
    df = docs_df(spark, [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c d f"), (4, "x y")])
    got = {r["doc_id"]: (r["fp"], r["n_grams"]) for r in text.fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1][0] != got[3][0]
    assert got[4][1] == 0


def test_fingerprint_short_doc_oracle_parity(spark):
    """Docs shorter than n tokens: both engines must emit fp = md5('')
    (ADVICE r1 — the oracle used to return NULL on an empty gram list)."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b c d e", "x y", "solo"]})
    con = duckdb.connect()
    con.register("documents", pdf)
    try:
        assert_matches_oracle(
            text.fingerprint(spark.createDataFrame(pdf)), con, text.fingerprint_sql()
        )
    finally:
        con.close()


def test_minhash_xxhash_variant_finds_exact_dups(spark):
    """The production-hash (xxhash64) MinHash pipeline must, like the
    portable one, always pair identical documents (Jaccard 1.0 collides
    on every band under ANY hash function)."""
    body = "the quick brown fox jumps over the lazy dog again and again"
    df = docs_df(spark, [(1, body), (2, body), (3, "totally different words here entirely")])
    sh = dedup.shingles(df)
    for portable in (True, False):
        sigs = dedup.minhash_signatures(sh, num_perm=8, portable=portable)
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.lsh_candidate_pairs(sigs, num_perm=8, bands=2).collect()
        }
        assert (1, 2) in pairs


# ---------------------------------------------------------------------------
# scale guards on the O(n²) exact baselines (VERDICT r1)
# ---------------------------------------------------------------------------


def _emb_df(spark, n=6, dim=4):
    rows = [(i, [float(i + d) for d in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_guard_raises_over_limit(spark):
    df = _emb_df(spark)
    with pytest.raises(ValueError, match="ann_topk"):
        similarity.brute_force_topk(df, k=2, max_query_rows=3)
    # under the limit and with the guard bypassed both still run
    assert similarity.brute_force_topk(df, k=2, max_query_rows=6).count() > 0
    assert similarity.brute_force_topk(df, k=2, max_query_rows=None).count() > 0


def test_embedding_dup_pairs_guard_raises_over_limit(spark):
    df = _emb_df(spark)
    with pytest.raises(ValueError, match="LSH"):
        dedup.embedding_dup_pairs(df, threshold=0.0, max_rows=3)
    assert dedup.embedding_dup_pairs(df, threshold=0.0, max_rows=None).count() > 0


def test_connected_components_resolves_transitive_chain(spark):
    """A~B and B~C (A,C never paired directly) must land in ONE cluster
    labelled by the min id; an unrelated pair forms its own cluster."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_clusters_excludes_singletons_and_marks_canonical(spark):
    body = "the quick brown fox jumps over the lazy dog again and again today"
    df = docs_df(
        spark,
        [(1, body), (2, body), (3, "totally different words about spark engines here")],
    )
    rows = dedup.dedup_clusters(df).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    for r in rows:
        assert r["cluster_id"] == 1 and r["cluster_size"] == 2
        assert r["is_canonical"] == (r["doc_id"] == 1)


def test_hash_sample_nested_and_deterministic(spark):
    from dataframeutils_spark.operators import sampling

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s5 = {r["doc_id"] for r in sampling.hash_sample(df, 5).collect()}
    s10 = {r["doc_id"] for r in sampling.hash_sample(df, 10).collect()}
    assert s5 == {r["doc_id"] for r in sampling.hash_sample(df, 5).collect()}
    assert s5 <= s10  # nested across rates
    assert 0.02 < len(s10) / 2000 < 0.2


def test_split_assign_stable_under_corpus_growth(spark):
    from dataframeutils_spark.operators import sampling

    small = spark.range(500).withColumnRenamed("id", "doc_id")
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in sampling.split_assign(small).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.split_assign(big).collect()}
    assert all(b[k] == v for k, v in a.items())  # growth never reassigns
    frac_train = sum(1 for v in b.values() if v == "train") / len(b)
    assert 0.7 < frac_train < 0.9


def test_topk_terms_counts_and_ranks(spark):
    df = docs_df(spark, [(1, "apple apple banana"), (2, "apple cherry cherry")])
    got = [(r["term"], r["n"], r["rank"]) for r in text.topk_terms(df, k=2).collect()]
    assert sorted(got, key=lambda t: t[2]) == [("apple", 3, 1), ("cherry", 2, 2)]


def test_tfidf_rare_term_outranks_common(spark):
    """A term unique to one doc must outrank a corpus-wide term with the
    same in-doc frequency."""
    df = docs_df(
        spark,
        [(1, "shared zebra"), (2, "shared other"), (3, "shared words")],
    )
    r1 = {r["rank"]: r["term"] for r in text.tfidf_topterms(df, k=2).filter(F.col("doc_id") == 1).collect()}
    assert r1[1] == "zebra" and r1[2] == "shared"


def test_ivf_kmeans_groups_clustered_vectors(spark):
    """Production quantizer: on two well-separated clusters, every
    rank-1 IVF neighbor must come from the query's own cluster."""
    import numpy as np

    rng = np.random.default_rng(9)
    rows = []
    for i in range(30):
        base = [5.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 5.0, 0.0, 0.0]
        rows.append((i, [float(b + rng.normal(0, 0.1)) for b in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.train_centroids_kmeans(df, n_centroids=2)
    got = similarity.ivf_topk(df, k=1, n_probe=1, dim=4, centroids=cents).collect()
    assert len(got) == 30
    for r in got:
        assert r["query_id"] % 2 == r["neighbor_id"] % 2
        assert r["cos_sim"] > 0.99


def test_ivf_hash_centroids_match_bruteforce_rank1_mostly(spark):
    """Hash-centroid IVF with generous probes approximates exact rank-1:
    on random data, most rank-1 neighbors should agree with brute force."""
    df = _emb_df(spark, n=40, dim=8)
    bf = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.brute_force_topk(df, k=1).collect()
    }
    ivf = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.ivf_topk(df, k=1, n_centroids=4, n_probe=2, dim=8).collect()
    }
    agree = sum(1 for q, n in ivf.items() if bf.get(q) == n)
    assert agree >= len(bf) * 0.5  # approximate, but far above chance


def test_ann_topk_dim_param_matches_probe(spark):
    """Passing the contract width must give exactly the probed plan's
    results (the probe is only a fallback)."""
    df = _emb_df(spark, n=20, dim=4)
    key = ["query_id", "neighbor_id"]
    a = similarity.ann_topk(df, k=3, bits=8, bands=2).toPandas().sort_values(key)
    b = similarity.ann_topk(df, k=3, bits=8, bands=2, dim=4).toPandas().sort_values(key)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


# ---------------------------------------------------------------------------
# oracle parity at sf0.001 (mirrors the driver's gate on smaller data)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "dedup_embedding",
        "text_stats",
        "language_id",
        "fingerprint",
        "similarity_topk",
        "similarity_ann",
        "similarity_ivf",
        "dedup_clusters",
        "dedup_embedding_clusters",
        "dataset_split",
        "hash_sample",
        "data_mixture",
        "pipeline_prepare",
        "text_repetition",
        "lm_quality",
        "dedup_shared_spans",
        "topk_terms",
        "tfidf_topterms",
    ],
)
def test_northstar_oracle_parity(spark, ddb, name):
    from dataframeutils_spark import driver

    q = driver.all_queries()[name]
    sql = driver.all_oracles()[name]
    assert_matches_oracle(q(spark, SF_DIR), ddb, sql)


def test_prepare_corpus_dedups_after_filtering(spark):
    """Pipeline order matters: dedup runs AFTER the quality/language
    filters, so a good doc whose only exact duplicate was filtered out
    must still survive, and among two surviving duplicates the min id
    wins."""
    from dataframeutils_spark.operators import pipeline

    good = "the cat and the dog went to the market for food and water"
    junk = "!!! ??? ***"
    rows = [
        (1, good),   # survives: canonical copy (min id of {1, 2})
        (2, good),   # exact dup of 1 -> dropped by dedup
        (3, junk),   # dropped by quality filter
        (4, junk),   # its dup ALSO dropped by quality, not by dedup
        (5, "der hund und die katze sind nicht auf der couch zu sehen"),  # de -> lang filter
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pipeline.prepare_corpus(docs, min_quality=0.3, langs=("en",))
    got = {r["doc_id"] for r in out.collect()}
    assert got == {1}


def test_ivf_arrow_rerank_matches_fold(spark):
    """The production cogrouped re-rank must produce the same (query,
    neighbor, rank) sets as the oracle-exact fold path — only the last
    ulp of cos_sim may differ (BLAS vs sequential fold)."""
    from dataframeutils_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = similarity.ivf_topk(emb, k=5, n_probe=2, dim=64, arrow_rerank=True).select(
        "query_id", "neighbor_id", "rank"
    )
    b = similarity.ivf_topk(emb, k=5, n_probe=2, dim=64).select(
        "query_id", "neighbor_id", "rank"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_ivf_arrow_assign_matches_fold(spark):
    """The shuffle-free numpy assignment (one matmul per Arrow batch)
    must produce the IDENTICAL (query, neighbor, rank) result as the
    fold+window path — same argmax, same (score desc, centroid asc)
    tie-break, zero-norm centroids last."""
    from dataframeutils_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = similarity.ivf_topk(emb, k=5, n_probe=2, dim=64, arrow_assign=True).select(
        "query_id", "neighbor_id", "rank"
    )
    b = similarity.ivf_topk(emb, k=5, n_probe=2, dim=64).select(
        "query_id", "neighbor_id", "rank"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_ivf_hier_arrow_assign_matches_fold(spark):
    """The one-pass Arrow two-stage assignment (coarse matmul → group-
    masked fine matmul) must reproduce the fold+window hier path's
    (query, neighbor, rank) output exactly — same probed-group
    visibility, same tie-breaks."""
    from dataframeutils_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    kw = dict(k=5, n_probe=2, coarse_probe=3, dim=64, seed=7)
    a = similarity.ivf_topk_hier(emb, arrow_assign=True, **kw).select(
        "query_id", "neighbor_id", "rank"
    )
    b = similarity.ivf_topk_hier(emb, **kw).select(
        "query_id", "neighbor_id", "rank"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_ivf_hier_recall_vs_flat(spark):
    """Two-level IVF is approximate by construction; pin its floor:
    with coarse_probe=4 over hash-derived (structureless — worst case)
    centroids, ≥75% of the flat assignment's top-k pairs must survive,
    and every query keeps a full result set."""
    from pyspark.sql import functions as F

    from dataframeutils_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    hier = similarity.ivf_topk_hier(emb, k=5, n_probe=2, coarse_probe=4, dim=64)
    flat = similarity.ivf_topk(emb, k=5, n_probe=2, dim=64, arrow_rerank=True)
    h = {(r["query_id"], r["neighbor_id"]) for r in hier.collect()}
    f = {(r["query_id"], r["neighbor_id"]) for r in flat.collect()}
    assert len(h & f) / len(f) >= 0.75
    n_queries = hier.select("query_id").distinct().count()
    assert n_queries == emb.count()


def test_ivf_arrow_rerank_carries_caller_id_type(spark):
    """The cogroup output schema must derive from the caller's id
    column — a hardcoded `long` would cast-garble string ids."""
    from pyspark.sql import functions as F

    from dataframeutils_spark.operators import similarity

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .limit(40)
        .select(F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding")
    )
    out = similarity.ivf_topk(emb, k=3, n_probe=2, dim=64, arrow_rerank=True)
    assert dict(out.dtypes)["query_id"] == "string"
    rows = out.limit(5).collect()
    assert rows and all(r["query_id"].startswith("doc-") for r in rows)


def test_repetition_stats_counts_duplicate_ngrams(spark):
    from dataframeutils_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a a a a a a"), (2, "one two three four five"), (3, "x y")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in T.repetition_stats(docs, n=3).collect()}
    # doc 1: four 3-grams, all identical -> ratio 0.75
    assert got[1]["n_ngrams"] == 4 and got[1]["n_distinct_ngrams"] == 1
    assert abs(got[1]["dup_ngram_ratio"] - 0.75) < 1e-12
    # doc 2: three distinct 3-grams -> ratio 0
    assert got[2]["n_ngrams"] == 3 and got[2]["dup_ngram_ratio"] == 0.0
    # doc 3: too short -> zero n-grams, ratio 0 (not NULL, not error)
    assert got[3]["n_ngrams"] == 0 and got[3]["dup_ngram_ratio"] == 0.0


def test_shared_span_stats_flags_copied_passage(spark):
    from dataframeutils_spark.operators import dedup as D

    boiler = "this boilerplate passage is shared across both documents verbatim"
    docs = spark.createDataFrame(
        [
            (1, boiler + " plus unique tail one"),
            (2, boiler + " and a different unique tail"),
            (3, "entirely unrelated text with enough tokens to form spans here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in D.shared_span_stats(docs, n=8).collect()}
    # docs 1 and 2 share the 8-token spans inside the boilerplate prefix
    assert got[1]["n_shared_spans"] > 0 and got[2]["n_shared_spans"] > 0
    assert got[1]["max_span_df"] == 2
    # doc 3 shares nothing
    assert got[3]["n_shared_spans"] == 0 and got[3]["max_span_df"] == 1


def test_stratified_sample_is_nested_and_respects_rates(spark):
    """Per-stratum rates apply independently; samples stay nested when a
    stratum's rate grows (scaling-law comparability across mixtures)."""
    from dataframeutils_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    small = sampling.stratified_hash_sample(docs, {"en": 10}, default_pct=50)
    big = sampling.stratified_hash_sample(docs, {"en": 40}, default_pct=50)
    # nested: every doc kept at en=10 is kept at en=40 (same salt)
    assert small.join(big, "doc_id", "left_anti").count() == 0
    # non-en strata identical across the two mixtures
    a = small.filter("lang <> 'en'").select("doc_id")
    b = big.filter("lang <> 'en'").select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # en kept-fraction lands near the requested rate
    n_en = docs.filter("lang = 'en'").count()
    if n_en > 50:
        frac = big.filter("lang = 'en'").count() / n_en
        assert 0.25 < frac < 0.55


def test_ngram_lm_score_ranks_indomain_above_gibberish(spark):
    """A doc made of the corpus's common bigrams must score a higher
    average log-probability than a doc of unique gibberish."""
    from dataframeutils_spark.operators import text as T

    base = [(i, "the cat sat on the mat and the dog sat on the rug") for i in range(20)]
    docs = base + [
        (100, "the cat sat on the mat"),                  # in-domain
        (101, "zq xv bnm qwerty zzz plok mnbv xsw"),      # gibberish
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_logprob"] for r in T.ngram_lm_score(df).collect()}
    assert got[100] > got[101]


# ---------------------------------------------------------------------------
# round-4 additions: incremental dedup, keep-best, shard manifest,
# temperature mixture
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_incremental_dedup_statuses(spark):
    corpus_store = spark.createDataFrame([("a b c",)], "t string").select(
        dedup.portable_hash60(F.col("t")).alias("h")
    )
    batch = docs_df(
        spark,
        [
            (5, "a b c"),        # already in corpus
            (6, "new text one"),  # first occurrence in batch
            (7, "new text one"),  # second occurrence in batch
            (8, "another doc"),   # unique
        ],
    )
    got = {r["doc_id"]: r["status"] for r in dedup.incremental_dedup(batch, corpus_store).collect()}
    assert got == {5: "dup_of_corpus", 6: "new", 7: "dup_in_batch", 8: "new"}


def test_snapshot_split_is_a_partition(spark, sf_docs):
    corpus, batch = dedup.snapshot_split(sf_docs)
    n_c, n_b, n = corpus.count(), batch.count(), sf_docs.count()
    assert n_c + n_b == n and n_c > 0 and n_b > 0
    assert corpus.join(batch, "doc_id").count() == 0


def test_keep_best_keeps_longest_per_cluster(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base + " extra trailing words here"
    far = "completely unrelated words about spark engines and parquet columnar files"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    ).withColumn("n_chars", F.length("text"))
    out = dedup.keep_best_clusters(df).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    kept = {r["doc_id"]: r["keep"] for r in out}
    # doc 2 is longer → it wins, even though doc 1 has the min id
    assert kept == {2: True, 1: False}


def test_keep_best_exactly_one_keeper_per_cluster(sf_docs):
    out = dedup.keep_best_clusters(sf_docs).toPandas()
    per = out.groupby("cluster_id")["keep"].sum()
    assert (per == 1).all()
    # keeper has the max quality of its cluster
    mx = out.groupby("cluster_id")["quality"].max()
    keepers = out[out["keep"]].set_index("cluster_id")["quality"]
    assert (keepers == mx.loc[keepers.index]).all()


def test_shard_manifest_dense_positions_and_offsets(sf_docs):
    from dataframeutils_spark.operators import sampling

    out = sampling.shard_manifest(sf_docs, n_shards=8).toPandas()
    sizes = sf_docs.toPandas().set_index("doc_id")["n_chars"]
    assert len(out) == len(sizes)
    for shard, grp in out.groupby("shard"):
        g = grp.sort_values("pos")
        assert list(g["pos"]) == list(range(1, len(g) + 1))
        # offset = running sum of previous docs' sizes in shard order
        expect = sizes.loc[g["doc_id"]].cumsum().shift(fill_value=0)
        assert list(g["offset"]) == list(expect)


def test_shard_manifest_stable_under_input_order(sf_docs):
    from dataframeutils_spark.operators import sampling

    a = sampling.shard_manifest(sf_docs, n_shards=8).toPandas()
    b = sampling.shard_manifest(
        sf_docs.orderBy(F.col("doc_id").desc()).repartition(7), n_shards=8
    ).toPandas()
    key = lambda d: d.sort_values("doc_id").reset_index(drop=True)
    assert key(a).equals(key(b))


def test_mixture_temperature_limits(sf_docs):
    from dataframeutils_spark.operators import sampling

    # tolerances at the decround(6-decimal) output contract, not float64
    t1 = sampling.mixture_temperature_summary(sf_docs, tau=1.0).toPandas()
    # tau=1 → temperature weight equals natural share
    assert (abs(t1["temp_weight"] - t1["nat_share"]) < 2e-6).all()
    t0 = sampling.mixture_temperature_summary(sf_docs, tau=0.0).toPandas()
    assert (abs(t0["temp_weight"] - 1.0 / len(t0)) < 2e-6).all()
    th = sampling.mixture_temperature_summary(sf_docs, tau=0.5).toPandas()
    assert abs(th["temp_weight"].sum() - 1.0) < len(th) * 2e-6
    # tau<1 boosts the rarest stratum and shrinks the most common one
    assert th.loc[th["n_docs"].idxmin(), "boost"] > 1.0
    assert th.loc[th["n_docs"].idxmax(), "boost"] < 1.0


def test_chunk_documents_windows_and_tail(spark):
    df = docs_df(spark, [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")])
    out = text.chunk_documents(df, window=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens, window 4, stride 3 → ceil((10-4)/3)+1 = 3
    # chunks; the window starting at 6 reaches the end, so no
    # redundant (9, 1) tail chunk is emitted
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [(r["start_tok"], r["n_tokens"]) for r in c1] == [(0, 4), (3, 4), (6, 4)]
    # doc 2: 2 tokens → one short chunk
    assert [(r["start_tok"], r["n_tokens"]) for r in by_doc[2]] == [(0, 2)]
    # empty doc → no chunks
    assert 3 not in by_doc
    # overlap: chunk 0 covers t0..t3, chunk 1 covers t3..t6 — hashes of
    # the rejoined windows must differ yet be deterministic
    from dataframeutils_spark.operators.dedup import portable_hash60

    redo = {r["chunk_idx"]: r["chunk_hash"] for r in text.chunk_documents(df, window=4, stride=3).collect() if r["doc_id"] == 1}
    assert redo == {r["chunk_idx"]: r["chunk_hash"] for r in c1}


def test_chunk_documents_rejects_bad_stride(spark):
    df = docs_df(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        text.chunk_documents(df, window=4, stride=5)
    with pytest.raises(ValueError):
        text.chunk_documents(df, window=4, stride=0)


def test_weighted_sample_determinism_and_bias(spark, sf_docs):
    from dataframeutils_spark.operators import sampling

    a = sampling.weighted_sample(sf_docs, k=100).toPandas()
    b = sampling.weighted_sample(
        sf_docs.orderBy(F.col("doc_id").desc()).repartition(5), k=100
    ).toPandas()
    assert a.equals(b)  # order/partitioning independent
    assert len(a) == 100 and a["es_key"].is_monotonic_increasing
    # weight bias: the sampled docs skew longer than the corpus average
    corpus_mean = sf_docs.agg(F.avg("n_chars")).first()[0]
    assert a["weight"].mean() > corpus_mean
    # fresh salt draws a different sample
    c = sampling.weighted_sample(sf_docs, k=100, salt="other").toPandas()
    assert set(c["doc_id"]) != set(a["doc_id"])


def test_snapshot_split_production_hash_is_partition(spark, sf_docs):
    """portable=False (xxhash64): the split must still be a PARTITION —
    Spark's signed % once dropped 22% of rows from both halves."""
    corpus, batch = dedup.snapshot_split(sf_docs, portable=False)
    assert corpus.count() + batch.count() == sf_docs.count()
    assert corpus.join(batch, "doc_id").count() == 0


def test_shard_manifest_production_hash_shard_range(spark, sf_docs):
    from dataframeutils_spark.operators import sampling

    out = sampling.shard_manifest(sf_docs, n_shards=8, portable=False).toPandas()
    assert len(out) == sf_docs.count()
    assert set(out["shard"]) <= set(range(8)), sorted(set(out["shard"]))


def test_recall_audit_bounds_and_budget_response(spark):
    """Recall lies in [0,1]; widening the IVF probe budget can only
    help (more lists searched ⊇ fewer)."""
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    narrow = {
        r["method"]: r
        for r in similarity.recall_audit(
            emb, k=3, n_probe=1, dim=8, sample_mod=None
        ).collect()
    }
    wide = {
        r["method"]: r
        for r in similarity.recall_audit(
            emb, k=3, n_probe=8, dim=8, sample_mod=None
        ).collect()
    }
    for m, r in narrow.items():
        assert 0.0 <= r["avg_recall"] <= 1.0 and r["n_queries"] == 60
    assert wide["ivf"]["avg_recall"] >= narrow["ivf"]["avg_recall"]
    # default sampling audits a strict hash-subset of the vectors as
    # queries (the O(N²)→O(N²/mod) ground-truth reduction)
    sampled = {
        r["method"]: r
        for r in similarity.recall_audit(emb, k=3, n_probe=1, dim=8).collect()
    }
    for r in sampled.values():
        assert 0 < r["n_queries"] < 60


def test_semdedup_prunes_near_identical_keeps_low_cent_sim(spark):
    # two tight pairs of near-identical vectors + isolated singles; the
    # pruned member of each pair must be the one CLOSER to its centroid
    # (SemDeDup keeps the least-redundant example), and every pruned
    # vector must have a same-cluster near-dup at >= threshold
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((2 * i, base))
        if i < 2:  # two exact-duplicate pairs
            rows.append((2 * i + 1, [x * 1.001 for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = dedup.semdedup_prune(emb, threshold=0.999, dim=8)
    rowsd = {r["vec_id"]: r for r in out.collect()}
    assert len(rowsd) == 42
    for pair in ((0, 1), (2, 3)):
        a, b = (rowsd[p] for p in pair)
        assert a["centroid"] == b["centroid"]  # near-identical co-cluster
        assert a["kept"] != b["kept"]  # exactly one survives
        kept = a if a["kept"] else b
        lost = b if a["kept"] else a
        assert kept["cent_sim"] <= lost["cent_sim"]  # keep-rule
    # scaled duplicates have identical cosine geometry -> everything else kept
    assert sum(not r["kept"] for r in rowsd.values()) == 2


def test_semdedup_no_cartesian_over_corpus(spark):
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, 0.5, -1.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    plan = (
        dedup.semdedup_prune(emb, n_clusters=4, threshold=0.9, dim=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # corpus x corpus must be an equi-join on centroid, never a product;
    # the only nested-loop is the broadcast over the <= C centroid rows
    assert "CartesianProduct" not in plan


def test_fuzzy_term_pairs_symspell_recall(spark):
    # every true distance-1 pair must be found (SymSpell blocking is
    # exact at d=1), and nothing at distance >= 2 may leak through
    docs = spark.createDataFrame(
        [(0, "color colour flavor flavour word sword apple appl grape")],
        "doc_id long, text string",
    )
    out = {
        (r["term_a"], r["term_b"]): r["dist"]
        for r in dedup.fuzzy_term_pairs(docs, min_len=4).collect()
    }
    assert ("color", "colour") in out and out[("color", "colour")] == 1
    assert ("flavor", "flavour") in out
    assert ("sword", "word") in out  # insertion at position 1
    assert ("appl", "apple") in out
    assert ("apple", "grape") not in out  # distance 4
    assert all(d <= 1 for d in out.values())


def test_fuzzy_term_lookup_matches_and_plan(spark):
    vocab = spark.createDataFrame(
        [("table",), ("cable",), ("fable",), ("zebra",)], "term string"
    )
    probes = spark.createDataFrame([("qable",), ("zzzzz",)], "probe string")
    out = dedup.fuzzy_term_lookup(probes, vocab)
    got = {(r["probe"], r["term"]) for r in out.collect()}
    # one substitution away from three vocab entries, zero from zebra
    assert got == {("qable", "table"), ("qable", "cable"), ("qable", "fable")}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# hard-negative mining (r7)
# ---------------------------------------------------------------------------


def test_hard_negatives_cross_label_only_and_ordered(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.05], 0),  # same label as 1: never its negative
            (3, [1.0, 0.1], 1),  # the hard negative for 1
            (4, [0.0, 1.0], 1),  # easy negative for 1
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = similarity.hard_negatives(df, k=2).collect()
    by_anchor = {}
    for r in got:
        by_anchor.setdefault(r["anchor_id"], []).append(
            (r["rank"], r["negative_id"])
        )
    assert sorted(by_anchor[1]) == [(1, 3), (2, 4)]  # hard before easy
    assert sorted(by_anchor[3]) == [(1, 2), (2, 1)]
    # no same-label pair anywhere
    labels = {1: 0, 2: 0, 3: 1, 4: 1}
    for r in got:
        assert labels[r["anchor_id"]] != labels[r["negative_id"]]


def test_hard_negatives_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    labels = (np.arange(30) % 3).astype(int)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist(), int(labels[i])) for i in range(30)],
        "vec_id long, embedding array<float>, label int",
    )
    got = similarity.hard_negatives(df, k=3).collect()
    v = vecs.astype("float64")
    cos = (v @ v.T) / (
        np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
    )
    for i in range(30):
        cands = sorted(
            ((-cos[i, j], j) for j in range(30) if labels[j] != labels[i]),
        )[:3]
        want = [j for _, j in cands]
        mine = [
            r["negative_id"]
            for r in sorted(
                (r for r in got if r["anchor_id"] == i), key=lambda r: r["rank"]
            )
        ]
        assert mine == want, f"anchor {i}"


def test_hard_negatives_ann_tier_recall(spark):
    """The LSH tier must recover most of the exact baseline's pairs on
    the sf0.001 embeddings (hash-derived hyperplanes — no RNG luck),
    and every anchor must keep a full result set."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = similarity.hard_negatives(emb, k=3, dim=64)
    approx = similarity.hard_negatives_ann(
        emb, k=3, oversample=8, bits=32, bands=8, dim=64
    )
    e = {(r["anchor_id"], r["negative_id"]) for r in exact.collect()}
    a = {(r["anchor_id"], r["negative_id"]) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.6
    assert approx.select("anchor_id").distinct().count() == emb.count()


# ---------------------------------------------------------------------------
# exact-quota stratified sampling (r7)
# ---------------------------------------------------------------------------


def _naive_quota(pdf, pct, strat_col="lang", id_col="doc_id", salt="quota"):
    """Reference selection: global per-stratum rank by portable hash."""
    import hashlib

    def h60(v):
        return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16)

    keep = set()
    for _, grp in pdf.groupby(strat_col):
        quota = len(grp) * pct // 100
        ranked = sorted((h60(r[id_col]), r[id_col]) for _, r in grp.iterrows())
        keep.update(i for _, i in ranked[:quota])
    return keep


def test_quota_sample_exact_counts_and_selection(spark):
    from dataframeutils_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    pdf = docs.toPandas()
    got = sampling.quota_sample(docs, pct=20, strat_col="lang").toPandas()
    # exact quota per stratum
    want_counts = {
        lang: len(grp) * 20 // 100 for lang, grp in pdf.groupby("lang")
    }
    got_counts = got.groupby("lang")["doc_id"].count().to_dict()
    assert got_counts == {k: v for k, v in want_counts.items() if v > 0}
    # exact selection (lowest hashes), not just counts
    assert set(got["doc_id"]) == _naive_quota(pdf, 20)


def test_quota_sample_straddle_logic_with_tiny_buckets(spark):
    """bucket_bits=2 (4 buckets) forces nearly every stratum through
    the straddling-bucket rank path; the result must still equal the
    naive global rank."""
    from dataframeutils_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    pdf = docs.toPandas()
    got = sampling.quota_sample(docs, pct=37, strat_col="lang", bucket_bits=2)
    assert {r["doc_id"] for r in got.collect()} == _naive_quota(pdf, 37)


def test_quota_sample_partitioning_invariant(spark):
    from dataframeutils_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    a = {r["doc_id"] for r in sampling.quota_sample(docs, pct=20).collect()}
    b = {
        r["doc_id"]
        for r in sampling.quota_sample(docs.repartition(7), pct=20).collect()
    }
    assert a == b and len(a) > 0


def test_quota_sample_nested_across_rates(spark):
    """rank ≤ ⌊n·p1/100⌋ implies rank ≤ ⌊n·p2/100⌋ for p1 ≤ p2, so quota
    samples are NESTED across rates (same property the hash_sample rate
    family guarantees) — growing a budget never swaps documents out."""
    from dataframeutils_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    s10 = {r["doc_id"] for r in sampling.quota_sample(docs, pct=10).collect()}
    s20 = {r["doc_id"] for r in sampling.quota_sample(docs, pct=20).collect()}
    s50 = {r["doc_id"] for r in sampling.quota_sample(docs, pct=50).collect()}
    assert s10 <= s20 <= s50
    assert len(s10) > 0


def test_hard_negatives_partitioning_invariant(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = {
        (r["anchor_id"], r["rank"], r["negative_id"])
        for r in similarity.hard_negatives(emb, k=2, dim=64).collect()
    }
    b = {
        (r["anchor_id"], r["rank"], r["negative_id"])
        for r in similarity.hard_negatives(emb.repartition(13), k=2, dim=64).collect()
    }
    assert a == b and len(a) > 0


def test_snapshot_diff_statuses(spark):
    from dataframeutils_spark.operators import pipeline

    old = docs_df(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = docs_df(spark, [(2, "b"), (3, "c2"), (4, "d")])
    got = {r["doc_id"]: r["status"] for r in pipeline.snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    summ = {
        r["status"]: r["n_docs"]
        for r in pipeline.snapshot_diff_summary(old, new).collect()
    }
    assert summ == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_curriculum_manifest_invariants(spark):
    from dataframeutils_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sampling.curriculum_manifest(docs, score_col="n_chars", n_stages=4).toPandas()
    assert len(got) == docs.count()
    assert set(got["stage"]) == {0, 1, 2, 3}
    # ordered stages: every stage-0 score <= every stage-3 score
    assert got[got.stage == 0]["n_chars"].max() <= got[got.stage == 3]["n_chars"].min()
    # positions are dense 1..n_s within each stage
    for s, grp in got.groupby("stage"):
        assert sorted(grp["pos_in_stage"]) == list(range(1, len(grp) + 1))
    # reproducible under repartitioning
    again = sampling.curriculum_manifest(
        docs.repartition(9), score_col="n_chars", n_stages=4
    ).toPandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert (a["pos_in_stage"] == b["pos_in_stage"]).all()
    assert (a["stage"] == b["stage"]).all()


def test_boilerplate_scrub_drops_shared_segments_rebuilds_rest(spark):
    """Segments (3-word windows here) shared by ≥2 docs are scrubbed
    from EVERY document; unique segments survive in original order,
    including the short tail segment."""
    import hashlib

    boiler = "copyright big corp"  # one exact 3-word segment
    df = docs_df(
        spark,
        [
            (1, f"{boiler} alpha beta gamma tail"),
            (2, f"{boiler} delta epsilon zeta"),
            (3, "totally unique words here nothing shared"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.boilerplate_scrub(df, seg_words=3, min_docs=2).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 1: segs = [boiler, "alpha beta gamma", "tail"] → boiler dropped
    assert out[1]["n_segs"] == 3 and out[1]["n_dropped"] == 1
    assert out[1]["clean_md5"] == md5("alpha beta gamma tail")
    # doc 2: segs = [boiler, "delta epsilon zeta"]
    assert out[2]["n_segs"] == 2 and out[2]["n_dropped"] == 1
    assert out[2]["clean_md5"] == md5("delta epsilon zeta")
    # doc 3: untouched, rebuild is byte-identical
    assert out[3]["n_dropped"] == 0
    assert out[3]["clean_md5"] == md5("totally unique words here nothing shared")
    assert out[3]["clean_len"] == len("totally unique words here nothing shared")


def test_boilerplate_scrub_all_dropped_yields_empty_doc(spark):
    """A document that is 100% boilerplate rebuilds to the empty
    string (md5 of '' — the oracle's coalesce contract)."""
    import hashlib

    df = docs_df(spark, [(1, "same old text"), (2, "same old text")])
    got = {r["doc_id"]: r for r in dedup.boilerplate_scrub(df, seg_words=3).collect()}
    assert got[1]["n_dropped"] == 1 and got[1]["clean_len"] == 0
    assert got[1]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_production_ivf_kmeans_recall_floor(spark):
    """VERDICT r7 #4: the production ANN arm (MLlib k-means quantizer,
    Arrow assignment + re-rank) must hold a pinned recall@k floor on
    CLUSTERED data — the regime IVF exists for. 16 well-separated
    Gaussian clusters in D=16: a query's true neighbors live in its own
    cluster, so probing the 2 nearest k-means lists recovers nearly all
    of them. (The gate-checked similarity_recall numbers are low by
    construction — near-uniform vectors are the documented worst case;
    this pins the production story on data with structure.)"""
    import numpy as np

    from dataframeutils_spark.operators import similarity

    rng = np.random.RandomState(11)
    n_clusters, per, d = 16, 60, 16
    centers = rng.randn(n_clusters, d) * 8.0
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.randn(per, d)
        for i, p in enumerate(pts):
            rows.append((c * per + i, [float(x) for x in p]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = {
        r["method"]: r
        for r in similarity.recall_audit(
            emb, k=5, bits=32, bands=4, n_probe=2, dim=d,
            sample_mod=4, production=True,
        ).collect()
    }
    assert set(out) == {"ann_lsh", "ivf", "ivf_kmeans", "ann_multiprobe"}
    # multi-probe can only widen the probe set vs single-probe LSH
    assert (
        out["ann_multiprobe"]["avg_recall"] >= out["ann_lsh"]["avg_recall"]
    )
    prod = out["ivf_kmeans"]
    assert prod["n_queries"] > 100
    # pinned floor: measured ~1.0 on this corpus; 0.9 leaves headroom
    # for MLlib seed/version drift without ever letting a broken probe
    # path (recall ~n_probe/C ≈ 0.06 on structureless data) pass
    assert prod["avg_recall"] >= 0.9, prod
    # and the production arm must beat the hash-derived oracle arm on
    # clustered data — the whole reason it exists
    assert prod["avg_recall"] >= out["ivf"]["avg_recall"], (prod, out["ivf"])


def test_multiprobe_candidates_superset_and_recall(spark):
    """Multi-probe LSH probes the query's own bucket plus all Hamming-
    distance-1 buckets, so its neighbor set per query can only grow —
    and on a corpus where near-duplicates sit one sign-flip apart the
    recall strictly improves over single-probe."""
    import numpy as np

    from dataframeutils_spark.operators import similarity

    rng = np.random.RandomState(3)
    base = rng.randn(40, 8)
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        # a tight near-duplicate of every vector
        rows.append((2 * i + 1, [float(x) for x in v + rng.randn(8) * 0.05]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    single = similarity.ann_topk(df, k=3, bits=16, bands=2, dim=8)
    multi = similarity.ann_topk_multiprobe(df, k=3, bits=16, bands=2, dim=8)
    s_pairs = {(r["query_id"], r["neighbor_id"]) for r in single.collect()}
    m_pairs = {(r["query_id"], r["neighbor_id"]) for r in multi.collect()}

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(df, k=3, max_query_rows=None).collect()
    }
    recall_s = len(s_pairs & exact) / len(exact)
    recall_m = len(m_pairs & exact) / len(exact)
    assert recall_m >= recall_s
    assert recall_m > 0.5
    # every query finds at least its planted near-duplicate under
    # multi-probe (8 bits/band: the pair is within one flip of
    # colliding on some band with overwhelming probability)
    found = {q for q, _ in m_pairs}
    assert len(found) == len(rows)


def test_vocab_growth_heaps_curve(spark):
    """Hand-built corpus over 3 buckets: first-seen accounting and the
    cumulative curves check exactly; an all-duplicate tail adds tokens
    but zero vocabulary."""
    rows = [
        (0, "a b c"),        # bucket 0: new a,b,c
        (1, "a b d"),        # bucket 0: new d
        (2, "c e"),          # bucket 1: new e
        (3, "a a a"),        # bucket 1: nothing new
        (4, "a b c d e"),    # bucket 2: nothing new (pure re-tread)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        text.vocab_growth(docs, bucket=2).collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in out] == [0, 1, 2]
    assert [r["n_tokens"] for r in out] == [6, 5, 5]
    assert [r["tokens_cum"] for r in out] == [6, 11, 16]
    assert [r["new_terms"] for r in out] == [4, 1, 0]
    assert [r["vocab_cum"] for r in out] == [4, 5, 5]


def test_leakage_safe_split_keeps_families_together(spark):
    """Near-duplicate documents must land in the SAME split: every
    member of a duplicate family carries the family's rep_id, so the
    split function cannot separate them; singletons hash on their own
    id and reproduce split_assign exactly."""
    from dataframeutils_spark.operators import sampling

    base = "the quick brown fox jumps over the lazy dog again and again today"
    fam = [(i, base.replace("today", f"today{'!' * (i % 2)}")) for i in range(6)]
    singles = [(100 + i, f"unique document number {i} with distinct words {i*7}")
               for i in range(20)]
    docs = docs_df(spark, fam + singles)
    out = sampling.leakage_safe_split(docs, train_pct=50, val_pct=25).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert len(by_doc) == 26
    fam_rows = [by_doc[i] for i in range(6)]
    # the whole family shares one rep and therefore one split
    assert len({r["rep_id"] for r in fam_rows}) == 1
    assert len({r["split"] for r in fam_rows}) == 1
    assert fam_rows[0]["rep_id"] == 0  # min doc id is the representative
    # singletons represent themselves and match the plain hash split
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(
            docs, train_pct=50, val_pct=25
        ).select("doc_id", "split").collect()
    }
    for i in range(100, 120):
        assert by_doc[i]["rep_id"] == i
        assert by_doc[i]["split"] == plain[i]


def test_dup_matrix_localizes_duplication_by_source(spark):
    """Two sources sharing a near-dup family produce a cross-source
    cell; intra-source template spam produces a diagonal cell; clean
    sources never appear."""
    from dataframeutils_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base, "mirror_a"),
        (2, base.replace("today", "tomorrow"), "mirror_b"),  # cross-source dup
        (3, base.replace("today", "yesterday"), "mirror_b"),  # and intra mirror_b
        (4, "completely unrelated words about spark engines and parquet files", "clean"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["src_a"], r["src_b"]): (r["n_pairs"], r["n_docs"])
        for r in dedup.dup_matrix(docs).collect()
    }
    assert ("mirror_a", "mirror_b") in out
    assert out[("mirror_a", "mirror_b")][0] >= 1
    assert ("mirror_b", "mirror_b") in out  # the intra-source cell
    assert not any("clean" in k for k in out)
    # n_docs counts distinct docs, never double-counts a doc in two pairs
    assert out[("mirror_a", "mirror_b")][1] <= 3


def test_embedding_class_stats_separates_planted_classes(spark):
    """Two tight, well-separated Gaussian classes: separation >> 1,
    nearest_label is the other class, intra dispersion ~ the noise
    scale."""
    import numpy as np

    from dataframeutils_spark.operators import similarity

    rng = np.random.RandomState(5)
    rows = []
    for lab, center in ((0, 10.0), (1, -10.0)):
        for i in range(40):
            v = np.full(8, center) + rng.randn(8) * 0.1
            rows.append((lab * 100 + i, [float(x) for x in v], lab))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in similarity.embedding_class_stats(df).collect()}
    assert set(out) == {0, 1}
    for lab in (0, 1):
        r = out[lab]
        assert r["n"] == 40
        assert r["nearest_label"] == 1 - lab
        # centers are 20*sqrt(8) ~ 56.6 apart; intra ~ 0.1*sqrt(8)
        assert r["inter_dist"] > 50
        assert r["intra_dist"] < 1.0
        assert r["separation"] > 50


def test_label_agreement_high_on_separated_classes(spark):
    """On the same separated corpus every LSH nearest neighbor stays in
    the query's own cluster → agreement ~1.0 for covered queries."""
    import numpy as np

    from dataframeutils_spark.operators import similarity

    rng = np.random.RandomState(6)
    rows = []
    for lab, center in ((0, 10.0), (1, -10.0)):
        for i in range(40):
            v = np.full(8, center) + rng.randn(8) * 0.1
            rows.append((lab * 100 + i, [float(x) for x in v], lab))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = similarity.label_agreement(df, bits=16, bands=4, dim=8).collect()
    assert len(out) == 2
    for r in out:
        assert r["agree_rate"] == 1.0
        assert 0 < r["coverage"] <= 1.0


def test_label_agreement_reports_zero_coverage_class(spark):
    """A class whose queries have NO LSH candidate must still appear in
    the report with n_queries=0, coverage=0 and agree_rate NULL — not
    silently vanish (the degenerate case the health metric exists to
    surface). A singleton vector far from everything shares no LSH
    band bucket with any other vector, so its class gets no candidates."""
    import numpy as np

    from dataframeutils_spark.operators import similarity

    rng = np.random.RandomState(7)
    rows = []
    for lab, center in ((0, 10.0), (1, -10.0)):
        for i in range(20):
            v = np.full(8, center) + rng.randn(8) * 0.1
            rows.append((lab * 100 + i, [float(x) for x in v], lab))
    # class 2: one singleton whose 4 band signatures (bits=16, bands=4)
    # miss every bucket the two clusters occupy — verified offline, so
    # the LSH join deterministically yields NO candidate for it
    rows.append((999, [2.4835707650561636, -0.6913215058559232,
                       3.2384426905034625, 7.615149282040127,
                       -1.1707668736166799, -1.1706847847459028,
                       7.896064077536957, 3.837173645764544], 2))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in
           similarity.label_agreement(df, bits=16, bands=4, dim=8).collect()}
    assert set(out) == {0, 1, 2}, set(out)
    r2 = out[2]
    assert r2["class_size"] == 1
    assert r2["n_queries"] == 0 and r2["n_agree"] == 0
    assert r2["agree_rate"] is None
    assert r2["coverage"] == 0.0
    # classes 0/1 unaffected by the LEFT-join rewrite
    for lab in (0, 1):
        assert out[lab]["n_queries"] > 0 and out[lab]["agree_rate"] is not None


def test_multiprobe_bucket_cap_bounds_candidates(spark):
    """VERDICT r8 #4: the occupancy cap must make probe cost bounded by
    bands x (1+r) x cap per query even when one bucket holds the whole
    corpus. 50 IDENTICAL vectors share every band signature (the
    worst-case hot bucket); uncapped, each query sees all 49 others as
    candidates — capped at 3, a query can see at most the capped index
    entries of its probed buckets."""
    import numpy as np

    from dataframeutils_spark.operators import similarity

    n, d = 50, 8
    v = [float(x) for x in np.arange(1, d + 1)]
    df = spark.createDataFrame(
        [(i, v) for i in range(n)], "vec_id long, embedding array<float>"
    )
    bits, bands, cap = 16, 4, 3
    uncapped = similarity.ann_topk_multiprobe(df, k=n, bits=bits, bands=bands, dim=d)
    got_un = uncapped.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
    assert got_un == n - 1  # hot bucket: everyone sees everyone

    capped = similarity.ann_topk_multiprobe(
        df, k=n, bits=bits, bands=bands, dim=d, bucket_cap=cap
    )
    per_q = capped.groupBy("query_id").count().collect()
    # identical vectors share one bucket per band; Hamming-1 probes hit
    # empty buckets, so the bound here is bands * cap (minus self)
    assert all(r["count"] <= bands * cap for r in per_q), per_q[:3]
    # deterministic: the same capped sample survives a re-run
    a = sorted(map(tuple, capped.select("query_id", "neighbor_id").collect()))
    b = sorted(map(tuple, similarity.ann_topk_multiprobe(
        df, k=n, bits=bits, bands=bands, dim=d, bucket_cap=cap
    ).select("query_id", "neighbor_id").collect()))
    assert a == b


def test_multiprobe_bucket_cap_recall_floor_clustered(spark):
    """The cap is a scale knob, not a quality cliff: on 16 separated
    Gaussian clusters (the clustered-recall fixture), multi-probe LSH
    with a bucket_cap generous enough for one cluster's occupancy keeps
    recall@5 >= 0.9 vs exact brute force."""
    import numpy as np

    from dataframeutils_spark.operators import similarity

    rng = np.random.RandomState(11)
    n_clusters, per, d = 16, 60, 16
    centers = rng.randn(n_clusters, d) * 8.0
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.randn(per, d)
        for i, p in enumerate(pts):
            rows.append((c * per + i, [float(x) for x in p]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, k=5, dim=d).select(
            "query_id", "neighbor_id"
        ).collect()
    }
    capped = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk_multiprobe(
            emb, k=5, bits=32, bands=4, dim=d, bucket_cap=2 * per
        ).select("query_id", "neighbor_id").collect()
    }
    recall = len(exact & capped) / len(exact)
    assert recall >= 0.9, recall
    # probe fan-out bound (r11 verdict watch item 1): keeping only the
    # 2 lowest-occupancy non-empty Hamming-1 probes per (query, band)
    # cuts the probe join from (1+r)=9x to 3x the query count and must
    # stay above the same recall floor on clustered data
    limited = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk_multiprobe(
            emb, k=5, bits=32, bands=4, dim=d, bucket_cap=2 * per,
            probe_limit=2,
        ).select("query_id", "neighbor_id").collect()
    }
    recall_lim = len(exact & limited) / len(exact)
    assert recall_lim >= 0.9, recall_lim


def test_canonical_dedup_collapses_whitespace_and_case_variants(spark):
    """The canonical tier must group byte-level variants exact_dedup
    misses (case mangling, whitespace runs, trailing newline) while
    keeping genuinely different texts apart."""
    from dataframeutils_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox"),
            (2, "the  quick   brown fox "),   # case + runs + trailing
            (3, "THE QUICK BROWN\tFOX"),      # tab + caps
            (4, "the quick brown fox jumps"), # different text
            (5, "the quick brown fox"),       # already canonical
        ],
        "doc_id long, text string",
    )
    out = {r["canon_hash"]: r for r in dedup.canonical_dedup(docs).collect()}
    assert len(out) == 2
    big = max(out.values(), key=lambda r: r["n_docs"])
    assert big["n_docs"] == 4 and big["keep_doc_id"] == 1
    # 4 docs but only 4 distinct raw hashes? 1,2,3,5 all differ raw
    assert big["n_variants"] == 4
    # exact dedup would have found nothing to collapse
    assert dedup.exact_dedup(docs).count() == 5


def test_k_anonymity_counts_classes_below_k(spark):
    """Hand-checkable equivalence classes: sizes 1, 2 and 5 with k=3
    put exactly the singleton and the pair at risk."""
    from dataframeutils_spark.operators import cleaning

    rows = (
        [("a", 1)] * 5      # class size 5: safe
        + [("b", 1)] * 2    # class size 2: at risk
        + [("c", 2)]        # class size 1: at risk
    )
    df = spark.createDataFrame(rows, "qa string, qb int")
    r = cleaning.k_anonymity(df, ["qa", "qb"], k=3).collect()[0]
    assert r["k"] == 3
    assert r["n_rows"] == 8 and r["n_classes"] == 3
    assert r["n_classes_below_k"] == 2 and r["n_rows_at_risk"] == 3
    assert r["risk_pct"] == 0.375
    assert r["min_class_size"] == 1 and r["max_class_size"] == 5


def test_canonical_dedup_vertical_tab_cross_engine(spark, ddb):
    """Code-review regression: Java's \\s includes vertical tab, RE2's
    does not — the explicit literal whitespace class must make both
    engines canonicalize a \\x0B-bearing document identically."""
    import pandas as pd

    from dataframeutils_spark.operators import dedup

    rows = [(1, "alpha\x0bbeta"), (2, "alpha beta"), (3, "alpha\tbeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in dedup.canonical_dedup(docs).collect()
    )
    ddb.execute("CREATE OR REPLACE TABLE vt_docs (doc_id BIGINT, text VARCHAR)")
    ddb.executemany("INSERT INTO vt_docs VALUES (?, ?)", rows)
    want = sorted(
        tuple(t)
        for t in ddb.execute(dedup.canonical_dedup_sql(table="vt_docs")).fetchall()
    )
    assert got == want
    # and the three variants all collapse into ONE canonical group
    assert len(got) == 1 and got[0][1] == 3


def test_k_anonymity_day_binning_pre_epoch_cross_engine(spark, ddb):
    """Code-review regression: integral `div` (Spark) and `//` (DuckDB)
    both truncate toward zero, so pre-1970 timestamps land in the same
    day bin on both engines (floor-of-float-division would not)."""
    micros = [-100_000_000_000, -1, 0, 1, 100_000_000_000]
    df = spark.createDataFrame([(m,) for m in micros], "us long")
    got = [
        r["day"]
        for r in df.select(F.expr("us div 86400000000").alias("day"))
        .orderBy("us")
        .collect()
    ]
    want = [
        t[0]
        for t in ddb.execute(
            "SELECT us // 86400000000 FROM (SELECT unnest(?) AS us) ORDER BY us",
            [micros],
        ).fetchall()
    ]
    assert got == want == [-1, 0, 0, 0, 1]


def test_minhash_signatures_match_exploded_formulation(spark):
    """The fused one-pass signature aggregate (num_perm inline hash
    columns, one min per doc, posexplode to long layout) must emit
    exactly the original explode-then-groupBy(doc, perm) formulation —
    same (doc_id, perm, min_hash) rows for both hash families."""
    df = docs_df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox naps under the lazy dog"),
            (3, "completely different content about parquet files"),
            (4, "xy"),  # below shingle width: absent from both
        ],
    )
    sh = dedup.shingles(df)
    for portable in (True, False):
        salted = F.concat(
            F.col("perm").cast("string"), F.lit(":"), F.col("shingle")
        )
        h = (
            dedup.portable_hash60(salted)
            if portable
            else dedup.fast_hash64(salted)
        )
        old = (
            sh.select(
                "doc_id",
                "shingle",
                F.explode(F.sequence(F.lit(0), F.lit(7))).alias("perm"),
            )
            .select("doc_id", "perm", h.alias("h"))
            .groupBy("doc_id", "perm")
            .agg(F.min("h").alias("min_hash"))
        )
        new = dedup.minhash_signatures(sh, num_perm=8, portable=portable)
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0


def test_minhash_lsh_pairs_match_long_layout(spark):
    """The fused band-hash fast path (band md5s computed directly from
    the wide min columns, no posexplode → collect_list round-trip)
    must emit exactly the long-layout composition
    lsh_candidate_pairs(minhash_signatures(...)) — same candidate-pair
    set for both hash families and for a non-default banding."""
    df = docs_df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox naps under the lazy dog"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "completely different content about parquet files"),
            (5, "more completely different content about parquet files"),
            (6, "xy"),  # below shingle width: no shingles, no pairs
        ],
    )
    sh = dedup.shingles(df)
    for portable in (True, False):
        for num_perm, bands in ((16, 4), (8, 2)):
            old = dedup.lsh_candidate_pairs(
                dedup.minhash_signatures(sh, num_perm=num_perm, portable=portable),
                num_perm=num_perm,
                bands=bands,
            )
            new = dedup.minhash_lsh_pairs(
                sh, num_perm=num_perm, bands=bands, portable=portable
            )
            assert new.exceptAll(old).count() == 0
            assert old.exceptAll(new).count() == 0
    # and the fast path actually finds the duplicate pairs
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(sh).collect()
    }
    assert (1, 3) in got

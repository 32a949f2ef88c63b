"""Count-min sketch, inverted index, embedding dim stats."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.operators import sketches


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------------------------
# count-min
# --------------------------------------------------------------------------


def test_countmin_sketch_size_bounded(spark):
    docs = _docs(spark, [(i, "a b c d e f g h") for i in range(20)])
    toks = docs.select(F.explode(F.split("text", " ")).alias("term"))
    sk = sketches.countmin_sketch(toks, depth=3, width=8)
    assert sk.count() <= 3 * 8


def test_countmin_never_undercounts(spark):
    # adversarially small width → heavy collisions; estimate must still
    # upper-bound the true count for every term
    rows = [(i, " ".join(f"t{j}" for j in range(i % 7 + 1))) for i in range(50)]
    out = sketches.countmin_profile(
        _docs(spark, rows), k=10, depth=3, width=4
    ).collect()
    assert len(out) > 0
    assert all(r["overcount"] >= 0 for r in out)
    assert all(r["n_est"] >= r["n_exact"] for r in out)


def test_countmin_exact_when_wide(spark):
    # width ≫ vocab → no collisions → estimates are exact
    rows = [(i, "alpha beta gamma") for i in range(10)]
    out = sketches.countmin_profile(
        _docs(spark, rows), k=5, depth=4, width=4096
    ).collect()
    assert all(r["overcount"] == 0 for r in out)
    assert {r["term"]: r["n_exact"] for r in out} == {
        "alpha": 10, "beta": 10, "gamma": 10
    }


# --------------------------------------------------------------------------
# inverted index
# --------------------------------------------------------------------------


def test_inverted_index_postings_and_df(spark):
    docs = _docs(
        spark,
        [
            (3, "apple banana"),
            (1, "apple cherry"),
            (2, "apple banana banana"),
            (4, "durian"),
        ],
    )
    out = {
        r["term"]: r
        for r in sketches.inverted_index(docs, max_postings=2, min_df=1).collect()
    }
    # df counts DISTINCT docs (banana twice in doc 2 counts once)
    assert out["banana"]["df"] == 2 and out["banana"]["postings"] == "2,3"
    # postings are the smallest doc_ids, capped at max_postings
    assert out["apple"]["df"] == 3 and out["apple"]["postings"] == "1,2"
    assert out["durian"]["df"] == 1


def test_inverted_index_min_df_filters(spark):
    docs = _docs(spark, [(1, "x y"), (2, "x z")])
    terms = {r["term"] for r in sketches.inverted_index(docs, min_df=2).collect()}
    assert terms == {"x"}


def test_inverted_index_salt_invariance(spark):
    # the salted two-phase bottom-k must give the same result as any
    # other salt count
    docs = _docs(spark, [(i, "common rare%d" % (i % 3)) for i in range(30)])
    a = sketches.inverted_index(docs, max_postings=5, n_salts=1).collect()
    b = sketches.inverted_index(docs, max_postings=5, n_salts=16).collect()
    key = lambda rows: sorted((r["term"], r["df"], r["postings"]) for r in rows)  # noqa: E731
    assert key(a) == key(b)


# --------------------------------------------------------------------------
# embedding dim stats
# --------------------------------------------------------------------------


def test_embedding_dim_stats(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 10.0]), (2, [3.0, 20.0]), (3, [5.0, 30.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["dim"]: r for r in sketches.embedding_dim_stats(emb).collect()}
    assert out[0]["n"] == 3 and abs(out[0]["mean"] - 3.0) < 1e-9
    assert abs(out[1]["mean"] - 20.0) < 1e-9
    assert out[0]["vmin"] == 1.0 and out[1]["vmax"] == 30.0
    assert abs(out[0]["std"] - 2.0) < 1e-9  # sample stddev of 1,3,5


def test_embedding_quantize_roundtrip_error_bounded(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -0.5]), (2, [0.5, 0.25]), (3, [-1.0, 0.125])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in sketches.embedding_quantize(emb).collect()}
    # max|v| per dim = 1.0, 0.5 → codes = v/scale*127
    assert out[1]["qvec"] == "127,-127"
    assert out[2]["qvec"] == "64,64"  # 0.5/1*127=63.5 → round half-up 64
    # reconstruction error bounded by scale/254 (half a code step)
    for r in out.values():
        assert r["max_abs_err"] <= 1.0 / 254 + 1e-12


def test_pq_quantize_codes_shape_and_nearest(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(20)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in sketches.pq_quantize(emb, m=2, k=4, dim=8).collect()}
    assert len(out) == 20
    # rebuild the hash-derived codebook independently and check the
    # argmin the operator claims
    import hashlib

    def comp(s, c, d):
        h = int(hashlib.md5(f"pq:{s}:{c}:{d}".encode()).hexdigest()[:15], 16)
        return h / float(2**59) - 1.0

    cb = np.array([[[comp(s, c, d) for d in range(4)] for c in range(4)] for s in range(2)])
    for vid, vec in vecs:
        x = np.array(vec, dtype=np.float32).astype(np.float64).reshape(2, 4)
        codes = [int(np.argmin(((x[s] - cb[s]) ** 2).sum(axis=1))) for s in range(2)]
        got = [int(c) for c in out[vid]["pq_codes"].split(",")]
        assert got == codes, vid
        want_err = sum(((x[s] - cb[s][codes[s]]) ** 2).sum() for s in range(2))
        assert abs(out[vid]["sq_err"] - want_err) < 1e-5


def test_pq_quantize_rejects_indivisible_dim(spark):
    emb = spark.createDataFrame([(1, [0.0] * 10)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        sketches.pq_quantize(emb, m=4, k=4, dim=10)


def test_pq_topk_matches_numpy_adc(spark):
    import hashlib

    import numpy as np

    rng = np.random.default_rng(11)
    vecs = [(i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(30)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = sketches.pq_topk(emb, k_neighbors=3, m=2, k=4, dim=8, query_mod=10).collect()

    def comp(s, c, d):
        h = int(hashlib.md5(f"pq:{s}:{c}:{d}".encode()).hexdigest()[:15], 16)
        return h / float(2**59) - 1.0

    cb = np.array([[[comp(s, c, d) for d in range(4)] for c in range(4)] for s in range(2)])
    X = np.array([v for _, v in vecs], dtype=np.float32).astype(np.float64).reshape(30, 2, 4)
    codes = np.array(
        [[int(np.argmin(((X[i, s] - cb[s]) ** 2).sum(axis=1))) for s in range(2)] for i in range(30)]
    )
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) == {0, 10, 20}
    for qid, rows in by_query.items():
        lut = ((X[qid][:, None, :] - cb) ** 2).sum(axis=2)  # m × k
        adc = {
            nid: sum(lut[s, codes[nid, s]] for s in range(2))
            for nid in range(30)
            if nid != qid
        }
        want = sorted(adc, key=lambda n: (adc[n], n))[:3]
        rows.sort(key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in rows] == want, qid
        for r in rows:
            assert abs(r["adc_dist"] - adc[r["neighbor_id"]]) < 1e-5


def test_ivfadc_routes_and_scores_consistently(spark):
    """Every IVFADC neighbor must share a probed inverted list with its
    query, and its ADC distance must equal the full-scan pq_topk ADC
    for the same (query, neighbor) pair."""
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = [(i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(40)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    kw = dict(m=2, k=4, dim=8, query_mod=10)
    adc_full = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in sketches.pq_topk(emb, k_neighbors=39, **kw).collect()
    }
    got = sketches.ivfadc_topk(
        emb, k_neighbors=5, n_centroids=4, n_probe=2, **kw
    ).collect()
    assert len(got) > 0
    for r in got:
        pair = (r["query_id"], r["neighbor_id"])
        assert pair in adc_full
        assert abs(r["adc_dist"] - adc_full[pair]) < 1e-9, pair
    # ranks are dense per query
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


# --------------------------------------------------------------------------
# bloom filter
# --------------------------------------------------------------------------


def test_bloom_no_false_negatives_ever(spark):
    # adversarially tiny filter (64 bits, 200 keys → saturated): every
    # true member MUST still claim membership — Bloom's one guarantee
    corpus = spark.createDataFrame([(f"k{i}",) for i in range(200)], "key string")
    out = sketches.bloom_membership(corpus, corpus, m_bits=64, k_hashes=3).collect()
    assert len(out) == 200
    assert all(r["claimed_member"] for r in out)
    assert not any(r["false_positive"] for r in out)


def test_bloom_words_bounded_and_mergeable(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "key string")
    m, k = 256, 3
    wa = {r["word_idx"]: r["word"] for r in sketches.bloom_words(a, m_bits=m, k_hashes=k).collect()}
    wb = {r["word_idx"]: r["word"] for r in sketches.bloom_words(b, m_bits=m, k_hashes=k).collect()}
    wu = {
        r["word_idx"]: r["word"]
        for r in sketches.bloom_words(a.union(b), m_bits=m, k_hashes=k).collect()
    }
    assert max(wu) <= m // 32 - 1
    merged = {i: wa.get(i, 0) | wb.get(i, 0) for i in set(wa) | set(wb)}
    assert merged == wu  # union of filters == OR of their words


def test_bloom_probe_side_broadcasts_filter(spark):
    corpus = spark.createDataFrame([(f"k{i}",) for i in range(100)], "key string")
    probes = spark.createDataFrame([(f"p{i}",) for i in range(10)], "key string")
    plan = (
        sketches.bloom_membership(corpus, probes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # the words join must broadcast


def test_bloom_shard_index_never_misses_and_skips(spark):
    from pyspark.sql import functions as F

    keys = spark.createDataFrame(
        [(f"k{i}", i % 4) for i in range(200)], "key string, shard int"
    )
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 200, 7)] + [("absent",)], "key string"
    )
    out = {
        r["key"]: r
        for r in sketches.bloom_skipping_audit(
            keys, probes, n_shards=4, m_bits=512, k_hashes=3
        ).collect()
    }
    for k, r in out.items():
        # the data-skipping contract: claimed ⊇ actual, never a miss
        assert r["n_shards_claimed"] >= r["n_shards_actual"], k
        assert r["n_false_pos"] == r["n_shards_claimed"] - r["n_shards_actual"]
        assert r["n_skipped"] == 4 - r["n_shards_claimed"]
    assert out["absent"]["n_shards_actual"] == 0
    present = [r for k, r in out.items() if k != "absent"]
    assert all(r["n_shards_actual"] == 1 for r in present)
    # with 50 keys/shard in 512 bits the filter must actually skip work
    assert sum(r["n_skipped"] for r in present) > 0


def test_bloom_shard_index_is_broadcast(spark):
    keys = spark.createDataFrame(
        [(f"k{i}", i % 4) for i in range(50)], "key string, shard int"
    )
    probes = spark.createDataFrame([(f"k{i}",) for i in range(5)], "key string")
    plan = (
        sketches.bloom_skipping_audit(keys, probes, n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _hll_rho_py(h: int, p: int) -> int:
    """Independent pure-Python reference for the register value."""
    w = h >> p
    width = 60 - p
    if w == 0:
        return width + 1
    return width - w.bit_length() + 1


def test_hll_rho_matches_python_reference(spark):
    import hashlib

    p = 10
    vals = [f"item{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "item string")
    regs = sketches.hll_registers(df, "item", (), p).collect()
    # recompute expected registers from the same portable 60-bit hash
    expected: dict[int, int] = {}
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        b = h % (1 << p)
        expected[b] = max(expected.get(b, 0), _hll_rho_py(h, p))
    got = {r["bucket"]: r["rho"] for r in regs}
    assert got == expected


def test_hll_registers_are_mergeable(spark):
    """Union-then-sketch == sketch-then-bucketwise-max — the property
    that lets shards/days merge without re-reading values."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "item string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(150, 450)], "item string"
    )
    direct = {
        r["bucket"]: r["rho"]
        for r in sketches.hll_registers(a.union(b), "item", (), 8).collect()
    }
    ra = sketches.hll_registers(a, "item", (), 8)
    rb = sketches.hll_registers(b, "item", (), 8)
    merged = {
        r["bucket"]: r["rho"]
        for r in ra.union(rb).groupBy("bucket").agg(F.max("rho").alias("rho")).collect()
    }
    assert merged == direct


def test_hll_estimate_within_expected_error(spark):
    """Standard error is ~1.04/sqrt(m); at p=10 that is ~3.3%, so 15%
    is a generous determinism-safe bound for one fixed stream."""
    n = 20000
    df = spark.createDataFrame([(f"v{i}",) for i in range(n)], "item string")
    regs = sketches.hll_registers(df, "item", (), 10)
    est = sketches.hll_estimate(regs, (), 10).collect()[0]["est"]
    assert abs(est - n) / n < 0.15


def test_hll_linear_counting_small_cardinality(spark):
    """Tiny streams must take the linear-counting branch and land very
    close to truth (the raw estimator is badly biased down there)."""
    df = spark.createDataFrame([(f"x{i}",) for i in range(40)], "item string")
    est = sketches.hll_estimate(
        sketches.hll_registers(df, "item", (), 10), (), 10
    ).collect()[0]["est"]
    assert abs(est - 40) <= 3


def test_hll_distinct_words_matches_duckdb_oracle(spark, ddb):
    from tests.conftest import SF_DIR, assert_matches_oracle

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = sketches.hll_distinct_words(docs, group_col="lang", p=10)
    assert_matches_oracle(
        out, ddb, sketches.hll_distinct_words_sql("documents", "lang", 10)
    )


def test_hll_estimate_high_rho_no_shift_wrap(spark):
    """rho >= 32 must shift a BIGINT one, not a 32-bit int (which would
    wrap the shift count mod 32): with all 1024 buckets at rho=40 the
    raw estimator is alpha*m^2 / (m * 2^-40) — a wrap to 2^-8 would be
    off by 2^32."""
    regs = spark.createDataFrame(
        [(b, 40) for b in range(1024)], "bucket int, rho int"
    )
    est = sketches.hll_estimate(regs, (), 10).collect()[0]["est"]
    expected = (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024 / (1024 * 2.0 ** -40)
    assert abs(est - expected) / expected < 1e-12


# ---------------------------------------------------------------------------
# histogram sketch
# ---------------------------------------------------------------------------


def test_hist_sketch_is_mergeable(spark):
    """Sum of per-chunk bin counts == bins of the union — per-shard
    histograms merge without re-reading values."""
    a = spark.createDataFrame([(float(i % 17),) for i in range(300)], "value double")
    b = spark.createDataFrame([(float(i % 5),) for i in range(200)], "value double")
    direct = {
        r["bin"]: r["cnt"]
        for r in sketches.hist_sketch(a.union(b), "value", (), 0.0, 17.0, 32).collect()
    }
    sa = sketches.hist_sketch(a, "value", (), 0.0, 17.0, 32)
    sb = sketches.hist_sketch(b, "value", (), 0.0, 17.0, 32)
    merged = {
        r["bin"]: r["cnt"]
        for r in sa.union(sb).groupBy("bin").agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert merged == direct


def test_hist_quantiles_within_one_bin_width(spark):
    """The estimator's guarantee: |est - exact| <= one bin width, and
    out-of-range values clamp into edge bins instead of vanishing."""
    import numpy as np

    vals = [float(v) for v in np.linspace(-3.0, 50.0, 1777)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    lo, hi, bins = -3.0, 50.0, 64
    width = (hi - lo) / bins
    sk = sketches.hist_sketch(df, "value", (), lo, hi, bins)
    assert sum(r["cnt"] for r in sk.collect()) == len(vals)
    out = sketches.hist_quantiles(sk, (0.1, 0.5, 0.9), (), lo, hi, bins).collect()
    assert len(out) == 3
    for r in out:
        exact = float(np.quantile(vals, r["q"]))
        assert abs(r["est"] - exact) <= width + 1e-9, (r, exact)


def test_hist_quantile_profile_matches_duckdb_oracle(spark, ddb):
    from tests.conftest import SF_DIR, assert_matches_oracle

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("event_type", "value")
    out = sketches.hist_quantile_profile(ev, "value", "event_type")
    assert_matches_oracle(
        out, ddb, sketches.hist_quantile_profile_sql("events", "value", "event_type")
    )


# ---------------------------------------------------------------------------
# K-Minimum-Values sketch
# ---------------------------------------------------------------------------


def test_kmv_sketch_is_mergeable(spark):
    """Re-slicing the concatenation of two shard sketches == sketching
    the union — the bottom-k algebra that lets per-shard sketches merge
    without re-reading items."""
    a = spark.createDataFrame([("g", f"x{i}") for i in range(400)], "grp string, item string")
    b = spark.createDataFrame([("g", f"x{i}") for i in range(200, 600)], "grp string, item string")
    k = 64
    direct = sketches.kmv_sketch(a.union(b), "item", "grp", k=k).collect()[0]
    sa = sketches.kmv_sketch(a, "item", "grp", k=k).collect()[0]
    sb = sketches.kmv_sketch(b, "item", "grp", k=k).collect()[0]
    merged = sorted(set(sa["sketch"]) | set(sb["sketch"]))[:k]
    assert merged == sorted(direct["sketch"])


def test_kmv_overlap_unsaturated_is_exact(spark):
    """Below k the sketch IS the set: union/intersection come out
    exactly, not approximately."""
    rows = [("a", f"s{i}") for i in range(30)] + [("b", f"s{i}") for i in range(20, 50)]
    df = spark.createDataFrame(rows, "grp string, item string")
    sk = sketches.kmv_sketch(df, "item", "grp", k=256)
    out = sketches.kmv_overlap(sk, k=256).collect()[0]
    assert out["n_a"] == 30 and out["n_b"] == 30
    assert out["est_union"] == 50.0
    assert out["est_inter"] == 10.0


def test_kmv_overlap_estimates_within_envelope(spark):
    """Saturated case: 4000 vs 4000 items sharing 2000 — estimates at
    k=256 should land within ~3 standard errors (~20%)."""
    rows = [("a", f"v{i}") for i in range(4000)] + [
        ("b", f"v{i}") for i in range(2000, 6000)
    ]
    df = spark.createDataFrame(rows, "grp string, item string")
    sk = sketches.kmv_sketch(df, "item", "grp", k=256)
    out = sketches.kmv_overlap(sk, k=256).collect()[0]
    assert abs(out["est_union"] - 6000) / 6000 < 0.20
    assert abs(out["est_inter"] - 2000) / 2000 < 0.35


def test_corpus_overlap_matches_duckdb_oracle(spark, ddb):
    from tests.conftest import SF_DIR, assert_matches_oracle

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = sketches.corpus_overlap(docs, group_col="source", n=3, k=64)
    assert_matches_oracle(
        out, ddb, sketches.corpus_overlap_sql("documents", "source", 3, 64)
    )


def test_hist_sketch_constant_column_degenerate_range(spark):
    """lo == hi (constant values) must not divide by zero: all rows in
    bin 0, every quantile estimate exactly lo."""
    df = spark.createDataFrame([(7.5,)] * 100, "value double")
    sk = sketches.hist_sketch(df, "value", (), 7.5, 7.5, 64)
    rows = sk.collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["cnt"] == 100
    out = sketches.hist_quantiles(sk, (0.5,), (), 7.5, 7.5, 64).collect()[0]
    assert out["est"] == 7.5


def test_join_size_estimate_upper_bounds_exact(spark):
    """est >= exact always (collisions only add); with width >> keys
    the estimate is exact; the exact side equals the true join size."""
    from dataframeutils_spark.operators import sketches

    left = spark.createDataFrame(
        [(i, i % 10) for i in range(200)], "row_id long, k long"
    )
    right = spark.createDataFrame(
        [(i, i % 5) for i in range(50)], "row_id long, k long"
    )
    r = sketches.join_size_estimate(left, right, "k", "k", depth=4, width=4096).collect()[0]
    assert r["n_left"] == 200 and r["n_right"] == 50
    # true join size: left has 20 rows per key 0..9; right 10 rows per key 0..4
    assert r["exact_size"] == 5 * 20 * 10
    assert r["est_size"] >= r["exact_size"]
    assert r["est_size"] == r["exact_size"]  # 15 keys, 4096 buckets: no collision
    assert r["over_ratio"] == 1.0


def test_join_size_estimate_collisions_only_overestimate(spark):
    """Tiny width forces collisions: the estimate may inflate but can
    never undershoot."""
    from dataframeutils_spark.operators import sketches

    left = spark.createDataFrame(
        [(i, i % 97) for i in range(500)], "row_id long, k long"
    )
    right = spark.createDataFrame(
        [(i, i % 89) for i in range(300)], "row_id long, k long"
    )
    r = sketches.join_size_estimate(left, right, "k", "k", depth=4, width=16).collect()[0]
    assert r["est_size"] >= r["exact_size"] > 0
    assert r["over_ratio"] >= 1.0


def test_join_size_estimate_fast_same_invariants(spark):
    """The xxhash production path keeps the exact side and the ≥1
    over-ratio; with a wide sketch it is collision-free here too."""
    from dataframeutils_spark.operators import sketches

    left = spark.createDataFrame(
        [(i, i % 10) for i in range(200)], "row_id long, k long"
    )
    right = spark.createDataFrame(
        [(i, i % 5) for i in range(50)], "row_id long, k long"
    )
    r = sketches.join_size_estimate(
        left, right, "k", "k", depth=4, width=4096, portable=False
    ).collect()[0]
    assert r["exact_size"] == 1000
    assert r["est_size"] >= r["exact_size"]
    assert r["over_ratio"] >= 1.0


def test_join_size_estimate_empty_join_is_zero(spark):
    """Disjoint key sets: a depth row with zero overlapping buckets
    proves the join is empty — est_size must be 0 (not an inflated
    collision sum), exact_size 0 (not NULL), over_ratio NULL (no
    defined ratio). This is exactly the CBO 'don't run this join at
    all' case the operator exists for."""
    from dataframeutils_spark.operators import sketches

    left = spark.createDataFrame([(i, i) for i in range(10)], "row_id long, k long")
    right = spark.createDataFrame(
        [(i, 1000 + i) for i in range(10)], "row_id long, k long"
    )
    r = sketches.join_size_estimate(left, right, "k", "k", depth=4, width=4096).collect()[0]
    assert r["exact_size"] == 0
    assert r["est_size"] == 0
    assert r["over_ratio"] is None
    # the xxhash production path handles the same case
    r = sketches.join_size_estimate(
        left, right, "k", "k", depth=4, width=4096, portable=False
    ).collect()[0]
    assert r["exact_size"] == 0 and r["est_size"] == 0 and r["over_ratio"] is None


def test_join_size_estimate_empty_join_oracle_parity(spark):
    """The DuckDB oracle mirrors the all-depth-rows / coalesce-to-0
    shape, so both engines report the empty join identically."""
    import duckdb

    from dataframeutils_spark.operators import sketches

    left = spark.createDataFrame([(i, i) for i in range(10)], "row_id long, k long")
    right = spark.createDataFrame(
        [(i, 1000 + i) for i in range(10)], "row_id long, k long"
    )
    got = sketches.join_size_estimate(left, right, "k", "k", depth=4, width=64).collect()[0]
    lvals = ", ".join(f"({i})" for i in range(10))
    rvals = ", ".join(f"({1000 + i})" for i in range(10))
    sql = sketches.join_size_estimate_sql(
        f"SELECT k FROM (VALUES {lvals}) t(k)",
        f"SELECT k FROM (VALUES {rvals}) t(k)",
        "k", "k", depth=4, width=64,
    )
    want = duckdb.connect().execute(sql).fetchdf().iloc[0]
    assert got["exact_size"] == want["exact_size"] == 0
    assert got["est_size"] == want["est_size"]
    assert got["over_ratio"] is None
    # pandas renders the SQL NULL as NaN
    assert want["over_ratio"] is None or want["over_ratio"] != want["over_ratio"]


def test_ivfadc_list_cap_bounds_and_consistency(spark):
    """list_cap bounds each probed list's candidates; surviving
    neighbors still share a probed list and score identically to the
    uncapped run for the same (query, neighbor) pair."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(80)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    kw = dict(k_neighbors=5, m=2, k=4, dim=8, n_centroids=4, n_probe=2,
              query_mod=10)
    full = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in sketches.ivfadc_topk(emb, **kw).collect()
    }
    capped = sketches.ivfadc_topk(emb, list_cap=8, **kw).collect()
    assert len(capped) > 0
    # capped candidate pool ⊆ probed lists → every capped pair that
    # also survived uncapped top-k carries the identical ADC distance
    for r in capped:
        pair = (r["query_id"], r["neighbor_id"])
        if pair in full:
            assert abs(r["adc_dist"] - full[pair]) < 1e-12
    # determinism: same cap → same output
    again = sketches.ivfadc_topk(emb, list_cap=8, **kw).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, again))

"""Unit tests for the web-corpus URL operators (operators/web.py):
normalization rules, registrable-domain suffix handling, canonical
dedup grouping, and the cross-engine oracles."""

from __future__ import annotations

from dataframeutils_spark.operators import web


def _norm(spark, url):
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    return web.url_normalize(df).collect()[0]


def test_url_normalize_rules(spark):
    r = _norm(
        spark,
        "HTTP://WWW.Shop.Example.COM:80/a/b/?utm_source=x&id=9&ref=tw#frag",
    )
    # scheme+host lowercased, www stripped, default port stripped,
    # trailing slash stripped, tracking params dropped, fragment gone
    assert r["norm_url"] == "http://shop.example.com/a/b?id=9"
    assert r["host"] == "shop.example.com"
    assert r["domain"] == "example.com"
    assert r["n_params_kept"] == 1 and r["n_params_dropped"] == 2


def test_url_normalize_keeps_explicit_port_and_sorts_params(spark):
    r = _norm(spark, "https://api.data.io:8080/v1?z=2&a=1")
    assert r["norm_url"] == "https://api.data.io:8080/v1?a=1&z=2"
    # :443 on https IS a default and goes away
    r2 = _norm(spark, "https://api.data.io:443/v1")
    assert r2["norm_url"] == "https://api.data.io/v1"


def test_url_registrable_domain_multipart_tld(spark):
    assert _norm(spark, "http://news.bbc.co.uk/x")["domain"] == "bbc.co.uk"
    assert _norm(spark, "http://a.b.shop.com.au/x")["domain"] == "shop.com.au"
    # bare two-label host is its own registrable domain
    assert _norm(spark, "http://data.io/x")["domain"] == "data.io"


def test_url_dedup_groups_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "http://www.example.com/p?id=1&utm_source=a"),
            (2, "HTTP://EXAMPLE.COM:80/p/?id=1"),
            (3, "http://example.com/p?id=1#frag"),
            (4, "http://example.com/p?id=2"),
        ],
        "doc_id long, url string",
    )
    groups = web.url_dedup(df).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_docs"] == 3 and g["keep_doc_id"] == 1
    assert g["n_distinct_raw"] == 3
    assert g["norm_url"] == "http://example.com/p?id=1"


def test_url_pipeline_matches_oracle(spark, ddb):
    """Fixture + normalize + dedup + domain report all byte-exact vs
    the DuckDB oracle at sf0.001, and the fixture guarantees dup
    groups (every 3 consecutive docs share one resource)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    u = web.url_table(docs)
    got = sorted(tuple(r) for r in web.url_normalize(u).collect())
    want = sorted(
        tuple(t) for t in ddb.execute(web.url_normalize_sql()).fetchall()
    )
    assert got == want and len(got) > 0
    gd = sorted(tuple(r) for r in web.url_dedup(u).collect())
    wd = sorted(tuple(t) for t in ddb.execute(web.url_dedup_sql()).fetchall())
    assert gd == wd and len(gd) > 0


def test_source_quality_drift_detects_planted_degradation(spark):
    """Plant one source whose quality DISTRIBUTION collapses in the
    new snapshot (good prose → punctuation soup): its PSI must alarm
    while an unchanged source stays quiet; a source present only in
    the new snapshot reports NULL ref fields and drifted=False."""
    from dataframeutils_spark.operators import pipeline as P

    good = "the quick brown fox jumps over the lazy dog again and again"
    bad = "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( ))) @@@ !!!"
    old_rows = [(i, good, "stable") for i in range(30)] + [
        (100 + i, good, "degrading") for i in range(30)
    ]
    new_rows = (
        [(i, good, "stable") for i in range(30)]
        + [(100 + i, bad, "degrading") for i in range(30)]
        + [(200 + i, good, "brand_new") for i in range(10)]
    )
    old = spark.createDataFrame(old_rows, "doc_id long, text string, source string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in P.source_quality_drift(old, new).collect()}
    assert out["degrading"]["drifted"] is True
    assert out["degrading"]["quality_psi"] > 0.2
    assert out["stable"]["drifted"] is False
    assert abs(out["stable"]["quality_psi"]) < 1e-6
    nb = out["brand_new"]
    assert nb["n_docs_ref"] is None and nb["n_docs_cur"] == 10
    assert nb["drifted"] is False and nb["quality_psi"] is None
    # quality-pass rates reflect the collapse
    assert out["degrading"]["qpass_rate_ref"] > out["degrading"]["qpass_rate_cur"]


def test_embedding_drift_detects_planted_centroid_shift(spark):
    """Two well-separated Gaussian classes: identical snapshots give
    centroid_cos ≈ 1 (no drift); shifting one class's vectors in the
    new snapshot alarms that class only."""
    import numpy as np

    from dataframeutils_spark.operators import similarity as S

    rng = np.random.RandomState(3)
    d = 8
    rows = []
    for lbl, center in ((0, 5.0), (1, -5.0)):
        pts = center + rng.randn(60, d) * 0.1
        for i, p in enumerate(pts):
            rows.append((lbl * 1000 + i, [float(x) for x in p], lbl))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from pyspark.sql import functions as F

    same = {r["label"]: r for r in S.embedding_drift(emb, emb).collect()}
    assert all(r["centroid_cos"] >= 0.999999 for r in same.values())
    assert not any(r["drifted"] for r in same.values())
    shifted = emb.select(
        "vec_id",
        F.when(
            F.col("label") == 1,
            F.transform(F.col("embedding"), lambda x: -x),
        ).otherwise(F.col("embedding")).alias("embedding"),
        "label",
    )
    out = {r["label"]: r for r in S.embedding_drift(emb, shifted).collect()}
    assert out[0]["drifted"] is False
    # flipped sign → centroid cosine ≈ -1, maximal drift
    assert out[1]["drifted"] is True and out[1]["centroid_cos"] < -0.99
    assert out[1]["centroid_shift"] > out[0]["centroid_shift"]


def test_encoding_audit_counts_planted_corruption(spark):
    """Hand-built corruption cases: each counter fires on exactly its
    pattern, clean ASCII passes the gate, corrupted text fails it."""
    from dataframeutils_spark.operators import cleaning

    docs = spark.createDataFrame(
        [
            (1, "clean ascii text only"),
            (2, "café went through latin1: cafÃ© naÃ¯ve"),  # 2 mojibake digraphs
            (3, "binary\x01junk\x02here"),                        # 2 control chars
            (4, "lost bytes �� end"),                   # 2 replacement chars
            (5, "中文文本 with some ascii"),                        # CJK mix
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cleaning.encoding_audit(docs).collect()}
    assert out[1]["enc_ok"] and out[1]["bad_ratio"] == 0.0
    assert out[1]["ascii_ratio"] == 1.0
    assert out[2]["n_mojibake"] == 2 and not out[2]["enc_ok"]
    assert out[3]["n_control"] == 2 and not out[3]["enc_ok"]
    assert out[4]["n_replacement"] == 2 and not out[4]["enc_ok"]
    assert out[5]["n_mojibake"] == out[5]["n_control"] == 0
    assert out[5]["cjk_ratio"] > 0.1 and out[5]["enc_ok"]
    # tab/newline are NOT control-char hits (they are legitimate text)
    ws = cleaning.encoding_audit(
        spark.createDataFrame([(9, "a\tb\nc")], "doc_id long, text string")
    ).collect()[0]
    assert ws["n_control"] == 0 and ws["enc_ok"]


def test_term_drift_statuses_and_shares(spark):
    """Planted head-term movement: a term flooding the new snapshot is
    'new' with a positive share delta; a term vanishing is 'dropped';
    stable terms are 'moved' with ~zero delta."""
    from dataframeutils_spark.operators import text as T

    old = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta"), (3, "alpha old old")],
        "doc_id long, text string",
    ).select("text")
    new = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta"),
         (3, "alpha spam spam spam spam")],
        "doc_id long, text string",
    ).select("text")
    out = {r["term"]: r for r in T.term_drift(old, new, k=4).collect()}
    assert out["spam"]["status"] == "new" and out["spam"]["share_delta"] > 0
    assert out["old"]["status"] == "dropped" and out["old"]["share_delta"] < 0
    assert out["alpha"]["status"] == "moved"
    # spam (4 hits) overtakes alpha (3) in the new snapshot's head
    assert out["alpha"]["rank_ref"] == 1 and out["alpha"]["rank_cur"] == 2
    assert out["spam"]["rank_cur"] == 1
    # shares are exact integer ratios of the snapshot token totals
    assert out["alpha"]["share_ref"] == round(3 / 9, 6)


def test_term_drift_corpus_level_counts(spark):
    """A term entering the top-k that ALREADY existed in the reference
    corpus (below its top-k) reports its TRUE ref count/share, not
    NULL (r12 advice): status 'new' is top-k membership only."""
    from dataframeutils_spark.operators import text as T

    old = spark.createDataFrame(
        [(1, "a a a b b c c rare")], "doc_id long, text string"
    ).select("text")
    new = spark.createDataFrame(
        [(1, "a a a rare rare rare b")], "doc_id long, text string"
    ).select("text")
    out = {r["term"]: r for r in T.term_drift(old, new, k=2).collect()}
    # ref top-2 = {a, b}; new top-2 = {a, rare}
    r = out["rare"]
    assert r["status"] == "new" and r["rank_ref"] is None
    assert r["cnt_ref"] == 1 and r["share_ref"] == round(1 / 8, 6)
    b = out["b"]
    assert b["status"] == "dropped" and b["rank_cur"] is None
    assert b["cnt_cur"] == 1 and b["share_cur"] == round(1 / 7, 6)


def test_path_stats_hand_computed(spark):
    """Planted URLs: depth counts path segments after normalization
    (trailing slash stripped), query share counts surviving params
    only (tracking params don't count), assets by extension."""
    from dataframeutils_spark.operators import web

    urls = spark.createDataFrame(
        [
            (1, "https://a.example.com/x/y/z"),
            (2, "https://a.example.com/x/?utm_source=t"),  # utm stripped
            (3, "https://a.example.com/img/logo.png"),
            (4, "https://a.example.com/p?id=3"),
        ],
        "doc_id long, url string",
    )
    r = web.path_stats(urls).collect()
    assert len(r) == 1
    row = r[0]
    assert row["domain"] == "example.com" and row["n_docs"] == 4
    # depths: 3, 1, 2, 1 -> avg 1.75, max 3
    assert row["avg_depth"] == 1.75 and row["max_depth"] == 3
    assert row["query_pct"] == 0.25  # only ?id=3 survives
    assert row["asset_pct"] == 0.25  # the .png

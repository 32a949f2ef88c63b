"""Unit + oracle-parity tests for the r11 operator families:
rank statistics (operators/rankstats.py), winnowing fingerprints
(operators/winnow.py), EWMA control chart (operators/trend.py),
token entropy / PMI collocations (operators/text.py).

The EWMA test additionally pins the DuckDB list-append-fold oracle
against an INDEPENDENT Python replay of the recursion — the oracle
deliberately avoids struct-accumulator list_reduce (DuckDB 1.0
inlines cross-field acc references; see ewma_control_sql), and this
test is the tripwire if a DuckDB upgrade changes fold semantics.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from dataframeutils_spark.operators import rankstats, text, winnow
from dataframeutils_spark.operators.trend import ewma_control, ewma_control_sql
from dataframeutils_spark.schema import PanelSchema, melt_panel

from tests.conftest import SF_DIR, assert_matches_oracle


# ---------------------------------------------------------------------------
# rank statistics — closed-form sanity on constructed data
# ---------------------------------------------------------------------------


def test_spearman_monotone_invariance(spark):
    """Spearman is rank-only: any strictly monotone transform of a
    feature leaves rho at exactly 1 against itself-transformed."""
    rows = [("g", float(i), math.exp(i / 7.0), -(i**3)) for i in range(40)]
    pdf = pd.DataFrame(rows, columns=["grp", "feature_1", "feature_2", "feature_3"])
    out = rankstats.spearman_corr(spark.createDataFrame(pdf)).toPandas()
    by = {r["pair"]: r["rho"] for _, r in out.iterrows()}
    assert by["feature_1|feature_2"] == pytest.approx(1.0)  # increasing
    assert by["feature_1|feature_3"] == pytest.approx(-1.0)  # decreasing
    assert by["feature_2|feature_3"] == pytest.approx(-1.0)


def test_mann_kendall_strictly_increasing(spark):
    """A strictly increasing series has S = m(m-1)/2 (every pair
    concordant), trend +1, and no tie correction."""
    import datetime as dt

    rows = [
        ("g", "f", dt.date(2020, 1, 1) + dt.timedelta(days=i), float(i))
        for i in range(60)
    ]
    pdf = pd.DataFrame(rows, columns=["grp", "feature", "date", "value"])
    out = rankstats.mann_kendall_trend(
        spark.createDataFrame(pdf), cap=320
    ).toPandas()
    assert len(out) == 1
    m = int(out["n_sampled"].iloc[0])
    assert int(out["s_stat"].iloc[0]) == m * (m - 1) // 2
    assert int(out["trend"].iloc[0]) == 1
    assert float(out["z"].iloc[0]) > 1.96


def test_mann_whitney_shifted_halves(spark):
    """Second half shifted far above the first → |z| large, drifted."""
    import datetime as dt

    rows = [
        ("g", "f", dt.date(2020, 1, 1) + dt.timedelta(days=i),
         float(i % 7) + (100.0 if i >= 30 else 0.0))
        for i in range(60)
    ]
    pdf = pd.DataFrame(rows, columns=["grp", "feature", "date", "value"])
    out = rankstats.mann_whitney_drift(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 1
    assert int(out["n1"].iloc[0]) == 30 and int(out["n2"].iloc[0]) == 30
    # side 1 (first half) holds the SMALL values → U1 = 0 exactly
    assert float(out["u_stat"].iloc[0]) == 0.0
    assert bool(out["drifted"].iloc[0])


def test_hill_exact_pareto(spark):
    """On x_(i) = C·(k+1 over i)^(1/a) order statistics the Hill
    estimator recovers 1/a exactly: ln(x_i/x_(k+1)) = ln((k+1)/i)/a."""
    a = 2.5
    k = 20
    n = 200
    rows = [
        (i, "t", float(((n + 1) / i) ** (1.0 / a))) for i in range(1, n + 1)
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "event_type", "value"])
    out = rankstats.hill_tail_index(
        spark.createDataFrame(pdf), k=k
    ).toPandas()
    want = sum(math.log(((n + 1) / i) ** (1 / a) / ((n + 1) / (k + 1)) ** (1 / a)) for i in range(1, k + 1)) / k
    assert float(out["hill"].iloc[0]) == pytest.approx(want, rel=1e-5)
    assert float(out["alpha"].iloc[0]) == pytest.approx(1 / want, rel=1e-5)


# ---------------------------------------------------------------------------
# winnowing — the SIGMOD-03 guarantee and the density theorem
# ---------------------------------------------------------------------------


def test_winnow_shared_passage_guarantee(spark):
    """Any shared substring of length ≥ kgram + window − 1 forces at
    least one shared selected fingerprint (the winnowing theorem) —
    structural recall, checked on docs sharing ONE long passage."""
    passage = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "AAAA xyzzy " + passage + " padding end one",
                    "BBBB totally different prefix " + passage + " qq",
                    "no shared passage here at all whatsoever okay",
                ],
            }
        )
    )
    pairs = winnow.winnow_neardup_pairs(
        docs, kgram=5, window=4, min_shared=1, max_df=64
    ).toPandas()
    got = {(int(r["doc_a"]), int(r["doc_b"])) for _, r in pairs.iterrows()}
    assert (1, 2) in got


def test_winnow_density_near_theorem(spark):
    """Expected selected density on random-ish text ≈ 2/(w+1); assert
    a generous band around it (and > 0 everywhere)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prof = winnow.winnow_profile(docs).toPandas()
    assert (prof["n_fingerprints"] > 0).all()
    med = prof["density"].median()
    assert 0.15 < med < 0.75  # 2/(4+1) = 0.4 nominal


def test_winnow_profile_matches_oracle(spark, ddb):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert_matches_oracle(
        winnow.winnow_profile(docs), ddb, winnow.winnow_profile_sql()
    )


def test_winnow_neardup_matches_oracle(spark, ddb):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert_matches_oracle(
        winnow.winnow_neardup_pairs(docs), ddb, winnow.winnow_neardup_sql()
    )


# ---------------------------------------------------------------------------
# EWMA — engine == oracle == independent Python replay
# ---------------------------------------------------------------------------

PANEL = PanelSchema(date_col="date", group_cols=["grp"])


def _python_ewma(vals, lam=0.2, limit_l=3.0):
    om, om2, ratio = 1.0 - lam, (1.0 - lam) ** 2, lam / (2.0 - lam)
    n = len(vals)
    mu = sum(vals) / n
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (n - 1))
    s, pw, viol, fv = mu, 1.0, 0, 0
    for i, v in enumerate(vals, 1):
        s = lam * v + om * s
        pw = pw * om2
        lim = limit_l * sd * math.sqrt(ratio * (1.0 - pw))
        if round(abs(s - mu) - lim, 6) > 0:
            viol += 1
            if fv == 0:
                fv = i
    return viol, fv, s


def test_ewma_matches_python_replay(spark, ddb):
    """Engine fold == DuckDB list-append-fold oracle == independent
    Python recursion on the real panel — the tripwire for any DuckDB
    lambda-semantics change AND for the Spark aggregate() path."""
    import duckdb  # noqa: F401

    from dataframeutils_spark.sources.testdata import lineitem_panel

    long_df = melt_panel(
        lineitem_panel(spark, SF_DIR), _panel_schema()
    )
    eng = ewma_control(long_df).toPandas()
    ora = ddb.execute(ewma_control_sql()).fetchdf()
    # replay one series independently in Python
    ser = (
        long_df.filter("feature = 'feature_1'")
        .toPandas()
        .dropna(subset=["value"])
    )
    grp = sorted(ser["grp"].unique())[0]
    vals = list(
        ser[ser["grp"] == grp].sort_values("date")["value"].astype(float)
    )
    viol, fv, s = _python_ewma(vals)
    for df in (eng, ora):
        row = df[(df["grp"] == grp) & (df["feature"] == "feature_1")].iloc[0]
        assert int(row["n_violations"]) == viol
        assert int(row["first_violation"]) == fv
        assert float(row["last_ewma"]) == pytest.approx(s, rel=1e-9)


def _panel_schema():
    from dataframeutils_spark.driver import PANEL_SCHEMA

    return PANEL_SCHEMA


def test_ewma_oracle_parity(spark, ddb):
    from dataframeutils_spark.sources.testdata import lineitem_panel

    long_df = melt_panel(lineitem_panel(spark, SF_DIR), _panel_schema())
    assert_matches_oracle(ewma_control(long_df), ddb, ewma_control_sql())


# ---------------------------------------------------------------------------
# token entropy / PMI
# ---------------------------------------------------------------------------


def test_token_entropy_uniform_and_degenerate(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["a b c d", "x x x x"],
            }
        )
    )
    out = text.token_entropy(docs).toPandas().set_index("doc_id")
    assert float(out.loc[1, "entropy"]) == pytest.approx(math.log(4), rel=1e-5)
    assert float(out.loc[1, "norm_entropy"]) == pytest.approx(1.0, rel=1e-5)
    assert float(out.loc[2, "entropy"]) == pytest.approx(0.0, abs=1e-9)
    assert out.loc[2, "norm_entropy"] != out.loc[2, "norm_entropy"] or out.loc[
        2, "norm_entropy"
    ] is None or pd.isna(out.loc[2, "norm_entropy"])  # NULL by contract


def test_pmi_perfect_collocation(spark):
    """A bigram that always co-occurs scores ln(N_bi·c12/(c1·c2)) with
    c12 = c1 = c2 — positive and ranked first."""
    rows = [(i, "alpha beta " + " ".join(f"w{j}{i}" for j in range(6))) for i in range(10)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = text.pmi_collocations(docs, k=5, min_count=5).toPandas()
    top = out[out["rank"] == 1].iloc[0]
    assert (top["w1"], top["w2"]) == ("alpha", "beta")
    assert float(top["pmi"]) > 0


# ---------------------------------------------------------------------------
# slate 3: winnow clusters / JS drift / rank transform / containment
# ---------------------------------------------------------------------------


def test_winnow_clusters_transitive_chain(spark):
    """A quotes B quotes C (A and C share nothing) → ONE cluster."""
    p1 = "the quick brown fox jumps over the lazy dog today"
    p2 = "pack my box with five dozen liquor jugs tonight ok"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "prefix one " + p1 + " suffix alpha beta gamma",
                    "mid " + p1 + " and also " + p2 + " more words",
                    "totally different opener " + p2 + " closer words",
                    "unrelated text with no shared passages anywhere",
                ],
            }
        )
    )
    out = winnow.winnow_clusters(docs, min_shared=1).toPandas()
    lab = {int(r["doc_id"]): int(r["cluster_id"]) for _, r in out.iterrows()}
    assert lab[1] == lab[2] == lab[3] == 1
    assert 4 not in lab  # singleton excluded
    assert out[out["doc_id"] == 1]["is_canonical"].iloc[0]


def test_containment_catches_embedded_quote(spark):
    """A short doc fully contained in a long one: jaccard low,
    containment 1.0, relation 'contains'."""
    from dataframeutils_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i}" for i in range(80))
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [quote, quote + " " + filler],
            }
        )
    )
    out = dedup.containment_pairs(docs, threshold=0.5).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert float(r["containment"]) == pytest.approx(1.0)
    assert float(r["jaccard"]) < 0.2
    assert r["relation"] == "contains"


def test_js_drift_shifted_halves(spark):
    import datetime as dt

    from dataframeutils_spark.operators.trend import js_drift

    rows = [
        ("g", "f", dt.date(2020, 1, 1) + dt.timedelta(days=i),
         float(i % 10) + (50.0 if i >= 40 else 0.0))
        for i in range(80)
    ]
    pdf = pd.DataFrame(rows, columns=["grp", "feature", "date", "value"])
    out = js_drift(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 1
    # disjoint supports → JS = ln 2, js_dist = 1
    assert float(out["js_div"].iloc[0]) == pytest.approx(math.log(2), rel=1e-4)
    assert float(out["js_dist"].iloc[0]) == pytest.approx(1.0, rel=1e-4)
    assert bool(out["drifted"].iloc[0])


def test_rank_transform_endpoints(spark):
    import datetime as dt

    from dataframeutils_spark.operators.features import rank_transform

    rows = [
        ("g", "f", dt.date(2020, 1, 1) + dt.timedelta(days=i), float(i * i))
        for i in range(11)
    ]
    pdf = pd.DataFrame(rows, columns=["grp", "feature", "date", "value"])
    out = rank_transform(spark.createDataFrame(pdf)).toPandas()
    by_val = out.sort_values("value")["pct"].tolist()
    assert by_val[0] == 0.0 and by_val[-1] == 1.0
    # strictly increasing values → pct is the uniform grid
    assert by_val == pytest.approx([i / 10 for i in range(11)])


def test_bh_fdr_textbook_example(spark):
    """m=10 p-values, α=0.25 — q-values must equal the published
    step-up formula q_i = min_{j≥i} p_(j)·m/j exactly, and the
    rejection set must be its level set (here the first 5 sorted
    hypotheses: q_(5) = 0.11·10/5 = 0.22 ≤ α)."""
    ps = [0.001, 0.019, 0.03, 0.069, 0.11, 0.21, 0.29, 0.34, 0.48, 0.62]
    pdf = pd.DataFrame(
        {
            "test": ["t"] * 10,
            "grp": [f"g{i}" for i in range(10)],
            "feature": ["f"] * 10,
            "p_value": ps,
        }
    )
    out = rankstats.bh_fdr(
        spark.createDataFrame(pdf), alpha=0.25
    ).toPandas().sort_values("bh_rank")
    # q_i = min_{j>=i} p_j * 10 / j
    m = 10
    qs = [min(ps[j] * m / (j + 1) for j in range(i, m)) for i in range(m)]
    for i in range(m):
        assert float(out.iloc[i]["q_value"]) == pytest.approx(qs[i], abs=1e-6)
    assert out["rejected"].tolist() == [q <= 0.25 for q in qs]
    assert sum(out["rejected"]) == 5


def test_bh_fdr_two_phase_equals_naive_global_rank(spark):
    """The two-phase bounded rank (range buckets + broadcast prefix
    offsets + within-bucket suffix min ∧ later-bucket min) must equal
    the naive single-window BH formulation row for row — including
    tied p-values within one bucket, p-values straddling bucket
    boundaries, and the p=0.0 / p=1.0 clamp edges."""
    import numpy as np

    rng = np.random.RandomState(7)
    n = 500
    # adversarial battery: heavy ties (2-decimal grid → many rows per
    # bucket), exact 0/1 edges, and a dense plateau in one bucket
    ps = np.round(rng.beta(0.5, 3.0, n), 2)
    ps[:5] = 0.0
    ps[5:10] = 1.0
    ps[10:60] = 0.25  # one hot bucket with 50 tied rows
    pdf = pd.DataFrame(
        {
            "test": ["t%d" % (i % 3) for i in range(n)],
            "grp": ["g%04d" % i for i in range(n)],
            "feature": ["f%d" % (i % 7) for i in range(n)],
            "p_value": ps,
        }
    )
    got = (
        rankstats.bh_fdr(spark.createDataFrame(pdf), alpha=0.05)
        .toPandas()
        .sort_values(["bh_rank"])
        .reset_index(drop=True)
    )
    # naive reference: global sort by (p, test, grp, feature)
    ref = pdf.sort_values(["p_value", "test", "grp", "feature"]).reset_index(
        drop=True
    )
    m = len(ref)
    qraw = ref["p_value"].to_numpy() * m / np.arange(1, m + 1)
    qs = np.minimum(1.0, np.minimum.accumulate(qraw[::-1])[::-1])
    assert got["bh_rank"].tolist() == list(range(1, m + 1))
    assert got["grp"].tolist() == ref["grp"].tolist()
    # the operator decimal-rounds q (decround, SIG_DIGITS places);
    # compare at that grain — the two-phase plumbing must not move q
    # by even one rounding quantum
    for i in range(m):
        assert float(got["q_value"][i]) == pytest.approx(qs[i], abs=5.1e-7), i
    assert got["rejected"].tolist() == [q <= 0.05 for q in qs]


def test_winnow_fingerprints_np_equals_count_window(spark):
    """n_positions now comes from length(text) − kgram + 1 at the scan
    instead of a COUNT(*) window over the exploded positions; pin the
    two formulations equal on edge-case docs (exactly one complete
    window, no complete window, below kgram)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataframeutils_spark.operators.winnow import (
        _PBITS,
        _keyed_positions,
        winnow_fingerprints,
    )

    kgram, window = 5, 4
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "abcdefgh",          # len 8 = kgram + window − 1: ONE window
                    "abcdefg",           # len 7: positions but no complete window
                    "abc",               # below kgram: no positions at all
                    "the quick brown fox jumps over the lazy dog",
                ],
            }
        )
    )
    keyed = _keyed_positions(docs, kgram, "text", "doc_id")
    wf = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, window - 1)
    )
    wn = Window.partitionBy("doc_id")
    old = (
        keyed.withColumn("_wmin", F.min("key").over(wf))
        .withColumn("_np", F.count("*").over(wn))
        .filter(F.col("p") <= F.col("_np") - (window - 1))
        .select("doc_id", F.col("_wmin").alias("key"))
        .distinct()
        .select(
            "doc_id",
            F.expr(f"key div {_PBITS}").alias("fp"),
            (F.lit(_PBITS - 1) - F.pmod(F.col("key"), F.lit(_PBITS))).alias(
                "pos_mod"
            ),
        )
    )
    new = winnow_fingerprints(docs, kgram, window)
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    # doc 1 has exactly one fingerprint, docs 2 and 3 none
    counts = dict(
        (r["doc_id"], r["n"])
        for r in new.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    )
    assert counts[1] == 1 and 2 not in counts and 3 not in counts

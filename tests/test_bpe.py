"""BPE trainer/encoder vs an independent pure-Python reference.

Exactness of the Spark trainer is pinned here AND in the DuckDB gate
(operators.bpe ships an in-SQL retrainer used as the driver oracle):
identical greedy semantics — max weighted pair count, ties broken
(left, right) lexicographic, left-to-right non-overlapping rule
application — must reproduce the reference merge list symbol for
symbol. The SQL oracle is additionally pinned against the same
pure-Python reference below, so a bug shared by both engines' query
text cannot hide."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from dataframeutils_spark.operators import bpe


def ref_bpe(texts: list[str], n_merges: int):
    """Reference implementation: word-frequency-table BPE with the
    module's exact tie rules."""
    wc = Counter(w for t in texts for w in t.lower().split() if w)
    seqs = {w: list(w) + [bpe.END_OF_WORD] for w in wc}
    rules = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, c in wc.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if n < 2:
            break
        rules.append((a, b, n))
        for w in seqs:
            out: list[str] = []
            for x in seqs[w]:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            seqs[w] = out
    return rules, seqs


TEXTS = [
    "the cat sat on the mat",
    "the cats eat the fish",
    "low lower lowest newer newest",
    "der die das die der den",
    "aaaa aaa aa aaaa",  # overlap stress: greedy left-to-right
    "the mat on the cat",
]


def test_bpe_train_matches_reference_exactly(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    table, rules = bpe.bpe_train(docs, n_merges=25, vocab_top=1000)
    got = [(r["left"], r["right"], r["pair_count"]) for r in table.orderBy("rank").collect()]
    want, _ = ref_bpe(TEXTS, 25)
    assert got == want
    assert rules == want  # driver-side list mirrors the table


def test_bpe_encode_matches_reference_token_counts(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    _, rules = bpe.bpe_train(docs, n_merges=25, vocab_top=1000)
    got = {r["doc_id"]: r for r in bpe.bpe_encode_stats(docs, rules).collect()}
    ref_rules, ref_seqs = ref_bpe(TEXTS, 25)
    for i, t in enumerate(TEXTS):
        n_tokens = sum(len(ref_seqs[w]) for w in t.lower().split())
        n_syms = sum(len(w) + 1 for w in t.lower().split())
        assert got[i]["n_tokens"] == n_tokens, t
        assert got[i]["n_symbols"] == n_syms
        assert got[i]["n_tokens"] <= got[i]["n_symbols"]


def test_bpe_encode_is_scan_side(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    _, rules = bpe.bpe_train(docs, n_merges=10, vocab_top=1000)
    plan = (
        bpe.bpe_encode_stats(docs, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # chained folds are one projection


def test_bpe_train_stops_below_min_count(spark):
    # every word unique -> every pair count 1 -> zero merges learned
    docs = spark.createDataFrame(
        [(0, "ab cd ef"), (1, "gh ij kl")], "doc_id long, text string"
    )
    table, rules = bpe.bpe_train(docs, n_merges=10, vocab_top=100)
    assert rules == [] and table.count() == 0


def test_bpe_train_require_full_raises_readably(spark):
    # the exact-gated driver wrappers pass require_full=True so the
    # engine/oracle early-stop asymmetry fails loudly, not as an
    # opaque gate row-count diff (r9 ADVICE)
    docs = spark.createDataFrame(
        [(0, "ab cd ef"), (1, "gh ij kl")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="early-stopped after 0/10"):
        bpe.bpe_train(docs, n_merges=10, vocab_top=100, require_full=True)


def test_bpe_encode_rejects_reserved_control_bytes(spark):
    # \x01/\x02 in corpus text would silently corrupt the
    # string-replace encode; the scan-side assert_true guard must fail
    # loudly instead (r9 ADVICE)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    clean = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog sat")], "doc_id long, text string"
    )
    _, rules = bpe.bpe_train(clean, n_merges=3, vocab_top=100)
    # clean corpus: guard is a no-op, stats unchanged
    got = bpe.bpe_encode_stats(clean, rules).orderBy("doc_id").collect()
    assert [r["n_words"] for r in got] == [3, 3]
    dirty = spark.createDataFrame(
        [(0, "the cat sat"), (7, "bad\x01byte here")],
        "doc_id long, text string",
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
        bpe.bpe_encode_stats(dirty, rules).collect()
    assert "reserved control byte" in str(ei.value)
    assert "doc 7" in str(ei.value)
    dirty2 = spark.createDataFrame(
        [(3, "word\x02boundary")], "doc_id long, text string"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        bpe.bpe_encode_stats(dirty2, rules).collect()
    # the guard must survive Catalyst column pruning: a projection
    # keeping only n_tokens (n_words pruned away) still trips it
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        bpe.bpe_encode_stats(dirty, rules).select("n_tokens").collect()
    # and NULL text is not corrupt — it propagates NULL counts as before
    nulls = spark.createDataFrame(
        [(9, None)], "doc_id long, text string"
    )
    row = bpe.bpe_encode_stats(nulls, rules).collect()[0]
    # zero counts + NULL ratio — exactly the oracle's wordless-doc model
    # (pre-r10 this path raised an ANSI divide-by-zero instead)
    assert (row["n_words"], row["n_symbols"], row["n_tokens"]) == (0, 0, 0)
    assert row["compression"] is None


def test_bpe_pack_manifest_invariants(spark):
    from dataframeutils_spark.operators import packing

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 3)], "doc_id long, text string"
    )
    _, rules = bpe.bpe_train(docs, n_merges=10, vocab_top=500)
    m = packing.pack_sequences_bpe(docs, rules, seq_len=32)
    summary = (
        m.groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("n"))
        .orderBy("seq_id")
        .collect()
    )
    # every sequence except the last is exactly full
    assert all(r["n"] == 32 for r in summary[:-1])
    assert 0 < summary[-1]["n"] <= 32
    # token conservation: manifest spans sum to the corpus token total
    total = sum(r["n"] for r in summary)
    enc = bpe.bpe_encode_stats(docs, rules)
    assert total == enc.agg(F.sum("n_tokens")).collect()[0][0]


def test_bpe_sql_oracle_matches_reference():
    """The in-SQL trainer/encoder (the driver's DuckDB oracle) must
    reproduce the pure-Python reference on the overlap-stress corpus —
    including 'aaaa aaa aa': string replace() on the separator-wrapped
    form must equal greedy left-to-right fold application. No Spark
    involved: this isolates the oracle side of the gate."""
    import duckdb

    from dataframeutils_spark.operators import packing

    n_merges = 8
    ref_rules, ref_seqs = ref_bpe(TEXTS, n_merges)
    assert len(ref_rules) == n_merges, "corpus must support all merges"

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(TEXTS))
    )
    got = con.execute(bpe.bpe_train_sql(n_merges=n_merges, vocab_top=2000)).fetchall()
    want = [
        (i + 1, left, r, left + r, n)
        for i, (left, r, n) in enumerate(ref_rules)
    ]
    assert got == want, (got, want)

    # encode oracle: per-doc token counts from the reference seqs
    enc = con.execute(
        bpe.bpe_encode_stats_sql(n_merges=n_merges, vocab_top=2000)
    ).fetchall()
    by_doc = {r[0]: r for r in enc}
    for doc_id, text in enumerate(TEXTS):
        words = [w for w in text.lower().split() if w]
        n_tokens = sum(len(ref_seqs[w]) for w in words)
        n_symbols = sum(len(w) + 1 for w in words)
        assert by_doc[doc_id][1] == len(words)
        assert by_doc[doc_id][2] == n_symbols
        assert by_doc[doc_id][3] == n_tokens

    # pack oracle: sequences fill completely except the last
    pk = con.execute(
        packing.pack_sequences_bpe_sql(n_merges=n_merges, vocab_top=2000, seq_len=16)
    ).fetchall()
    per_seq: dict = {}
    for seq_id, doc_id, doc_ofs, seq_ofs, n_tok in pk:
        per_seq[seq_id] = per_seq.get(seq_id, 0) + n_tok
    total = sum(len(ref_seqs[w]) for t in TEXTS for w in t.lower().split() if w)
    assert sum(per_seq.values()) == total
    last = max(per_seq)
    for s, n in per_seq.items():
        assert n == 16 or s == last


def test_encode_no_cross_word_merge_with_marker_in_text(spark):
    """Code-review regression: a corpus containing the end-of-word
    marker character itself (e.g. text ABOUT sentencepiece output)
    must still never merge across word boundaries — the \\x02 word
    joiner makes the between-words region unmatchable regardless of
    what rules exist."""
    docs = spark.createDataFrame(
        [(0, "cat bat"), (1, f"x{bpe.END_OF_WORD}y zz")],
        "doc_id long, text string",
    )
    # adversarial hand-made rule: left IS the end-of-word marker
    rules = [(bpe.END_OF_WORD, "b", 0)]
    got = {r["doc_id"]: r for r in bpe.bpe_encode_stats(docs, rules).collect()}
    # per-word greedy fold reference: no within-word (marker, b) pair
    # exists in 'cat'/'bat', so nothing merges: 4 + 4 tokens
    assert got[0]["n_tokens"] == 8
    # doc 1: word 'x▁y' has symbols [x, ▁, y, ▁] — no (▁, b) pair either
    assert got[1]["n_tokens"] == 4 + 3


def test_encode_equals_fold_property(spark):
    """Property test for the replace-vs-fold equivalence: across many
    random small corpora (including marker and repeated-char words),
    the string-replace encode's token counts must equal the pure-Python
    per-word greedy fold for the TRAINED rules of that corpus."""
    import random

    rng = random.Random(99)
    alphabet = "abc" + bpe.END_OF_WORD  # marker char in text on purpose
    for trial in range(6):
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(1, 8))
            )
            for _ in range(rng.randint(2, 6))
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        n_merges = rng.randint(1, 12)
        _, rules = bpe.bpe_train(docs, n_merges=n_merges, vocab_top=1000)
        ref_rules, ref_seqs = ref_bpe(texts, n_merges)
        assert rules == ref_rules, (trial, texts)
        got = {r["doc_id"]: r["n_tokens"] for r in bpe.bpe_encode_stats(docs, rules).collect()}
        for i, t in enumerate(texts):
            want = sum(len(ref_seqs[w]) for w in t.lower().split() if w)
            assert got[i] == want, (trial, t, rules)


def test_bpe_train_local_matches_distributed(spark):
    """The driver-local merge loop (bounded word-table collect) must
    learn exactly the distributed loop's rules — counts, tie-breaks
    and early-stop included."""
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    t_loc, r_loc = bpe.bpe_train(docs, n_merges=12, vocab_top=2000)
    t_dist, r_dist = bpe.bpe_train(
        docs, n_merges=12, vocab_top=2000, local_vocab_threshold=0
    )
    assert r_loc == r_dist
    assert t_loc.collect() == t_dist.collect()

"""Unigram-LM trainer/encoder vs an independent pure-Python reference
(the tests/test_bpe.py pattern).

The Spark trainer is iterative (not SQL-expressible), so exactness is
pinned here instead of the DuckDB gate: identical seeding, Viterbi tie
rules (higher score, then fewer pieces, then lexicographically smaller
boundary piece), hard-EM recounting, and deterministic pruning must
reproduce the reference vocabulary count for count.
"""

from __future__ import annotations

import math
from collections import Counter

from dataframeutils_spark.operators import unigram


def ref_viterbi(word, scores, max_len):
    """Reference DP, written forward over start positions (different
    code shape from the module's end-position loop, same tie spec)."""
    NEG = float("-inf")
    n = len(word)
    state = {0: (0.0, 0, "", -1)}
    best = [state.get(i, (NEG, 0, "", -1)) for i in range(n + 1)]
    best[0] = (0.0, 0, "", -1)
    for i in range(1, n + 1):
        cands = []
        for ln in range(1, min(max_len, i) + 1):
            j = i - ln
            piece = word[j:i]
            if piece in scores and best[j][0] != NEG:
                cands.append((best[j][0] + scores[piece], best[j][1] + 1, piece, j))
        if not cands:
            prev = best[i - 1]
            cands = [(prev[0] + unigram.UNK_SCORE, prev[1] + 1, word[i - 1 : i], i - 1)]
        best[i] = max(cands, key=lambda c: (c[0], -c[1], _neg_lex(c[2])))
    out = []
    i = n
    while i > 0:
        _, _, piece, j = best[i]
        out.append(piece)
        i = j
    return out[::-1]


class _neg_lex(str):
    """max() key helper: smaller string wins."""

    def __lt__(self, other):  # pragma: no cover - trivial
        return str.__gt__(self, other)

    def __gt__(self, other):  # pragma: no cover - trivial
        return str.__lt__(self, other)


def ref_unigram(
    texts,
    vocab_size,
    seed_size,
    max_piece_len=6,
    vocab_top=2000,
    em_rounds=2,
    shrink=0.75,
):
    wc = Counter(w for t in texts for w in t.lower().split() if w)
    words = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_top]
    # seed: all substrings <= max_piece_len, chars always kept
    sub = Counter()
    for w, c in words:
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                sub[w[i : i + ln]] += c
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1), key=lambda kv: (-kv[1], kv[0])
    )[:seed_size]
    counts = dict(chars)
    counts.update(dict(multi))

    def to_scores(cnts):
        floored = {p: (max(c, 1) if len(p) == 1 else c) for p, c in cnts.items()}
        total = sum(floored.values())
        return {p: math.log(c / total) for p, c in floored.items() if c > 0}

    def em(cnts):
        scores = to_scores(cnts)
        new = Counter()
        for w, c in words:
            for p in ref_viterbi(w, scores, max_piece_len):
                new[p] += c
        return {p: new.get(p, 0) for p in cnts if len(p) == 1 or new.get(p, 0) > 0}

    while True:
        for _ in range(em_rounds):
            counts = em(counts)
        n_multi = sum(1 for p in counts if len(p) > 1)
        n_chars = len(counts) - n_multi
        target_multi = max(vocab_size - n_chars, 0)
        if n_multi <= target_multi:
            break
        keep = max(target_multi, int(n_multi * shrink))
        survivors = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:keep]
        counts = {p: c for p, c in counts.items() if len(p) == 1}
        counts.update(dict(survivors))
    return counts, to_scores(counts)


TEXTS = [
    "the cat sat on the mat",
    "the cats eat the fish fisher fishing",
    "low lower lowest newer newest",
    "internationalization international nation nationalization",
    "aaaa aaa aa aaaa",
    "the mat on the cat",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_unigram_train_matches_reference_exactly(spark):
    table, scores = unigram.unigram_train(
        _docs(spark), vocab_size=40, seed_size=200, vocab_top=1000
    )
    got = {r["piece"]: r["cnt"] for r in table.collect()}
    want, ref_scores = ref_unigram(TEXTS, vocab_size=40, seed_size=200)
    assert got == want
    for p, lp in ref_scores.items():
        assert abs(scores[p] - lp) < 1e-12, p


def test_unigram_learns_shared_subwords(spark):
    table, _ = unigram.unigram_train(
        _docs(spark), vocab_size=40, seed_size=200, vocab_top=1000
    )
    pieces = {r["piece"] for r in table.collect()}
    # 'nation' recurs inside four words; a unigram LM must keep a
    # multi-char piece covering it
    assert any("nation" in p or p in "nation" and len(p) > 2 for p in pieces)
    assert any(len(p) > 1 for p in pieces)


def test_unigram_encode_matches_reference(spark):
    docs = _docs(spark)
    _, scores = unigram.unigram_train(
        docs, vocab_size=40, seed_size=200, vocab_top=1000
    )
    got = {r["doc_id"]: r for r in unigram.unigram_encode_stats(docs, scores).collect()}
    for i, t in enumerate(TEXTS):
        want_tokens = sum(
            len(ref_viterbi(w, scores, 6)) for w in t.lower().split()
        )
        assert got[i]["n_tokens"] == want_tokens, t
        assert got[i]["n_words"] == len(t.split())


def test_unigram_unknown_char_fallback(spark):
    docs = _docs(spark)
    _, scores = unigram.unigram_train(
        docs, vocab_size=40, seed_size=200, vocab_top=1000
    )
    # ψ never appeared in training: each unseen char costs one UNK token
    assert unigram._viterbi("catψψ", scores, 6)[-2:] == ["ψ", "ψ"]
    pieces = unigram._viterbi("ψ", scores, 6)
    assert pieces == ["ψ"]


def test_tokenizer_fertility_invariants(spark):
    from dataframeutils_spark.operators import bpe

    docs = spark.createDataFrame(
        [(i, t, "en" if i % 2 else "de") for i, t in enumerate(TEXTS)],
        "doc_id long, text string, lang string",
    )
    _, scores = unigram.unigram_train(docs, vocab_size=40, seed_size=200)
    _, rules = bpe.bpe_train(docs, n_merges=10, vocab_top=1000)
    rep = unigram.tokenizer_fertility(docs, scores, rules).collect()
    assert {r["lang"] for r in rep} == {"en", "de"}
    assert sum(r["n_docs"] for r in rep) == len(TEXTS)
    for r in rep:
        # every word is at least one token; a token is at least one char
        assert r["uni_fertility"] >= 1.0
        assert r["bpe_fertility"] >= 1.0
        assert r["uni_chars_per_tok"] >= 1.0
        assert r["bpe_syms_per_tok"] >= 1.0


def test_unigram_train_require_rounds_raises(spark):
    # vocab_size=3 forces prune rounds beyond the first EM pass; the
    # exact-gated wrappers pass require_rounds=1 so the engine/oracle
    # round-count asymmetry fails loudly (r10, the bpe require_full
    # pattern)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="converged after"):
        unigram.unigram_train(
            _docs(spark), vocab_size=3, seed_size=200, vocab_top=1000,
            em_rounds=1, shrink=0.6, require_rounds=1,
        )


def test_unigram_sql_oracle_matches_reference():
    """The in-SQL trainer/encoder (the driver's DuckDB oracle: seed →
    one recursive-CTE Viterbi-EM recount → final scores → encode DP)
    must reproduce the pure-Python reference. No Spark involved: this
    isolates the oracle side of the gate, exactly like
    test_bpe_sql_oracle_matches_reference."""
    import duckdb

    vocab_size, seed_size, vocab_top = 200, 150, 1000
    ref_counts, ref_scores = ref_unigram(
        TEXTS, vocab_size, seed_size, vocab_top=vocab_top,
        em_rounds=1, shrink=0.6,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(i, t, "en" if i % 2 else "de") for i, t in enumerate(TEXTS)],
    )

    # train oracle: counts exact, logprob to float noise (the oracle
    # siground-rounds; compare against the unrounded ref at 1e-6 rel)
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            unigram.unigram_train_sql(seed_size=seed_size, vocab_top=vocab_top)
        ).fetchall()
    }
    assert set(got) == set(ref_counts)
    for p, c in ref_counts.items():
        assert got[p][0] == c, (p, got[p], c)
        # oracle logprob is siground-rounded to 6 significant digits
        assert abs(got[p][1] - ref_scores[p]) <= 5e-6 * abs(ref_scores[p]), p

    # encode oracle: per-doc token counts vs ref_viterbi under the ref
    # final scores
    enc = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            unigram.unigram_encode_stats_sql(
                seed_size=seed_size, vocab_top=vocab_top
            )
        ).fetchall()
    }
    for i, t in enumerate(TEXTS):
        words = [w for w in t.lower().split(" ") if w]
        want_tok = sum(len(ref_viterbi(w, ref_scores, 6)) for w in words)
        assert enc[i] == (len(words), sum(map(len, words)), want_tok), (i, enc[i])

    # fertility oracle: token conservation against the encode oracle
    fert = con.execute(
        unigram.tokenizer_fertility_sql(
            n_merges=8, seed_size=seed_size, vocab_top=vocab_top
        )
    ).fetchdf()
    assert set(fert["lang"]) == {"en", "de"}
    assert int(fert["n_docs"].sum()) == len(TEXTS)
    assert (fert["uni_fertility"] >= 1.0).all()
    assert (fert["bpe_fertility"] >= 1.0).all()

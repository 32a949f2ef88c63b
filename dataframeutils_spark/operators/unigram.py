"""Unigram-LM subword tokenizer (Kudo 2018 — the SentencePiece unigram
model, the other major tokenizer family next to BPE): distributed
training + corpus encoding.

Same scale story as :mod:`dataframeutils_spark.operators.bpe`: the
corpus is scanned ONCE for the ``(word, count)`` table, capped to the
deterministic top-``vocab_top`` words — everything iterative runs over
that bounded frame, never the corpus, so training cost is independent
of corpus size after the one scan.

Algorithm (hard-EM / Viterbi-EM variant of the published model — the
E-step uses the single best segmentation instead of forward–backward
expectations, which keeps every count an integer and the whole
procedure engine-reproducible):

1. **Seed vocabulary**: all substrings (length ≤ ``max_piece_len``) of
   the top words, weighted by word count; keep the top ``seed_size`` by
   (count desc, piece asc), always including every single character.
2. **EM round**: Viterbi-segment each word under current piece scores
   (log-prob = log(count / total)), then re-count pieces weighted by
   word frequency. The segmentation is an Arrow-batched
   ``applyInPandas`` over the BOUNDED word table (one partition-local
   DP per word — Python is the right tool for a DP over ≤ 2k rows);
   the re-count is one map-side-combined groupBy.
3. **Prune**: drop the lowest-count multi-char pieces (keep ratio
   ``shrink`` per round, never below ``vocab_size``), then re-run EM;
   repeat until the vocabulary is at ``vocab_size``.

Driver work per round is collecting the piece table — bounded at
``seed_size`` rows by construction (the BPE trainer's bounded-collect
contract, just a table instead of one row).

Ties are pinned everywhere so the result is engine- and
implementation-reproducible: Viterbi prefers (higher score, then fewer
pieces, then lexicographically smaller piece at the boundary); pruning
and seeding order by (count desc, piece asc).

Training is inherently iterative → the driver queries get rows-only
gate checks; exactness is pinned in ``tests/test_unigram.py`` against
an independent pure-Python reference implementation with identical tie
rules (the BPE test pattern).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataframeutils_spark.operators.bpe import _word_table

UNK_SCORE = -20.0  # flat per-character penalty for unseen characters


def _viterbi(word: str, scores: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` into scored pieces.

    DP over end positions; every single character is guaranteed in the
    vocabulary, so a segmentation always exists. Tie rule (pinned): at
    equal score prefer fewer pieces, then the lexicographically smaller
    piece ending at this position.
    """
    n = len(word)
    NEG = float("-inf")
    # best[i] = (score, n_pieces, piece_ending_here, prev_index)
    best: list[tuple[float, int, str, int]] = [(0.0, 0, "", -1)] + [
        (NEG, 0, "", -1)
    ] * n
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            s = scores.get(piece)
            if s is None or best[j][0] == NEG:
                continue
            cand = (best[j][0] + s, best[j][1] + 1, piece, j)
            cur = best[i]
            if (
                cand[0] > cur[0]
                or (cand[0] == cur[0] and cand[1] < cur[1])
                or (cand[0] == cur[0] and cand[1] == cur[1] and cand[2] < cur[2])
            ):
                best[i] = cand
        if best[i][0] == NEG:
            # character unseen in training: emit it as its own UNK piece
            # with a flat penalty (standard unigram-LM inference
            # behavior) instead of poisoning every downstream position
            best[i] = (best[i - 1][0] + UNK_SCORE, best[i - 1][1] + 1, word[i - 1 : i], i - 1)
    out: list[str] = []
    i = n
    while i > 0:
        _, _, piece, j = best[i]
        out.append(piece)
        i = j
    return out[::-1]


def _seed_pieces(wt: DataFrame, max_piece_len: int, seed_size: int) -> DataFrame:
    """(piece, cnt): all ≤ max_piece_len substrings of the word table,
    top ``seed_size`` by (cnt desc, piece asc) with single chars always
    kept. Bounded: |words| × len × max_piece_len rows pre-aggregation."""
    subs = wt.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(F.lit(max_piece_len), F.length("word") - i + 1),
                        ),
                        lambda l: F.col("word").substr(i, l),
                    ),
                )
            )
        ).alias("piece"),
        "cnt",
    )
    counts = subs.groupBy("piece").agg(F.sum("cnt").alias("cnt"))
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(seed_size)
    )
    return chars.unionByName(multi)


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 400,
    seed_size: int = 2000,
    max_piece_len: int = 6,
    vocab_top: int = 2000,
    em_rounds: int = 2,
    shrink: float = 0.75,
    text_col: str = "text",
) -> tuple[DataFrame, dict[str, float]]:
    """Learn a unigram-LM vocabulary; returns (vocab table DataFrame,
    {piece: logprob} for :func:`unigram_encode_stats`).

    Vocab table columns: piece, cnt (final Viterbi count — integer by
    the hard-EM construction), logprob.
    """
    spark = docs.sparkSession
    wt = _word_table(docs, text_col, vocab_top).persist()
    pieces = {
        r["piece"]: int(r["cnt"])
        for r in _seed_pieces(wt, max_piece_len, seed_size).collect()
    }

    def em_counts(scores: dict[str, float]) -> dict[str, int]:
        b = spark.sparkContext.broadcast(scores)

        def seg(it):
            sc = b.value
            for pdf in it:
                rows = []
                for w, c in zip(pdf["word"], pdf["cnt"]):
                    for p in _viterbi(w, sc, max_piece_len):
                        rows.append((p, int(c)))
                yield pd.DataFrame(rows, columns=["piece", "cnt"])

        out = (
            wt.mapInPandas(seg, "piece string, cnt long")  # scan-side DP
            .groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"))
        )
        res = {r["piece"]: int(r["cnt"]) for r in out.collect()}
        b.unpersist()
        return res

    def to_scores(counts: dict[str, int]) -> dict[str, float]:
        # single characters are floored at count 1: they guarantee every
        # word stays segmentable (full coverage), even when the current
        # Viterbi solutions never use them
        floored = {
            p: (max(c, 1) if len(p) == 1 else c) for p, c in counts.items()
        }
        total = sum(floored.values())
        return {p: math.log(c / total) for p, c in floored.items() if c > 0}

    counts = pieces
    while True:
        for _ in range(em_rounds):
            scores = to_scores(counts)
            new = em_counts(scores)
            # chars must never leave the vocabulary (full coverage);
            # unused ones stay with count 0 at the floor
            counts = {
                p: new.get(p, 0)
                for p in counts
                if len(p) == 1 or new.get(p, 0) > 0
            }
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
    wt.unpersist()
    scores = to_scores(counts)
    table = spark.createDataFrame(
        sorted(
            ((p, int(c), scores[p]) for p, c in counts.items()),
            key=lambda r: (-r[1], r[0]),
        ),
        "piece string, cnt long, logprob double",
    )
    return table, scores


def unigram_encode_stats(
    docs: DataFrame,
    scores: dict[str, float],
    max_piece_len: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Viterbi-encode every document with the learned vocabulary and
    emit per-doc stats: n_words, n_chars_tok (characters entering the
    tokenizer), n_tokens, compression = chars/tokens.

    Arrow-batched ``mapInPandas`` with the broadcast vocabulary — the
    DP needs Python, but it runs scan-side: no shuffle, the text never
    leaves its partition, linear in corpus size.
    """
    spark = docs.sparkSession
    b = spark.sparkContext.broadcast(scores)
    from dataframeutils_spark.operators.text import _tokens

    base = docs.select(
        F.col(id_col),
        _tokens(F.lower(F.col(text_col))).alias("_words"),
    )

    def enc(it):
        sc = b.value
        for pdf in it:
            out = []
            for i, words in zip(pdf[id_col], pdf["_words"]):
                n_tok = 0
                n_chr = 0
                for w in words:
                    n_chr += len(w)
                    n_tok += len(_viterbi(w, sc, max_piece_len))
                out.append((i, len(words), n_chr, n_tok))
            yield pd.DataFrame(
                out, columns=[id_col, "n_words", "n_chars_tok", "n_tokens"]
            )

    res = base.mapInPandas(
        enc, f"{id_col} long, n_words int, n_chars_tok int, n_tokens int"
    )
    return res.withColumn(
        "compression",
        F.try_divide(F.col("n_chars_tok").cast("double"), F.col("n_tokens")),
    )


def tokenizer_fertility(
    docs: DataFrame,
    unigram_scores: dict[str, float],
    bpe_rules: list[tuple[str, str, int]],
    group_col: str = "lang",
    max_piece_len: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer evaluation: fertility (tokens per word) and
    chars-per-token for the trained unigram AND BPE vocabularies side
    by side — the standard multilingual tokenizer-quality report (a
    tokenizer that fragments one language 3× more than another skews
    that language's effective context length and training compute).

    One scan per tokenizer (both linear, zero text shuffle), one
    map-side-combined groupBy each, and a tiny (|groups|) join. Depends
    on the trained vocabularies → rows-only gate; the per-doc encoders
    it aggregates are reference-pinned in their own tests.
    """
    uni = unigram_encode_stats(
        docs, unigram_scores, max_piece_len=max_piece_len,
        id_col=id_col, text_col=text_col,
    ).join(docs.select(id_col, group_col), id_col)
    from dataframeutils_spark.operators.bpe import bpe_encode_stats

    bpe_st = bpe_encode_stats(
        docs, bpe_rules, id_col=id_col, text_col=text_col
    ).join(docs.select(id_col, group_col), id_col)
    u = uni.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_tokens") / F.sum("n_words")).alias("uni_fertility"),
        (F.sum("n_chars_tok") / F.sum("n_tokens")).alias("uni_chars_per_tok"),
    )
    b = bpe_st.groupBy(group_col).agg(
        (F.sum("n_tokens") / F.sum("n_words")).alias("bpe_fertility"),
        (F.sum("n_symbols") / F.sum("n_tokens")).alias("bpe_syms_per_tok"),
    )
    return u.join(b, group_col)

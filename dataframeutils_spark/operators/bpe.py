"""Byte-pair-encoding tokenizer: distributed training + corpus encoding.

A real (not regex-approximated) BPE subword tokenizer (Sennrich et al.
2016, ACL — the GPT-2/Llama tokenizer family), trained the classic way:
on the WORD-FREQUENCY table, never the raw corpus. That one design
choice is the whole scale story:

* The corpus is scanned ONCE to build ``(word, count)`` — at 100 TB the
  distinct-word table is orders of magnitude smaller than the corpus,
  and the trainer further caps it to the deterministic top-``vocab_top``
  words (count desc, word asc), so every training iteration runs over a
  small, broadcastable frame no matter the input size.
* Each of the ``n_merges`` rounds is: explode adjacent symbol pairs
  weighted by word count → one map-side-combined sum → a 1-row argmax
  collect (count desc, pair lexicographic — deterministic), then the
  winning rule is applied to the symbol arrays as a JVM-side
  ``aggregate`` fold (left-to-right greedy non-overlapping, the
  standard BPE application order). Driver work per round is ONE row.
* ``localCheckpoint`` every few rounds truncates the plan lineage, the
  same guard the connected-components and TextRank loops use.
* Encoding replays the learned rules in rank order as chained folds
  inside a single scan projection — no shuffle, no Python, linear.

Training is inherently iterative (each merge depends on the previous),
so the driver queries get rows-only gate checks; exactness is pinned in
``tests/test_bpe.py`` against an independent pure-Python reference
implementation with identical tie rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataframeutils_spark.operators.text import _tokens

END_OF_WORD = "▁"  # sentencepiece-style marker, appended per word


def _word_table(docs: DataFrame, text_col: str, vocab_top: int) -> DataFrame:
    words = docs.select(
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(vocab_top)
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """One BPE rule as a left-to-right greedy fold (JVM-side)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 30,
    vocab_top: int = 2000,
    text_col: str = "text",
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Learn ``n_merges`` BPE rules; returns (merge table DataFrame,
    the same rules as a driver-side list for :func:`bpe_encode`).

    Merge table columns: rank (1-based), left, right, merged,
    pair_count (the weighted occurrence count that won the round).
    """
    spark = docs.sparkSession
    wt = _word_table(docs, text_col, vocab_top)
    seqs = wt.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
        "cnt",
    ).persist()
    seqs.count()
    rules: list[tuple[str, str, int]] = []
    cur = seqs
    for rank in range(1, n_merges + 1):
        pairs = cur.select(
            F.posexplode(F.slice(F.col("syms"), F.lit(1), F.size("syms") - 1)).alias(
                "i", "left"
            ),
            F.col("syms"),
            "cnt",
        ).select(
            "left",
            F.element_at(F.col("syms"), F.col("i") + 2).alias("right"),
            "cnt",
        )
        top = (
            pairs.groupBy("left", "right")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        left, right, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        rules.append((left, right, n))
        cur = cur.select(_apply_merge(F.col("syms"), left, right).alias("syms"), "cnt")
        if rank % 5 == 0:
            # truncate lineage: 5 chained HOF folds per checkpoint
            cur = cur.localCheckpoint(eager=True)
    seqs.unpersist()
    table = spark.createDataFrame(
        [
            (i + 1, l, r, l + r, n)
            for i, (l, r, n) in enumerate(rules)
        ],
        "rank int, left string, right string, merged string, pair_count long",
    )
    return table, rules


def bpe_encode_stats(
    docs: DataFrame,
    rules: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document with the learned rules (rank order, chained
    scan-side folds — zero shuffle, zero Python) and emit per-doc
    stats: n_words, n_chars, n_tokens, compression = chars+words (the
    pre-merge symbol count incl. end-of-word markers) / tokens."""
    syms = F.transform(
        _tokens(F.lower(F.col(text_col))),
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(END_OF_WORD))),
    )
    def rule_pass(left: str, right: str):
        # closure factory: a default-arg lambda would change the arity
        # PySpark infers for the HOF callback
        def apply_one(ws: Column) -> Column:
            return _apply_merge(ws, left, right)

        return apply_one

    enc = syms
    for left, right, _ in rules:
        enc = F.transform(enc, rule_pass(left, right))
    flat_pre = F.flatten(syms)
    flat_post = F.flatten(enc)
    return docs.select(
        id_col,
        F.size(_tokens(F.lower(F.col(text_col)))).alias("n_words"),
        F.size(flat_pre).alias("n_symbols"),
        F.size(flat_post).alias("n_tokens"),
        (F.size(flat_pre).cast("double") / F.size(flat_post)).alias("compression"),
    )

"""Trainable byte-pair-encoding (BPE) tokenizer over a distributed corpus.

The missing last piece of a training-data pipeline: not just counting
pre-tokens (functions/textstats) but LEARNING a subword vocabulary
from the corpus and tokenizing with it.

Training uses the standard two-stage distillation (Sennrich et al.
2016, ACL — the same shape HuggingFace tokenizers / SentencePiece
use):

1. DISTRIBUTED word table: collapse the corpus to (word, count) —
   one scan + one shuffle on the word.  The table is bounded by the
   number of DISTINCT pre-tokens (Heaps' law, sublinear in corpus
   size), not by corpus bytes: this is the only corpus-sized stage,
   and the reason BPE training scales to 100 TB at all.
2. DRIVER merge learning: greedy most-frequent-adjacent-pair merges
   over the word table with an inverted pair->words index (only
   words containing the merged pair are touched per round).
   Deterministic tie-break: highest count, then lexicographically
   smallest pair — retraining on any partitioning of the same corpus
   yields byte-identical merges.
3. DISTRIBUTED encode: broadcast the merge ranks to an Arrow-batched
   kernel; each word merges its lowest-rank adjacent pair repeatedly
   (the canonical BPE encoder), memoized per distinct word per batch.

Symbols are characters; each word carries a terminal end-of-word
marker so "est" inside a word and "est" ending a word are distinct
subwords (the classic formulation).
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

EOW = "▁"  # end-of-word marker (block char, same choice as SentencePiece)

# The trainer splits with Spark's Java-regex \s+, which is ASCII-only
# ([ \t\n\x0B\f\r]).  The encode kernel MUST split identically —
# Python's str.split() treats Unicode whitespace (U+00A0, U+2009, …)
# as separators where Java \s does not, which would tokenize words
# the trainer never saw and break the corpus-wide roundtrip gate.
_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")


def _split_words(text: str) -> list[str]:
    return [w for w in _WS_RE.split(text) if w]


# ------------------------------------------------------------------ #
# stage 1: distributed word table
# ------------------------------------------------------------------ #


def word_counts(df: DataFrame, col: str) -> DataFrame:
    """(word, n) over whitespace-split pre-tokens — one scan, one
    shuffle, map-side partial aggregation.  Words containing the
    end-of-word marker are rejected in-plan (they would corrupt the
    symbol alphabet)."""
    w = F.explode(F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+")).alias("word")
    guarded = F.when(
        F.col("word").contains(EOW),
        F.raise_error(F.concat(F.lit("word_counts: input contains the EOW marker: "), F.col("word"))),
    ).otherwise(F.col("word"))
    return (
        df.select(w)
        .where(F.col("word") != "")
        .select(guarded.alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------------------------ #
# stage 2: driver-side merge learning
# ------------------------------------------------------------------ #


def learn_bpe(words: Iterable[tuple[str, int]], num_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE merges from a (word, count) table.

    Deterministic: ties on pair count break to the lexicographically
    smallest (a, b).  Stops early when no adjacent pair occurs twice.
    Incremental: an inverted pair->word-ids index means each round
    REWRITES only the words containing the merged pair, and exhausted
    pairs are deleted at the moment their count hits zero (no
    end-of-round dict rebuild).  The best-pair argmax is still a scan
    of the live pair set per round — at word-table scale that scan is
    cheap relative to the rewrites; a lazy max-heap is the upgrade
    path if it ever isn't.  Results identical to naive recounting,
    pinned by test."""
    syms: list[list[str]] = []
    counts: list[int] = []
    for word, n in words:
        if not word:
            continue
        syms.append(list(word) + [EOW])
        counts.append(int(n))
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word_pairs(wi: int, sign: int) -> None:
        s = syms[wi]
        for a, b in zip(s, s[1:]):
            p = (a, b)
            c = pair_counts.get(p, 0) + sign * counts[wi]
            if c > 0:
                pair_counts[p] = c
                if sign > 0:
                    pair_words.setdefault(p, set()).add(wi)
            else:
                # exhausted: drop the key NOW so per-round cost stays
                # proportional to the touched words (no end-of-round
                # full-dict rebuild)
                pair_counts.pop(p, None)
                pair_words.pop(p, None)

    for wi in range(len(syms)):
        add_word_pairs(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c < 2:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        (a, b), _ = best
        merged = a + b
        merges.append((a, b))
        for wi in list(pair_words.get((a, b), ())):
            add_word_pairs(wi, -1)
            s = syms[wi]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[wi] = out
            add_word_pairs(wi, +1)
        # the merged pair's count hit zero in the subtract pass above
        # (pair_words never under-covers: every +1 add registers wi);
        # pop defensively in case of stale extras
        pair_counts.pop((a, b), None)
        pair_words.pop((a, b), None)
    return merges


def train_bpe(
    df: DataFrame, col: str, num_merges: int, *, min_count: int = 1
) -> list[tuple[str, str]]:
    """Distributed word table → driver merge learning.  The collect
    is the word TABLE (distinct pre-tokens), not the corpus — the
    documented scale contract of stage 2.  ``min_count`` prunes
    hapax/near-hapax words BEFORE the collect (the HF
    ``min_frequency`` knob): on web-scale corpora the distinct-word
    tail is dominated by typos/URLs/code identifiers, so pruning
    bounds driver memory.  Note it is an approximation — pruned
    words' pair counts are gone, which can flip near-tied merges;
    that is the standard trade every production BPE trainer makes."""
    wc = word_counts(df, col)
    if min_count > 1:
        wc = wc.where(F.col("n") >= min_count)
    rows = wc.collect()
    return learn_bpe(((r["word"], r["n"]) for r in rows), num_merges)


# ------------------------------------------------------------------ #
# stage 3: distributed encode
# ------------------------------------------------------------------ #


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical BPE encode of one word: repeatedly merge the
    lowest-rank adjacent pair."""
    s = list(word) + [EOW]
    while len(s) > 1:
        best_i = -1
        best_r = None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r, best_i = r, i
        if best_r is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


def with_bpe_tokens(
    df: DataFrame,
    col: str,
    merges: list[tuple[str, str]],
    *,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Adds ``out_col: array<string>`` — the BPE tokenization of the
    whitespace pre-tokens of ``col``, flattened in order.  Pure map
    over a broadcast merge table (no shuffle); Arrow-batched."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(list(merges))

    @F.pandas_udf("array<string>")
    def _tok(texts: pd.Series) -> pd.Series:
        ranks = {tuple(p): i for i, p in enumerate(b.value)}
        memo: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in _split_words(text):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, _tok(F.col(col)))


def bpe_token_count(
    df: DataFrame, col: str, merges: list[tuple[str, str]], *, out_col: str = "bpe_token_count"
) -> DataFrame:
    """Adds ``out_col: long`` — BPE token count per row (the
    sequence-length column packing/truncation budgets want)."""
    tokens_col = "__bpe_toks"
    out = with_bpe_tokens(df, col, merges, out_col=tokens_col)
    return out.withColumn(out_col, F.size(tokens_col).cast("long")).drop(tokens_col)

"""Novelty scoring: per-document fraction of shingles unseen in a
reference corpus — Bloom-accelerated but EXACT.

The curation use-case: when growing a training corpus, score each
candidate document by how much genuinely new n-gram content it adds
relative to the already-ingested reference corpus.  The score is the
exact distinct-shingle novelty fraction

    novelty(d) = |shingles(d) \\ U_ref| / |shingles(d)|

where U_ref is the union of the reference corpus's distinct shingles.

Why a Bloom filter makes the EXACT computation cheap at 100 TB
(reference semantics: `BloomFilter.hpp:237-262` membership; the same
sideways-information-passing idea as operators/bloomjoin.py):

  - Build ONE filter over U_ref (reduce-scatter blob via
    plans/agg.build_sketch — no shuffle of the reference shingles
    beyond the build's own partial-merge tree, and the blob is
    persistable via sources/bfio for reuse across candidate shards).
  - Probe every candidate shingle against the broadcast blob as a
    PURE MAP.  A Bloom filter has NO false negatives, so every MISS
    is *certainly novel* — those shingles are counted map-side and
    never enter a join.
  - Only the HITS (true overlaps + ~fpr of the novel ones) pay the
    exact anti-join against U_ref that removes false positives.

With overlap fraction s, the join exchange carries s + fpr*(1-s) of
the candidate shingles instead of all of them; a candidate corpus
that is mostly novel (the interesting case when curating) shuffles
almost nothing.  The result is byte-identical to the naive full
anti-join (pinned by tests), which is what makes the operator
hash-oracle-able against plain NOT IN / anti-join SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.probe import bloom_contains
from .bloom import BloomFilter
from .bloomjoin import build_key_filter
from .dedup import shingles


def reference_shingles(ref_docs: DataFrame, col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct shingle universe of the reference corpus: (shingle)."""
    return shingles(ref_docs, col, id_col, n).select("shingle").distinct()


def build_reference_filter(
    ref_sh: DataFrame, *, fpr: float = 0.01, capacity: int | None = None
) -> BloomFilter:
    """Whole-string (k=0) Bloom over the reference shingle universe.

    Persist with sources/bfio.store_filter to reuse across candidate
    shards (same pattern as jobs/decontaminate.py)."""
    return build_key_filter(ref_sh.withColumnRenamed("shingle", "k"), "k", fpr=fpr, capacity=capacity)


def novelty_scores(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    fpr: float = 0.01,
    bloom: BloomFilter | None = None,
    ref_sh: DataFrame | None = None,
) -> DataFrame:
    """Exact per-document novelty vs a reference corpus.

    Returns (id, total_shingles, novel_shingles, novelty) — one row
    per candidate document that has at least one shingle; novelty is
    round(novel/total, 6).  Documents shorter than ``n`` tokens have
    no shingles and produce no row (callers wanting them can
    left-join back and coalesce).

    ``bloom=`` / ``ref_sh=`` let a caller reuse a prebuilt filter /
    shingle universe across shards; by default both derive from
    ``ref_docs``.
    """
    spark = new_docs.sparkSession
    if ref_sh is None:
        # ONE materialization serves all three consumers (sizing
        # count, filter build, FP-resolving anti-join): the r5 shape
        # persisted across the first two then unpersisted, so the
        # anti-join re-ran the reference tokenize+distinct a third
        # time at action time.  localCheckpoint keeps the materialized
        # universe alive for the returned plan without a caller-owned
        # unpersist; callers at shard scale still pass ref_sh=/bloom=.
        ref_sh = reference_shingles(ref_docs, col, id_col, n).localCheckpoint(
            eager=True
        )
    if bloom is None:
        capacity = ref_sh.count()
        bloom = build_reference_filter(ref_sh, fpr=fpr, capacity=capacity)
    if bloom.k != 0:
        raise ValueError("reference filter must be a whole-string (k=0) BloomFilter")

    cand = shingles(new_docs, col, id_col, n)  # (id, shingle) distinct
    maybe_seen = bloom_contains(spark, bloom, F.col("shingle"))
    # Misses are certainly novel (no false negatives): tag map-side.
    # Hits may be false positives: resolve with the exact anti-join,
    # which only the (small) hit slice pays for.  Materialized once:
    # both the per-doc totals and the FP branch consume it, and the
    # candidate tokenize + Bloom probe are the expensive map work.
    tagged = cand.withColumn("_maybe", maybe_seen).localCheckpoint(eager=True)
    hits_novel = (
        tagged.where(F.col("_maybe"))
        .join(ref_sh, "shingle", "left_anti")  # FP survivors are novel
        .groupBy("id")
        .agg(F.count("*").alias("_fp_novel"))
    )
    per_doc = tagged.groupBy("id").agg(
        F.count("*").alias("total_shingles"),
        F.sum(F.when(~F.col("_maybe"), 1).otherwise(0)).alias("_miss_novel"),
    )
    out = (
        per_doc.join(hits_novel, "id", "left")
        .withColumn(
            "novel_shingles",
            (F.col("_miss_novel") + F.coalesce(F.col("_fp_novel"), F.lit(0))).cast("long"),
        )
        .withColumn("novelty", F.round(F.col("novel_shingles") / F.col("total_shingles"), 6))
        .select("id", "total_shingles", "novel_shingles", "novelty")
    )
    return out


def novelty_scores_naive(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
) -> DataFrame:
    """Reference implementation: full anti-join, no Bloom pre-filter.
    Same exact result as :func:`novelty_scores` (parity pinned by
    tests); kept as the comparison baseline and for tiny inputs where
    building a filter isn't worth it."""
    ref_sh = reference_shingles(ref_docs, col, id_col, n)
    cand = shingles(new_docs, col, id_col, n)
    novel = cand.join(ref_sh, "shingle", "left_anti").groupBy("id").agg(
        F.count("*").alias("novel_shingles")
    )
    total = cand.groupBy("id").agg(F.count("*").alias("total_shingles"))
    return (
        total.join(novel, "id", "left")
        .withColumn("novel_shingles", F.coalesce(F.col("novel_shingles"), F.lit(0)).cast("long"))
        .withColumn("novelty", F.round(F.col("novel_shingles") / F.col("total_shingles"), 6))
        .select("id", "total_shingles", "novel_shingles", "novelty")
    )

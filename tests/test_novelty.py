"""Novelty scoring: Bloom-accelerated exact path vs naive anti-join
parity, hand-computed values, filter/universe reuse, and the
no-false-negative accounting law."""

import pytest
from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.novelty import (
    build_reference_filter,
    novelty_scores,
    novelty_scores_naive,
    reference_shingles,
)


@pytest.fixture(scope="module")
def corpus(spark):
    ref = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [
            # identical to ref doc 1 -> novelty 0
            (10, "the quick brown fox jumps over the lazy dog"),
            # fully disjoint vocabulary -> novelty 1
            (11, "alpha beta gamma delta epsilon zeta"),
            # shares its first 3-gram with ref doc 1 only
            (12, "the quick brown elephant sits down"),
            # too short for a 3-gram -> no output row
            (13, "just two"),
        ],
        "doc_id int, text string",
    )
    return ref, new


def _as_map(df):
    return {r["id"]: (r["total_shingles"], r["novel_shingles"], r["novelty"]) for r in df.collect()}


def test_hand_computed_values(spark, corpus):
    ref, new = corpus
    got = _as_map(novelty_scores(new, ref))
    # doc 10: 7 distinct 3-grams, all present in ref
    assert got[10] == (7, 0, 0.0)
    # doc 11: 4 distinct 3-grams, none present
    assert got[11] == (4, 4, 1.0)
    # doc 12: 4 distinct 3-grams, exactly 'the quick brown' is shared
    assert got[12] == (4, 3, 0.75)
    assert 13 not in got  # shorter than n tokens -> no shingles


def test_parity_with_naive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    ref = docs.where(F.col("doc_id") <= half)
    new = docs.where(F.col("doc_id") > half)
    fast = novelty_scores(new, ref, fpr=0.05).orderBy("id").collect()
    naive = novelty_scores_naive(new, ref).orderBy("id").collect()
    assert fast == naive  # exact despite the lossy pre-filter


def test_reuse_prebuilt_filter_and_universe(spark, corpus):
    ref, new = corpus
    ref_sh = reference_shingles(ref, "text", "doc_id")
    bloom = build_reference_filter(ref_sh, fpr=0.01)
    got = _as_map(novelty_scores(new, ref, bloom=bloom, ref_sh=ref_sh))
    assert got == _as_map(novelty_scores(new, ref))


def test_rejects_windowed_filter(spark, corpus):
    from btl_bloomfilter_spark.operators.bloom import BloomFilter

    ref, new = corpus
    with pytest.raises(ValueError, match="k=0"):
        novelty_scores(new, ref, bloom=BloomFilter(1 << 12, 2, 4))


def test_no_false_negative_accounting(spark, corpus):
    """novel_shingles <= total, and a doc equal to a ref doc can never
    report a novel shingle regardless of FPR (misses are certain)."""
    ref, new = corpus
    for fpr in (0.5, 0.01):
        got = _as_map(novelty_scores(new, ref, fpr=fpr))
        assert all(nov <= tot for tot, nov, _ in got.values())
        assert got[10][1] == 0

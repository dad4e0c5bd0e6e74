"""Incremental MinHash dedup: a new shard against a persisted corpus
signature table, without re-mining corpus x corpus.

The defining contract is restricted equality with the full rebuild:
same signature params => incremental pairs == minhash_dedup(corpus+new)
filtered to pairs touching a new id, estimates included.
"""

import numpy as np
import pytest

from pyspark.sql import functions as F

NEW_BASE = 1000  # new-shard ids start here: disjoint from corpus ids


def _docs(rng, n, vocab):
    return [" ".join(rng.choice(vocab, size=rng.integers(30, 60))) for _ in range(n)]


@pytest.fixture(scope="module")
def inc_setup(spark):
    rng = np.random.default_rng(7)
    vocab = np.array([f"tok{i:03d}" for i in range(300)])
    corpus = _docs(rng, 80, vocab)
    # new shard: 3 exact copies of corpus docs, 3 near-dups of corpus
    # docs (90% overlap), 1 within-new exact pair, 5 clean docs
    new = []
    exact_cross = []
    for i in range(3):
        new.append(corpus[i])
        exact_cross.append((i, NEW_BASE + len(new) - 1))
    near_cross = []
    for i in range(3, 6):
        toks = corpus[i].split()
        cut = max(1, len(toks) // 10)
        new.append(" ".join(toks[:-cut] + list(rng.choice(vocab, size=cut))))
        near_cross.append((i, NEW_BASE + len(new) - 1))
    fresh = _docs(rng, 5, vocab)
    new.extend(fresh)
    new.append(fresh[0])  # within-new exact pair
    within_pair = (NEW_BASE + 6, NEW_BASE + len(new) - 1)
    corpus_df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(corpus)], "doc_id long, text string"
    ).cache()
    new_df = spark.createDataFrame(
        [(NEW_BASE + i, d) for i, d in enumerate(new)], "doc_id long, text string"
    ).cache()
    return corpus_df, new_df, exact_cross, near_cross, within_pair


def _pairs(pdf):
    return {(int(r.id_a), int(r.id_b)): float(r.est_jaccard) for _, r in pdf.iterrows()}


@pytest.mark.spark
def test_incremental_equals_full_rebuild(spark, inc_setup):
    from btl_bloomfilter_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_dedup,
        minhash_signatures,
    )

    corpus_df, new_df, *_ = inc_setup
    corpus_sigs = minhash_signatures(corpus_df, "text", "doc_id", num_perm=64).cache()
    inc = incremental_minhash_dedup(
        new_df, "text", "doc_id", corpus_sigs, num_perm=64, bands=16, threshold=0.3
    ).toPandas()
    full = minhash_dedup(
        corpus_df.unionByName(new_df), "text", "doc_id", num_perm=64, bands=16, threshold=0.3
    ).toPandas()
    restricted = full[(full.id_a >= NEW_BASE) | (full.id_b >= NEW_BASE)]
    assert _pairs(inc) == _pairs(restricted)
    # and the restriction is non-trivial in both directions: the full
    # rebuild found pairs the incremental run must NOT re-mine
    assert len(restricted) > 0
    corpus_sigs.unpersist()


@pytest.mark.spark
def test_incremental_finds_planted(spark, inc_setup):
    from btl_bloomfilter_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    corpus_df, new_df, exact_cross, near_cross, within_pair = inc_setup
    corpus_sigs = minhash_signatures(corpus_df, "text", "doc_id", num_perm=128).cache()
    out = incremental_minhash_dedup(
        new_df, "text", "doc_id", corpus_sigs, num_perm=128, bands=32, threshold=0.3
    ).toPandas()
    found = _pairs(out)
    for p in exact_cross:
        assert found.get(p) == 1.0, (p, found)
    assert found.get(within_pair) == 1.0
    assert sum(p in found for p in near_cross) >= 2  # probabilistic at j≈0.85
    # nothing corpus-internal leaks into the incremental result
    assert all(b >= NEW_BASE for (_, b) in found)
    corpus_sigs.unpersist()


@pytest.mark.spark
def test_incremental_broadcast_plan(spark, inc_setup):
    """broadcast_new pins the new-side band table as the broadcast
    side: the corpus scan must not shuffle for the candidate join."""
    from btl_bloomfilter_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signatures,
    )

    corpus_df, new_df, *_ = inc_setup
    cs = minhash_signatures(corpus_df, "text", "doc_id", num_perm=64)
    ns = minhash_signatures(new_df, "text", "doc_id", num_perm=64)
    out = incremental_minhash_pairs(ns, cs, bands=16, rows_per_band=4, threshold=0.3)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus-sig table must never be the shuffled side of a
    # sort-merge join — the candidate list and shard bands broadcast
    assert "SortMergeJoin" not in plan


@pytest.mark.spark
def test_seed_salt_mismatch_estimates_zero(spark, inc_setup):
    """The docstring's warning, pinned: a mismatched seed_salt doesn't
    crash — it silently estimates ~0, so exact copies vanish."""
    from btl_bloomfilter_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    corpus_df, new_df, exact_cross, *_ = inc_setup
    corpus_sigs = minhash_signatures(corpus_df, "text", "doc_id", num_perm=64, seed_salt=99)
    out = incremental_minhash_dedup(
        new_df, "text", "doc_id", corpus_sigs, num_perm=64, bands=16, threshold=0.3, seed_salt=0
    ).toPandas()
    found = _pairs(out)
    assert all(p not in found for p in exact_cross)

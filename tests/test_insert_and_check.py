"""insertAndCheck parity (BloomFilter.hpp:200-232,
CountingBloomFilter.hpp:206-214) with exact sequential semantics."""

import numpy as np

from btl_bloomfilter_spark.operators.bloom import BloomFilter
from btl_bloomfilter_spark.operators.counting import CountingBloomFilter


def test_bloom_update_and_check_basic():
    bf = BloomFilter(1 << 16, 4, 0)
    out1 = bf.update_and_check(["a", "b", "a"])  # third is a within-batch dup
    assert out1.tolist() == [False, False, True]
    out2 = bf.update_and_check(["a", "c"])
    assert out2.tolist() == [True, False]
    assert bf.contains_batch(["a", "b", "c"]).all()


def test_bloom_update_and_check_matches_sequential():
    rng = np.random.default_rng(0)
    items = [f"v{rng.integers(0, 40)}" for _ in range(500)]
    batch_bf = BloomFilter(1 << 16, 3, 0)
    got = batch_bf.update_and_check(items)
    seq_bf = BloomFilter(1 << 16, 3, 0)
    want = []
    for it in items:
        want.append(bool(seq_bf.contains_batch([it])[0]))
        seq_bf.update([it])
    assert got.tolist() == want
    np.testing.assert_array_equal(batch_bf.bits, seq_bf.bits)


def test_bloom_update_and_check_kgrams():
    bf = BloomFilter(1 << 16, 3, 4)
    out = bf.update_and_check(["abcdef"])
    assert out.tolist() == [False]
    out2 = bf.update_and_check(["abcdef", "abcde", "zzzzz"])
    assert out2.tolist() == [True, True, False]  # "abcde" windows ⊂ "abcdef"


def test_counting_update_and_check_matches_sequential():
    rng = np.random.default_rng(1)
    items = [f"k{rng.integers(0, 25)}" for _ in range(400)]
    for threshold in (1, 3):
        batch = CountingBloomFilter(8192, 3, 0, threshold=threshold)
        got = batch.update_and_check(items)
        seq = CountingBloomFilter(8192, 3, 0, threshold=threshold)
        want = []
        for it in items:
            want.append(bool(seq.contains_batch([it])[0]))
            seq.update([it])
        assert got.tolist() == want, threshold
        np.testing.assert_array_equal(batch.counters, seq.counters)

"""Sketch.merge_blobs (batched bulk merge) must equal sequential
pairwise merging exactly, for every sketch family and both Bloom blob
formats."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.base import Sketch
from btl_bloomfilter_spark.operators.bloom import BloomFilter
from btl_bloomfilter_spark.operators.counting import CountingBloomFilter, CountMinSketch
from btl_bloomfilter_spark.operators.hll import HyperLogLog


def _partials(mk, n_parts=9, items_per=300):
    rng = np.random.default_rng(11)
    parts = []
    for p in range(n_parts):
        sk = mk()
        sk.update([f"part{p}-item{i}-{int(rng.integers(1000))}" for i in range(items_per)])
        parts.append(sk)
    return parts


@pytest.mark.parametrize(
    "mk",
    [
        lambda: BloomFilter(1 << 16, 4, 0),          # dense-ish blobs
        lambda: BloomFilter(1 << 22, 4, 0),          # sparse blobs
        lambda: BloomFilter(1 << 20, 3, 6),          # k-gram mode
        lambda: CountingBloomFilter(4096, 3, 0),
        lambda: CountMinSketch(512, 4),
        lambda: HyperLogLog(p=10),
    ],
)
def test_bulk_equals_sequential(mk):
    parts = _partials(mk)
    blobs = [p.serialize() for p in parts]
    bulk = Sketch.merge_blobs(blobs)
    seq = Sketch.deserialize(blobs[0])
    for b in blobs[1:]:
        seq.merge(Sketch.deserialize(b))
    state_a, state_b = bulk.state_bytes(), seq.state_bytes()
    assert state_a == state_b
    assert bulk.params() == seq.params()


def test_bulk_merge_mixed_formats():
    """Dense + sparse Bloom blobs in one bulk merge."""
    mk = lambda: BloomFilter(1 << 18, 3, 0)
    a = mk()
    a.update([f"a{i}" for i in range(20_000)])   # heavy → dense blob
    b = mk()
    b.update([f"b{i}" for i in range(100)])      # light → sparse blob
    bulk = Sketch.merge_blobs([a.serialize(), b.serialize()])
    seq = mk()
    seq.update([f"a{i}" for i in range(20_000)])
    seq.update([f"b{i}" for i in range(100)])
    np.testing.assert_array_equal(bulk.bits, seq.bits)
    assert bulk.n_entry == seq.n_entry


def test_bulk_merge_rejects_mixed_classes():
    with pytest.raises(ValueError):
        Sketch.merge_blobs([BloomFilter(64, 1, 0).serialize(), HyperLogLog(p=4).serialize()])


def test_bulk_merge_rejects_mismatched_params():
    with pytest.raises(ValueError):
        Sketch.merge_blobs([BloomFilter(64, 1, 0).serialize(), BloomFilter(128, 1, 0).serialize()])

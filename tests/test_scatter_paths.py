"""Both scatter strategies (bool accumulator vs packed bitwise_or.at)
and both serialization formats (dense vs sparse) must be bit-identical
— the auto-selection thresholds are performance knobs, never semantic."""

import numpy as np

from btl_bloomfilter_spark.operators.base import Sketch
from btl_bloomfilter_spark.operators.bloom import BloomFilter


def _build(monkey_max_bits):
    bf = BloomFilter(1 << 20, 4, 8)
    bf.DENSE_ACC_MAX_BITS = monkey_max_bits
    docs = [f"document number {i} with some payload text" for i in range(500)]
    bf.update(docs)
    bf.update(docs[:100])
    return bf


def test_bool_acc_vs_packed_scatter_identical():
    via_bool = _build(1 << 30)   # m <= cap → bool accumulator
    via_packed = _build(0)       # m > cap → packed or.at
    np.testing.assert_array_equal(via_bool.bits, via_packed.bits)
    assert via_bool.n_entry == via_packed.n_entry


def test_sparse_and_dense_blob_roundtrip_identical():
    bf = BloomFilter(1 << 22, 3, 0)
    bf.update([f"item{i}" for i in range(2000)])  # low fill → sparse fmt
    sparse_blob = bf.serialize()
    assert sparse_blob[4 + int.from_bytes(sparse_blob[:4], "little") + 16] == 1
    back = Sketch.deserialize(sparse_blob)
    np.testing.assert_array_equal(back.bits, bf.bits)

    # force dense by filling heavily
    dense = BloomFilter(1 << 10, 2, 0)
    dense.update([f"x{i}" for i in range(5000)])
    blob = dense.serialize()
    hlen = int.from_bytes(blob[:4], "little")
    assert blob[4 + hlen + 16] == 0  # fmt byte: dense
    back2 = Sketch.deserialize(blob)
    np.testing.assert_array_equal(back2.bits, dense.bits)


def test_sparse_u64_format_large_m():
    bf = BloomFilter(1 << 33, 2, 0)
    bf.DENSE_ACC_MAX_BITS = 0  # keep memory sane: packed scatter
    bf.update([f"item{i}" for i in range(200)])
    blob = bf.serialize()
    hlen = int.from_bytes(blob[:4], "little")
    assert blob[4 + hlen + 16] == 2  # fmt byte: sparse u64
    back = Sketch.deserialize(blob)
    assert back.contains_batch([f"item{i}" for i in range(200)]).all()
    assert back.pop() == bf.pop()

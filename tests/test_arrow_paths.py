"""update_arrow (zero-copy Arrow buffers) must equal update (pandas
strings) exactly for every sketch that implements it — including
nulls, empties, multibyte UTF-8, and sliced/offset arrays."""

import numpy as np
import pyarrow as pa
import pytest

from btl_bloomfilter_spark.functions import hashing as H
from btl_bloomfilter_spark.operators.bloom import BloomFilter
from btl_bloomfilter_spark.operators.counting import CountingBloomFilter, CountMinSketch
from btl_bloomfilter_spark.operators.hll import HyperLogLog

CORPUS = [
    "hello world",
    None,
    "",
    "ab",
    "héllo ✓ multibyte ütf8",
    "the quick brown fox jumps over the lazy dog " * 10,
] + [f"item number {i} with payload" for i in range(500)]


def _pairs():
    return [
        (lambda: BloomFilter(1 << 16, 4, 8), "bits"),
        (lambda: BloomFilter(1 << 16, 3, 0), "bits"),
        (lambda: CountingBloomFilter(9999, 3, 6), "counters"),
        (lambda: CountingBloomFilter(9999, 4, 0), "counters"),
        (lambda: CountMinSketch(512, 4), "table"),
        (lambda: HyperLogLog(p=10), "registers"),
    ]


@pytest.mark.parametrize("mk,attr", _pairs())
def test_arrow_equals_pandas(mk, attr):
    a = mk()
    a.update(CORPUS)
    b = mk()
    b.update_arrow(pa.array(CORPUS, pa.string()))
    np.testing.assert_array_equal(getattr(a, attr), getattr(b, attr))
    assert getattr(a, "n_entry", 0) == getattr(b, "n_entry", 0)
    assert a.t_entry == b.t_entry


@pytest.mark.parametrize("mk,attr", _pairs())
def test_arrow_sliced_array(mk, attr):
    """Arrow arrays with a nonzero offset (sliced) must hash identically."""
    arr = pa.array(CORPUS, pa.string())
    sliced = arr.slice(3, 200)
    a = mk()
    a.update(CORPUS[3:203])
    b = mk()
    b.update_arrow(sliced)
    np.testing.assert_array_equal(getattr(a, attr), getattr(b, attr))


def test_arrow_large_string():
    arr = pa.array(CORPUS, pa.large_string())
    a = BloomFilter(1 << 16, 3, 5)
    a.update(CORPUS)
    b = BloomFilter(1 << 16, 3, 5)
    b.update_arrow(arr)
    np.testing.assert_array_equal(a.bits, b.bits)


def test_arrow_chunked():
    arr = pa.chunked_array([CORPUS[:100], CORPUS[100:]], pa.string())
    a = BloomFilter(1 << 16, 3, 5)
    a.update(CORPUS)
    b = BloomFilter(1 << 16, 3, 5)
    b.update_arrow(arr)
    np.testing.assert_array_equal(a.bits, b.bits)


def test_buffers_view_matches_flatten():
    arr = pa.array(["abc", None, "", "déf"], pa.string())
    buf, offsets, mask = H.arrow_utf8_buffers(arr)
    fbuf, foffsets = H._flatten_utf8(["abc", None, "", "déf"])
    np.testing.assert_array_equal(buf, fbuf)
    np.testing.assert_array_equal(offsets, foffsets)
    assert mask.tolist() == [False, True, False, False]

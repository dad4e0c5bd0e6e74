"""Spaced-seed hashing (stHashIterator/ssHashIterator analog)."""

import numpy as np
import pytest

from btl_bloomfilter_spark.functions import hashing as H


def _naive_spaced(data: bytes, start: int, pattern: str, seeds) -> int:
    h = 0
    k = len(pattern)
    for j, c in enumerate(pattern):
        if c == "1":
            s = int(seeds[data[start + j]])
            r = (k - 1 - j) % 64
            h ^= ((s << r) | (s >> (64 - r))) & 0xFFFFFFFFFFFFFFFF if r else s
    return h


def test_parse_seed():
    np.testing.assert_array_equal(H.parse_seed("110101"), [0, 1, 3, 5])
    with pytest.raises(ValueError):
        H.parse_seed("12")
    with pytest.raises(ValueError):
        H.parse_seed("")


def test_spaced_matches_naive():
    rng = np.random.default_rng(42)
    strings = ["".join(chr(c) for c in rng.integers(97, 123, n)) for n in (0, 5, 6, 7, 30)]
    pattern = "110101"
    hashes, rows = H.hash_ngrams_spaced(strings, pattern, 2)
    seeds = H.seed_table()
    expect, erows = [], []
    for si, s in enumerate(strings):
        data = s.encode()
        for t in range(len(data) - len(pattern) + 1):
            expect.append(_naive_spaced(data, t, pattern, seeds))
            erows.append(si)
    assert rows.tolist() == erows
    assert [int(x) for x in hashes[:, 0]] == expect


def test_masked_positions_ignored():
    pattern = "101"
    a, _ = H.hash_ngrams_spaced(["axc"], pattern)
    b, _ = H.hash_ngrams_spaced(["ayc"], pattern)  # differs only at masked pos
    c, _ = H.hash_ngrams_spaced(["azcq"], pattern)
    np.testing.assert_array_equal(a, b)
    assert int(a[0, 0]) == int(c[0, 0])
    # care-position change → different hash
    d, _ = H.hash_ngrams_spaced(["bxc"], pattern)
    assert int(a[0, 0]) != int(d[0, 0])


def test_all_ones_equals_dense():
    strings = ["hello world", "spacedseed"]
    a, ra = H.hash_ngrams_spaced(strings, "11111", 3)
    b, rb = H.hash_ngrams(strings, 5, 3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ra, rb)


def test_multi_seed_layout():
    strings = ["abcdefgh"]
    pats = ["1101", "1011"]
    h, rows = H.hash_ngrams_multi_seed(strings, pats, 2)
    assert h.shape == (5, 4)  # 5 windows, 2 seeds × 2 hashes
    h1, _ = H.hash_ngrams_spaced(strings, pats[0], 2)
    h2, _ = H.hash_ngrams_spaced(strings, pats[1], 2)
    np.testing.assert_array_equal(h[:, :2], h1)
    np.testing.assert_array_equal(h[:, 2:], h2)
    with pytest.raises(ValueError):
        H.hash_ngrams_multi_seed(strings, ["11", "111"])

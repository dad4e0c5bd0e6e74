"""HLL accuracy (≤1.04/√m published bound) + merge-law tests."""

import itertools

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.hll import HyperLogLog
from btl_bloomfilter_spark.operators.base import Sketch


@pytest.mark.parametrize("true_n", [100, 5_000, 200_000])
def test_estimate_within_bound(true_n):
    hll = HyperLogLog(p=14)
    hll.update([f"item-{i}" for i in range(true_n)])
    est = hll.estimate()
    bound = 4 * hll.rel_error_bound()  # 4 sigma slack for a single draw
    assert abs(est - true_n) / true_n <= bound, (est, true_n)


def test_duplicates_dont_inflate():
    hll = HyperLogLog(p=12)
    for _ in range(10):
        hll.update([f"d{i}" for i in range(1000)])
    assert abs(hll.estimate() - 1000) / 1000 < 0.1


def test_merge_register_max_bit_exact():
    """merge_laws fixture: registers merge by max — merged partials
    bit-identical to serial build, any partition order."""
    items = [f"u{i}" for i in range(20_000)]
    serial = HyperLogLog(p=10)
    serial.update(items)
    chunks = np.array_split(np.array(items, dtype=object), 4)
    partials = []
    for c in chunks:
        h = HyperLogLog(p=10)
        h.update(list(c))
        partials.append(h)
    for perm in itertools.permutations(range(4)):
        acc = HyperLogLog(p=10)
        for i in perm:
            acc.merge(partials[i])
        np.testing.assert_array_equal(acc.registers, serial.registers)
        assert acc.estimate() == serial.estimate()


def test_merge_distinct_union_semantics():
    a, b = HyperLogLog(p=12), HyperLogLog(p=12)
    a.update([f"a{i}" for i in range(5000)])
    b.update([f"b{i}" for i in range(5000)])
    b.update([f"a{i}" for i in range(2500)])  # overlap
    a.merge(b)
    est = a.estimate()
    assert abs(est - 10_000) / 10_000 < 0.05


def test_small_range_linear_counting():
    hll = HyperLogLog(p=14)
    hll.update([f"x{i}" for i in range(50)])
    assert abs(hll.estimate() - 50) < 3


def test_midrange_bias_free():
    """The Ertl histogram estimator has no linear-counting switchover
    cliff: sweep cardinalities through the classic transition region
    (~2.5m) and require every point within the published bound — the
    classic estimator's bias spike there is exactly what HLL++/Ertl
    fix."""
    p = 12
    m = 1 << p
    bound = 4 * (1.04 / np.sqrt(m))
    for true_n in (m // 2, m, int(1.5 * m), int(2.5 * m), 3 * m, 5 * m):
        hll = HyperLogLog(p=p)
        hll.update([f"mid-{true_n}-{i}" for i in range(true_n)])
        est = hll.estimate()
        assert abs(est - true_n) / true_n <= bound, (true_n, est)


def test_empty_estimates_zero():
    assert HyperLogLog(p=10).estimate() == 0.0


def test_classic_estimator_still_available():
    hll = HyperLogLog(p=12)
    hll.update([f"c{i}" for i in range(20_000)])
    classic = hll.estimate_classic()
    improved = hll.estimate()
    assert abs(classic - improved) / improved < 0.05


def test_serialize_roundtrip():
    hll = HyperLogLog(p=11, seed_salt=7)
    hll.update([f"s{i}" for i in range(3000)])
    back = Sketch.deserialize(hll.serialize())
    np.testing.assert_array_equal(back.registers, hll.registers)
    assert back.estimate() == hll.estimate()
    assert back.params() == hll.params()


def test_incompatible_p_raises():
    with pytest.raises(ValueError):
        HyperLogLog(p=10).merge(HyperLogLog(p=11))


def test_sparse_densify_exactly_matches_dense():
    """The sparse (idx@25, rho-after-25) encoding must densify to the
    EXACT dense registers for any input — the law that makes merges
    across mixed representations bit-safe."""
    items = [f"val{i}" for i in range(20_000)]
    sp = HyperLogLog(p=11)
    sp._sparse_max = 10**9  # hold sparse far past the default cutoff
    sp.update(items)
    assert sp.is_sparse
    dn = HyperLogLog(p=11)
    dn._densify()  # dense from the first update
    dn.update(items)
    assert not dn.is_sparse
    np.testing.assert_array_equal(sp.registers, dn.registers)


def test_sparse_low_range_accuracy_and_roundtrip():
    """Sparse linear counting at 2^25 is near-exact at low n (the
    HLL++ small-range win) and serializes/merges losslessly."""
    hll = HyperLogLog(p=14)
    hll.update([f"u{i}" for i in range(3000)])
    assert hll.is_sparse
    assert abs(hll.estimate() - 3000) / 3000 < 0.005  # far under 1.04/sqrt(m)
    back = HyperLogLog.deserialize(hll.serialize())
    assert back.is_sparse
    assert back.estimate() == hll.estimate()
    np.testing.assert_array_equal(back.registers, hll.registers)
    # mixed-representation merge: sparse + dense == dense union
    a = HyperLogLog(p=10)
    a.update([f"a{i}" for i in range(200)])  # sparse
    b = HyperLogLog(p=10)
    b.update([f"b{i}" for i in range(20_000)])  # dense
    assert a.is_sparse and not b.is_sparse
    u = HyperLogLog(p=10)
    u.update([f"a{i}" for i in range(200)] + [f"b{i}" for i in range(20_000)])
    merged = HyperLogLog(p=10)
    merged.merge(a).merge(b)
    np.testing.assert_array_equal(merged.registers, u.registers)
    # sparse + sparse stays sparse and pools entries
    s1 = HyperLogLog(p=14); s1.update([f"x{i}" for i in range(500)])
    s2 = HyperLogLog(p=14); s2.update([f"x{i}" for i in range(300, 900)])
    s1.merge(s2)
    assert s1.is_sparse
    assert abs(s1.estimate() - 900) / 900 < 0.01

"""Theta/KMV sketch: accuracy bounds, bit-exact merge laws, set
algebra (union/intersect/difference/jaccard), distributed parity."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from btl_bloomfilter_spark.operators.base import Sketch
from btl_bloomfilter_spark.operators.theta import (
    ThetaSketch,
    theta_a_not_b,
    theta_intersect,
    theta_jaccard,
    theta_union,
)


def _built(items, k=4096):
    sk = ThetaSketch(k=k)
    sk.update(items)
    return sk


@pytest.mark.parametrize("true_n", [100, 5_000, 200_000])
def test_estimate_within_bound(true_n):
    sk = _built([f"item-{i}" for i in range(true_n)])
    est = sk.estimate()
    bound = 4 * max(sk.rel_error_bound(), 1e-12)  # 4 sigma slack
    assert abs(est - true_n) / true_n <= bound, (est, true_n)


def test_exact_mode_small_sets():
    sk = _built([f"x{i}" for i in range(1000)], k=4096)
    assert sk.is_exact
    assert sk.estimate() == 1000.0
    assert sk.rel_error_bound() == 0.0


def test_duplicates_dont_inflate():
    sk = ThetaSketch(k=256)
    for _ in range(10):
        sk.update([f"d{i}" for i in range(5000)])
    assert abs(sk.estimate() - 5000) / 5000 < 4 / np.sqrt(255)


def test_merge_bit_exact_any_partition_order():
    """Merged partials bit-identical to the serial build — retained
    values AND theta — under every partition permutation."""
    items = [f"u{i}" for i in range(20_000)]
    serial = _built(items, k=512)
    chunks = np.array_split(np.array(items, dtype=object), 4)
    partials = []
    for c in chunks:
        partials.append(_built(list(c), k=512))
    for perm in itertools.permutations(range(4)):
        acc = ThetaSketch(k=512)
        for i in perm:
            acc.merge(partials[i])
        np.testing.assert_array_equal(acc._vals, serial._vals)
        assert acc._theta == serial._theta
        assert acc.estimate() == serial.estimate()


def test_union_overlap_semantics():
    a = _built([f"a{i}" for i in range(5000)], k=1024)
    b = _built([f"b{i}" for i in range(5000)] + [f"a{i}" for i in range(2500)], k=1024)
    u = theta_union([a, b])
    assert abs(u.estimate() - 10_000) / 10_000 < 4 / np.sqrt(1023)
    # inputs untouched
    assert abs(a.estimate() - 5000) / 5000 < 4 / np.sqrt(1023)


def test_intersection_and_difference():
    n, overlap = 30_000, 10_000
    a_items = [f"common{i}" for i in range(overlap)] + [f"a{i}" for i in range(n - overlap)]
    b_items = [f"common{i}" for i in range(overlap)] + [f"b{i}" for i in range(n - overlap)]
    a, b = _built(a_items, k=4096), _built(b_items, k=4096)

    inter = theta_intersect(a, b)
    bound = 5 * max(inter.rel_error_bound(), 1e-12)
    assert abs(inter.estimate() - overlap) / overlap <= bound, inter.estimate()

    diff = theta_a_not_b(a, b)
    bound = 5 * max(diff.rel_error_bound(), 1e-12)
    assert abs(diff.estimate() - (n - overlap)) / (n - overlap) <= bound, diff.estimate()

    j = theta_jaccard(a, b)
    true_j = overlap / (2 * n - overlap)
    assert abs(j - true_j) <= 0.05, (j, true_j)


def test_set_ops_compose():
    """(A ∪ B) ∩ C — results are valid sketches and compose."""
    a = _built([f"a{i}" for i in range(8000)], k=2048)
    b = _built([f"b{i}" for i in range(8000)], k=2048)
    c = _built([f"a{i}" for i in range(4000)] + [f"b{i}" for i in range(4000)], k=2048)
    res = theta_intersect(theta_union([a, b]), c)
    bound = 5 * max(res.rel_error_bound(), 1e-12)
    assert abs(res.estimate() - 8000) / 8000 <= bound, res.estimate()


def test_intersection_disjoint_estimates_zero():
    a = _built([f"a{i}" for i in range(20_000)], k=512)
    b = _built([f"b{i}" for i in range(20_000)], k=512)
    inter = theta_intersect(a, b)
    # absolute error governed by common theta: ~union/k
    assert inter.estimate() <= 5 * 40_000 / 511
    assert theta_jaccard(a, b) <= 0.02


def test_empty_and_empty_ops():
    e = ThetaSketch(k=64)
    assert e.estimate() == 0.0
    a = _built(["x", "y"], k=64)
    assert theta_union([e, a]).estimate() == 2.0
    assert theta_intersect(e, a).estimate() == 0.0
    assert theta_a_not_b(a, e).estimate() == 2.0
    assert theta_jaccard(e, a) == 0.0


def test_union_of_nothing_raises():
    with pytest.raises(ValueError, match="at least one"):
        theta_union([])


def test_serialize_roundtrip_both_modes():
    small = _built([f"s{i}" for i in range(10)], k=64)  # exact mode
    big = _built([f"b{i}" for i in range(10_000)], k=64)  # estimating mode
    for sk in (small, big):
        back = Sketch.deserialize(sk.serialize())
        assert isinstance(back, ThetaSketch)
        np.testing.assert_array_equal(back._vals, sk._vals)
        assert back._theta == sk._theta
        assert back.t_entry == sk.t_entry
        assert back.estimate() == sk.estimate()


def test_incompatible_params_raise():
    a, b = ThetaSketch(k=64), ThetaSketch(k=128)
    with pytest.raises(ValueError):
        a.merge(b)
    c = ThetaSketch(k=64, seed_salt=7)
    with pytest.raises(ValueError):
        theta_intersect(a, c)
    with pytest.raises(ValueError):
        ThetaSketch(k=4)


def test_arrow_update_matches_pandas_path():
    vals = ["alpha", None, "beta", "", "alpha", None, "gamma"]
    sk_a = ThetaSketch(k=64)
    sk_a.update_arrow(pa.array(vals, pa.string()))
    sk_p = ThetaSketch(k=64)
    sk_p.update(vals)  # _strings_of maps None -> ""
    np.testing.assert_array_equal(sk_a._vals, sk_p._vals)
    assert sk_a._theta == sk_p._theta


def test_distributed_build_bit_exact(spark):
    """build_sketch over a multi-partition DataFrame reproduces the
    driver-serial sketch bit-for-bit (protocol law end-to-end)."""
    from btl_bloomfilter_spark.plans.agg import build_sketch

    rows = [(f"conv-{i % 3000}",) for i in range(9000)]
    df = spark.createDataFrame(rows, "conv_id string").repartition(8)
    dist = build_sketch(df, "conv_id", lambda: ThetaSketch(k=512))
    serial = _built([f"conv-{i}" for i in range(3000)], k=512)
    np.testing.assert_array_equal(dist._vals, serial._vals)
    assert dist._theta == serial._theta
    assert dist.estimate() == serial.estimate()

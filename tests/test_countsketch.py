"""Count sketch (AMS): exactness at no-collision widths, unbiasedness
across seeds, Chebyshev/median error law, exact merge associativity,
sliced reduce-scatter parity, and the distributed build law."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.base import Sketch
from btl_bloomfilter_spark.operators.countsketch import CountSketch


def _zipf_corpus(n=6000, n_keys=200, seed=7):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.5, size=n) % n_keys
    return [f"key{r:04d}" for r in ranks]


def _exact(values):
    out = {}
    for v in values:
        out[v] = out.get(v, 0) + 1
    return out


def test_exact_when_no_collisions():
    """With width >> keys^2, whp no two keys share a cell in any row,
    so every estimate is exactly the true count (signs cancel nothing)."""
    cs = CountSketch(width=1 << 16, depth=3, seed_salt=1)
    vals = ["a"] * 5 + ["b"] * 2 + ["c"]
    cs.update(vals)
    est = cs.estimate_batch(["a", "b", "c", "never"])
    assert est.tolist() == [5.0, 2.0, 1.0, 0.0]
    assert cs.n_entry == 8


def test_update_arrow_matches_update():
    import pyarrow as pa

    vals = _zipf_corpus(n=2000)
    a = CountSketch(256, 5)
    b = CountSketch(256, 5)
    a.update(vals)
    b.update_arrow(pa.array(vals + [None]))  # null folds to ""
    b2 = CountSketch(256, 5)
    b2.update(vals + [""])
    assert np.array_equal(b.table, b2.table)
    c = CountSketch(256, 5)
    c.update_arrow(pa.array(vals))
    assert np.array_equal(a.table, c.table)


def test_merge_is_exact_and_associative():
    vals = _zipf_corpus()
    chunks = [vals[i::4] for i in range(4)]
    whole = CountSketch(512, 5, seed_salt=3)
    whole.update(vals)
    parts = []
    for ch in chunks:
        p = CountSketch(512, 5, seed_salt=3)
        p.update(ch)
        parts.append(p)
    # left fold
    left = CountSketch(512, 5, seed_salt=3)
    for p in parts:
        left.merge(p)
    # reversed pairwise tree
    t01 = CountSketch(512, 5, seed_salt=3).merge(parts[3]).merge(parts[2])
    t23 = CountSketch(512, 5, seed_salt=3).merge(parts[1]).merge(parts[0])
    tree = t01.merge(t23)
    assert np.array_equal(whole.table, left.table)
    assert np.array_equal(whole.table, tree.table)
    assert left.n_entry == whole.n_entry == len(vals)


def test_estimates_within_chebyshev_bound():
    """Deterministic seeds: every exact key's estimate lands within the
    per-row radius sqrt(3*F2/width) (the median should do strictly
    better than one row's 2/3 guarantee — require >= 95% within and the
    heavy keys exactly ranked)."""
    vals = _zipf_corpus(n=20000, n_keys=500, seed=11)
    exact = _exact(vals)
    cs = CountSketch(width=2048, depth=7, seed_salt=5)
    cs.update(vals)
    keys = sorted(exact)
    est = cs.estimate_batch(keys)
    f2 = float(sum(c * c for c in exact.values()))
    radius = np.sqrt(3.0 * f2 / cs.width)
    errs = np.abs(est - np.array([exact[k] for k in keys], dtype=float))
    assert (errs <= radius).mean() >= 0.95
    assert cs.error_bound() == pytest.approx(np.sqrt(3.0 * cs.f2_estimate() / cs.width))


def test_unbiasedness_across_seeds():
    """Mean estimate over 25 independent seed salts converges to the
    true count (count-min would sit strictly above)."""
    vals = _zipf_corpus(n=4000, n_keys=100, seed=13)
    exact = _exact(vals)
    key = max(exact, key=exact.get)
    ests, f2s = [], []
    f2 = float(sum(c * c for c in exact.values()))
    for salt in range(25):
        cs = CountSketch(width=128, depth=1, seed_salt=salt)  # depth 1: raw row estimate
        cs.update(vals)
        ests.append(cs.estimate_batch([key])[0])
        f2s.append(cs.f2_estimate())
    assert np.mean(ests) == pytest.approx(exact[key], rel=0.15)
    assert np.mean(f2s) == pytest.approx(f2, rel=0.15)


def test_f2_estimate_within_eps():
    vals = _zipf_corpus(n=20000, n_keys=500, seed=17)
    exact = _exact(vals)
    f2 = float(sum(c * c for c in exact.values()))
    cs = CountSketch(width=2048, depth=7, seed_salt=2)
    cs.update(vals)
    eps = np.sqrt(6.0 / cs.width)
    assert abs(cs.f2_estimate() - f2) <= eps * f2


def test_inner_product_estimate():
    va = _zipf_corpus(n=8000, n_keys=300, seed=19)
    vb = _zipf_corpus(n=8000, n_keys=300, seed=23)
    ea, eb = _exact(va), _exact(vb)
    true_ip = float(sum(ea[k] * eb.get(k, 0) for k in ea))
    a = CountSketch(2048, 7, seed_salt=9)
    b = CountSketch(2048, 7, seed_salt=9)
    a.update(va)
    b.update(vb)
    # signed estimate is unbiased; tolerance from the product-variance
    # bound sqrt(2*F2a*F2b/width)
    tol = 3.0 * np.sqrt(2.0 * a.f2_estimate() * b.f2_estimate() / a.width)
    assert abs(a.inner_product(b) - true_ip) <= tol


def test_weighted_update():
    cs = CountSketch(1 << 14, 3, seed_salt=4)
    cs.update_weighted(["a", "b"], [10, 3])
    est = cs.estimate_batch(["a", "b"])
    assert est.tolist() == [10.0, 3.0]
    assert cs.n_entry == 13 and cs.t_entry == 2


def test_state_roundtrip_and_envelope():
    vals = _zipf_corpus(n=1000)
    cs = CountSketch(256, 5, seed_salt=6)
    cs.update(vals)
    back = Sketch.deserialize(cs.serialize())
    assert isinstance(back, CountSketch)
    assert np.array_equal(back.table, cs.table)
    assert back.n_entry == cs.n_entry


def test_sliced_merge_parity():
    """state_slices -> merge_slice_blobs -> assemble == driver merge,
    byte-exact, across dense and sparse slice encodings."""
    vals = _zipf_corpus(n=3000)
    chunks = [vals[i::3] for i in range(3)]
    parts = []
    for ch in chunks:
        p = CountSketch(512, 4, seed_salt=8)
        p.update(ch)
        parts.append(p)
    whole = CountSketch(512, 4, seed_salt=8)
    whole.update(vals)
    n_slices = 7
    params = whole.params()
    sliced = [p.state_slices(n_slices) for p in parts]
    merged = [
        CountSketch.merge_slice_blobs(params, s, n_slices, [sl[s] for sl in sliced])
        for s in range(n_slices)
    ]
    out = CountSketch.assemble_slices(
        params, merged, n_entry=sum(p.n_entry for p in parts), t_entry=sum(p.t_entry for p in parts)
    )
    assert np.array_equal(out.table, whole.table)
    assert out.n_entry == whole.n_entry


def test_sparse_slice_encoding_kicks_in():
    cs = CountSketch(width=1 << 12, depth=2, seed_salt=1)
    cs.update(["only"])
    slices = cs.state_slices(4)
    assert any(s[0] == 1 for s in slices)  # sparse fmt used on a near-empty table
    # and round-trips
    merged = [CountSketch.merge_slice_blobs(cs.params(), i, 4, [slices[i]]) for i in range(4)]
    back = CountSketch.assemble_slices(cs.params(), merged, cs.n_entry, cs.t_entry)
    assert np.array_equal(back.table, cs.table)


def test_distributed_build_matches_driver(spark):
    """build_sketch (sliced reduce-scatter) over a shuffled DataFrame is
    BYTE-IDENTICAL to the driver single-pass build: integer cell-wise
    addition is exactly associative/commutative (north_rule merge law)."""
    from btl_bloomfilter_spark.plans.agg import build_sketch

    vals = _zipf_corpus(n=5000, n_keys=120, seed=29)
    df = spark.createDataFrame([(v,) for v in vals], "tool string").repartition(11)
    sk = build_sketch(df, "tool", lambda: CountSketch(1024, 5, seed_salt=12))
    drv = CountSketch(1024, 5, seed_salt=12)
    drv.update(vals)
    assert np.array_equal(sk.table, drv.table)
    assert sk.n_entry == len(vals)
    # estimates agree with exact counts within the bound
    exact = _exact(vals)
    keys = sorted(exact)
    est = sk.estimate_batch(keys)
    radius = np.sqrt(3.0 * sk.f2_estimate() / sk.width)
    errs = np.abs(est - np.array([exact[k] for k in keys], dtype=float))
    assert (errs <= radius).mean() >= 0.9

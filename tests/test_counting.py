"""Counting BF / CMS tests mirroring Tests/Unit/CountingBloomFilterTests.cpp
plus published CMS eps/delta guarantees."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.counting import CountingBloomFilter, CountMinSketch
from btl_bloomfilter_spark.operators.base import Sketch
from btl_bloomfilter_spark.sources import bfio


@pytest.mark.parametrize("bits", [8, 64])
def test_insert_contains_roundtrip(bits):
    """CountingBloomFilterTests.cpp:76-94/125-244 analog for uint8+uint64."""
    cbf = CountingBloomFilter(m_counters=100_008, hash_num=5, k=8, counter_bits=bits, threshold=1)
    seq = ["ABCDEFGHIJKLMNOPQRST"]  # 20 symbols, k=8 → 13 windows
    cbf.update(seq)
    assert cbf.n_entry == 13
    assert cbf.contains_batch(seq).all()
    assert (cbf.estimate_batch(seq) >= 1).all()


def test_negative_control_disjoint_alphabet():
    """CountingBloomFilterTests.cpp:109-122: random never-inserted
    sequence absent (seeded generator, FIXTURES.md)."""
    rng = np.random.default_rng(42)
    cbf = CountingBloomFilter(100_008, 5, 8)
    cbf.update(["ABCDEFGHIJKLMNOPQRST"])
    neg = "".join(rng.choice(list("zyxwvu"), 60))
    assert not cbf.contains_batch([neg]).any()


def test_counts_accumulate_and_threshold():
    cbf = CountingBloomFilter(10_000, 4, 0, threshold=3)
    cbf.update(["a", "a", "b"])
    cbf.update(["a", "b"])
    est = cbf.estimate_batch(["a", "b", "c"])
    assert est[0] >= 3 and est[1] >= 2 and est[2] == 0
    assert cbf.contains_batch(["a", "b", "c"]).tolist() == [True, False, False]


def test_saturation_no_wrap():
    cbf = CountingBloomFilter(64, 2, 0, counter_bits=8)
    for _ in range(300):
        cbf.update(["x"])
    assert cbf.estimate_batch(["x"])[0] == 255  # saturates, never wraps


def test_merge_equals_serial():
    """incrementAll is order-independent: P-way merge == serial."""
    rng = np.random.default_rng(3)
    items = [f"it{rng.integers(0, 200)}" for _ in range(2000)]
    serial = CountingBloomFilter(4096, 3, 0)
    serial.update(items)
    for parts in (2, 7):
        chunks = np.array_split(np.array(items, dtype=object), parts)
        acc = CountingBloomFilter(4096, 3, 0)
        for c in chunks:
            part = CountingBloomFilter(4096, 3, 0)
            part.update(list(c))
            acc.merge(part)
        np.testing.assert_array_equal(acc.counters, serial.counters)


def test_conservative_update_partition_local():
    """incrementMin gives tighter (≤ incrementAll) estimates."""
    rng = np.random.default_rng(5)
    items = [f"k{rng.integers(0, 50)}" for _ in range(1000)]
    allup = CountingBloomFilter(256, 4, 0)
    allup.update(items)
    cons = CountingBloomFilter(256, 4, 0)
    cons.update_conservative(items)
    from collections import Counter

    truth = Counter(items)
    keys = list(truth)
    e_all = allup.estimate_batch(keys)
    e_cons = cons.estimate_batch(keys)
    t = np.array([truth[k] for k in keys], dtype=float)
    assert (e_cons >= t).all() and (e_all >= t).all()  # never undercount
    assert e_cons.sum() <= e_all.sum()


def test_pop_counts_and_fpr():
    cbf = CountingBloomFilter(10_000, 3, 0, threshold=2)
    cbf.update(["a", "b", "a"])
    assert 0 < cbf.pop_count() <= 9
    assert cbf.filtered_pop_count() <= cbf.pop_count()
    assert 0 <= cbf.filtered_fpr() <= cbf.fpr() < 1e-6


def test_counting_bf_file_roundtrip(tmp_path):
    cbf = CountingBloomFilter(100_008, 5, 8, counter_bits=8, dfpr=0.01, threshold=3)
    cbf.update(["ABCDEFGHIJKLMNOPQRST"])
    p = tmp_path / "c.bf"
    bfio.save_counting(cbf, p)
    raw = p.read_bytes()
    assert raw.startswith(b"[BTLCountingBloomFilter_v1]")
    back = bfio.load_counting(p)
    np.testing.assert_array_equal(back.counters_saturated(), cbf.counters_saturated())
    # regression: threshold must survive the file round-trip (a reload
    # silently reset it to 1, changing contains() semantics)
    assert back.threshold == 3
    np.testing.assert_array_equal(
        back.contains_batch(["ABCDEFGH"]), cbf.contains_batch(["ABCDEFGH"])
    )


def test_counting_hash_modes():
    """Counting filter shares BloomFilter's tokenizer modes: canonical
    counts strand-neutrally; spaced seeds count skip-grams; arrow ==
    pandas."""
    import pyarrow as pa

    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    reads = ["ACGTTGCAATCG", "GGCCTTAAGCTA"]
    rc = ["".join(comp[c] for c in reversed(r)) for r in reads]
    canon = CountingBloomFilter(1 << 14, 3, 7, counter_bits=16, canonical=True)
    canon.update(reads)
    canon.update(rc)  # strand-neutral: doubles every window's count
    assert (canon.estimate_batch(reads) >= 2).all()
    fwd = CountingBloomFilter(1 << 14, 3, 7, counter_bits=16)
    fwd.update(reads)
    fwd.update(rc)
    assert (fwd.estimate_batch(reads) == 1).all()
    # arrow parity in canonical mode
    canon2 = CountingBloomFilter(1 << 14, 3, 7, counter_bits=16, canonical=True)
    canon2.update_arrow(pa.array(reads + rc, pa.string()))
    np.testing.assert_array_equal(canon2.counters, canon.counters)
    # spaced mode: a variant differing only at a position masked by
    # EVERY seed collides on all slots (min across seeds stays >= 1)
    sp = CountingBloomFilter(1 << 14, 2, 0, spaced_seeds=["11011", "11001"])
    sp.update(["abXde", "abYde"])
    assert sp.estimate_batch(["abZde"])[0] >= 2  # both inserts share all slots
    back = Sketch.deserialize(canon.serialize())
    assert back.canonical and (back.estimate_batch(reads) >= 2).all()


def test_envelope_roundtrip():
    cms = CountMinSketch(2048, 4)
    cms.update([f"v{i % 37}" for i in range(500)])
    back = Sketch.deserialize(cms.serialize())
    np.testing.assert_array_equal(back.table, cms.table)


# ----------------------------- count-min -------------------------------


def test_cms_overestimate_only_and_bound():
    """est ≥ true always; est ≤ true + εN w.p. 1-δ (published bound)."""
    rng = np.random.default_rng(42)
    zipf = rng.zipf(1.3, size=20_000)
    items = [f"tool{min(int(z), 500)}" for z in zipf]
    eps, delta = 0.005, 0.01
    cms = CountMinSketch.from_error(eps, delta)
    cms.update(items)
    from collections import Counter

    truth = Counter(items)
    keys = list(truth)
    est = cms.estimate_batch(keys)
    t = np.array([truth[k] for k in keys], dtype=float)
    assert (est >= t).all()
    n = len(items)
    frac_over = (est > t + eps * n).mean()
    assert frac_over <= delta


def test_cms_merge_equals_serial():
    items = [f"x{i % 97}" for i in range(5000)]
    serial = CountMinSketch(512, 4)
    serial.update(items)
    acc = CountMinSketch(512, 4)
    for c in np.array_split(np.array(items, dtype=object), 5):
        p = CountMinSketch(512, 4)
        p.update(list(c))
        acc.merge(p)
    np.testing.assert_array_equal(acc.table, serial.table)
    assert acc.n_entry == serial.n_entry


def test_cms_weighted_update():
    cms = CountMinSketch(1024, 4)
    cms.update_weighted(["a", "b"], [10, 3])
    assert cms.estimate_batch(["a"])[0] >= 10
    assert cms.estimate_batch(["b"])[0] >= 3


def test_cms_conservative_tighter():
    rng = np.random.default_rng(9)
    items = [f"k{rng.integers(0, 300)}" for _ in range(5000)]
    plain = CountMinSketch(64, 4)
    plain.update(items)
    cons = CountMinSketch(64, 4, conservative=True)
    cons.update(items)
    from collections import Counter

    truth = Counter(items)
    keys = list(truth)
    t = np.array([truth[k] for k in keys], dtype=float)
    assert (cons.estimate_batch(keys) >= t).all()
    assert cons.estimate_batch(keys).sum() <= plain.estimate_batch(keys).sum()


def test_cms_inner_product_join_size():
    """Inner-product estimate (Cormode-Muthukrishnan '05 §4.2): never
    undercounts the true Σ f_A(k)·f_B(k) (= inner-join cardinality),
    overcount within eps·N_A·N_B (eps = e/width), symmetric."""
    import math

    rng = np.random.default_rng(11)
    a_keys = [f"k{v}" for v in rng.integers(0, 50, 4000)]
    b_keys = [f"k{v}" for v in rng.integers(0, 80, 3000)]
    from collections import Counter

    ca, cb = Counter(a_keys), Counter(b_keys)
    exact = sum(ca[k] * cb[k] for k in ca)
    A = CountMinSketch(2048, 5)
    A.update(a_keys)
    B = CountMinSketch(2048, 5)
    B.update(b_keys)
    est = A.inner_product(B)
    assert est >= exact
    assert est <= exact + (math.e / 2048) * len(a_keys) * len(b_keys)
    assert B.inner_product(A) == est


def test_cms_inner_product_guards():
    A = CountMinSketch(128, 3)
    A.update(["x", "y"])
    cons = CountMinSketch(128, 3, conservative=True)
    cons.update(["x"])
    with pytest.raises(ValueError):
        A.inner_product(cons)  # params differ -> compatibility raise
    # BOTH conservative: params match, so this exercises the dedicated
    # conservative guard (a conservative cell can under-represent the
    # sum of its keys' counts, breaking no-undercount)
    cons2 = CountMinSketch(128, 3, conservative=True)
    cons2.update(["x"])
    with pytest.raises(ValueError, match="conservative"):
        cons.inner_product(cons2)
    other_dims = CountMinSketch(256, 3)
    with pytest.raises(ValueError):
        A.inner_product(other_dims)


def test_cms_inner_product_exact_arithmetic_no_overflow():
    """Row dot products must not wrap at 2^64: two single-key sketches
    with counts ~2^33 have products ~2^66."""
    big = 1 << 33
    A = CountMinSketch(16, 2)
    A.update_weighted(["hot"], [big])
    B = CountMinSketch(16, 2)
    B.update_weighted(["hot"], [big])
    assert A.inner_product(B) == big * big

"""Reduce-scatter (sliced) build must equal the tree build bit-for-bit
— topology is a performance knob, never semantic."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.bloom import BloomFilter


def _docs(n=400):
    rng = np.random.default_rng(4)
    vocab = [f"w{i:03d}" for i in range(200)]
    return [" ".join(rng.choice(vocab, size=rng.integers(10, 50))) for _ in range(n)]


@pytest.mark.spark
def test_sliced_equals_tree_and_serial(spark):
    from btl_bloomfilter_spark.plans.agg import build_sketch, build_sketch_sliced

    docs = _docs()
    df = spark.createDataFrame([(d,) for d in docs], "text string").repartition(7)
    mk = lambda: BloomFilter(1 << 18, 4, 9)
    serial = mk()
    serial.update(docs)
    sliced = build_sketch_sliced(df, "text", mk, n_slices=16)
    tree = build_sketch(df, "text", mk, strategy="tree", fanin=3)
    np.testing.assert_array_equal(sliced.bits, serial.bits)
    np.testing.assert_array_equal(tree.bits, serial.bits)
    assert sliced.n_entry == tree.n_entry == serial.n_entry
    assert sliced.t_entry == len(docs)


@pytest.mark.spark
def test_sliced_with_nulls_and_odd_slice_count(spark):
    from btl_bloomfilter_spark.plans.agg import build_sketch_sliced

    docs = _docs(100)
    rows = [(d,) for d in docs] + [(None,), ("",), ("ab",)]
    df = spark.createDataFrame(rows, "text string").repartition(5)
    mk = lambda: BloomFilter(1 << 16, 3, 6)
    serial = mk()
    serial.update(docs + [None, "", "ab"])
    built = build_sketch_sliced(df, "text", mk, n_slices=13)  # uneven ranges
    np.testing.assert_array_equal(built.bits, serial.bits)


@pytest.mark.spark
def test_sliced_counting_bloom(spark):
    from btl_bloomfilter_spark.operators.counting import CountingBloomFilter
    from btl_bloomfilter_spark.plans.agg import build_sketch, build_sketch_sliced

    items = [f"k{i % 37}" for i in range(3000)] + [None]
    df = spark.createDataFrame([(x,) for x in items], "text string").repartition(6)
    mk = lambda: CountingBloomFilter(10_000, 3, 0, counter_bits=16)
    serial = mk()
    serial.update(items)
    sliced = build_sketch_sliced(df, "text", mk, n_slices=9)
    np.testing.assert_array_equal(sliced.counters, serial.counters)
    assert sliced.n_entry == serial.n_entry
    auto = build_sketch(df, "text", mk)  # auto routes sliced
    np.testing.assert_array_equal(auto.counters, serial.counters)
    est = sliced.estimate_batch(["k0", "k36", "nope"])
    assert est[0] >= 82 and est[2] == 0


@pytest.mark.spark
def test_sliced_whole_string_mode(spark):
    from btl_bloomfilter_spark.plans.agg import build_sketch_sliced

    items = [f"item-{i}" for i in range(2000)] + [None]
    df = spark.createDataFrame([(x,) for x in items], "text string").repartition(4)
    mk = lambda: BloomFilter(1 << 16, 4, 0)
    serial = mk()
    serial.update(items)
    built = build_sketch_sliced(df, "text", mk, n_slices=8)
    np.testing.assert_array_equal(built.bits, serial.bits)
    assert built.contains_batch(["item-0", "item-1999"]).all()

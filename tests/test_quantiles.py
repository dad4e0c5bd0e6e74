"""KLL + t-digest accuracy and merge tests (quantiles fixture)."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.kll import KLL
from btl_bloomfilter_spark.operators.tdigest import TDigest
from btl_bloomfilter_spark.operators.base import Sketch


def _rank_err(sketch_q, data, q):
    """Distance from q to the true rank-interval of the estimate.

    With heavy ties a single value occupies a rank interval
    [left, right); any q inside it is answered exactly by that value.
    """
    est = sketch_q(q)
    sd = np.sort(data)
    lo = np.searchsorted(sd, est, side="left") / len(data)
    hi = np.searchsorted(sd, est, side="right") / len(data)
    if lo <= q <= hi:
        return 0.0
    return min(abs(q - lo), abs(q - hi))


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "zipfish"])
def test_kll_rank_error_bound(dist):
    rng = np.random.default_rng(42)
    n = 50_000
    data = {
        "uniform": rng.uniform(0, 1000, n),
        "lognormal": rng.lognormal(3, 2, n),
        "zipfish": rng.zipf(1.5, n).astype(float),
    }[dist]
    k = 200
    kll = KLL(k=k)
    for c in np.array_split(data, 10):
        kll.update(c)
    assert kll.n == n
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        assert _rank_err(kll.quantile, data, q) <= 2.2 / k + 0.005, (dist, q)


def test_kll_merge_bound_holds():
    rng = np.random.default_rng(1)
    data = rng.normal(0, 100, 40_000)
    parts = []
    for c in np.array_split(data, 8):
        s = KLL(k=200, seed=int(abs(c[0])) + 1)
        s.update(c)
        parts.append(s)
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert acc.n == len(data)
    for q in (0.1, 0.5, 0.9):
        assert _rank_err(acc.quantile, data, q) <= 0.02


def test_kll_rank_and_exact_small():
    kll = KLL(k=200)
    kll.update(np.arange(100, dtype=float))
    # fewer items than capacity → exact
    assert kll.quantile(0.5) in (49.0, 50.0)
    assert kll.rank(49.0) == pytest.approx(0.5, abs=0.01)


def test_kll_serialize_roundtrip():
    kll = KLL(k=128)
    kll.update(np.random.default_rng(0).normal(size=10_000))
    back = Sketch.deserialize(kll.serialize())
    assert back.n == kll.n
    for q in (0.1, 0.5, 0.9):
        assert back.quantile(q) == kll.quantile(q)


def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(42)
    data = rng.lognormal(2, 1.5, 100_000)
    td = TDigest(delta=200)
    for c in np.array_split(data, 20):
        td.update(c)
    for q in (0.5, 0.9, 0.99):
        assert _rank_err(td.quantile, data, q) <= 0.01, q
    # tails are tight
    assert _rank_err(td.quantile, data, 0.999) <= 0.005


def test_tdigest_merge_accuracy_any_order():
    rng = np.random.default_rng(2)
    data = rng.gamma(2, 50, 60_000)
    parts = []
    for c in np.array_split(data, 6):
        t = TDigest(delta=200)
        t.update(c)
        parts.append(t)
    for order in ([0, 1, 2, 3, 4, 5], [5, 3, 1, 0, 2, 4]):
        acc = TDigest(delta=200)
        for i in order:
            fresh = Sketch.deserialize(parts[i].serialize())
            acc.merge(fresh)
        assert acc.n == len(data)
        for q in (0.5, 0.9, 0.99):
            assert _rank_err(acc.quantile, data, q) <= 0.015


def test_tdigest_centroid_count_bounded():
    td = TDigest(delta=100)
    td.update(np.random.default_rng(3).uniform(size=50_000))
    td._flush()
    assert td.means.size <= 2 * 100  # ~delta centroids


def test_tdigest_cdf_and_serialize():
    td = TDigest()
    td.update(np.arange(1000, dtype=float))
    assert td.cdf(500) == pytest.approx(0.5, abs=0.01)
    back = Sketch.deserialize(td.serialize())
    assert back.quantile(0.5) == td.quantile(0.5)
    assert back.n == td.n


def test_sketch_by_key_array_out_type(spark):
    """Grouped KLL with an array<double> finalize (out_type
    generalization): per-key quantile arrays land intact, and each
    key's distributed sketch answers within the rank bound of the
    key's own data."""
    import pandas as pd
    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.plans.agg import sketch_by_key

    rng = np.random.default_rng(11)
    keys = ["a"] * 30_000 + ["b"] * 10_000
    vals = np.concatenate([rng.normal(100, 15, 30_000), rng.exponential(5, 10_000)])
    df = spark.createDataFrame(
        pd.DataFrame({"k": keys, "v": vals.astype(float)})
    ).repartition(8)
    qs = [0.1, 0.5, 0.9]
    out = sketch_by_key(
        df,
        ["k"],
        "v",
        lambda: KLL(k=200),
        lambda s: [float(s.quantile(q)) for q in qs],
        "qv",
        out_type="array<double>",
    ).toPandas()
    assert sorted(out["k"]) == ["a", "b"]
    data = {"a": vals[:30_000], "b": vals[30_000:]}
    for _, row in out.iterrows():
        xs = np.sort(data[row["k"]])
        assert len(row["qv"]) == 3
        for q, v in zip(qs, row["qv"]):
            rank = np.searchsorted(xs, v) / xs.size
            assert abs(rank - q) <= 4 * 2.2 / 200, (row["k"], q, v, rank)

"""Cuckoo filter laws: zero false negatives for inserted keys, FPR
vs the 2·bucket/2^f bound, deterministic rebuild, delete semantics
(kept keys stay, deleted keys fall to FPR level, absent-key delete
raises), envelope roundtrip, mutability guards, block sharding."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.cuckoo import (
    CuckooFilter,
    build_cuckoo_filter,
    cuckoo_contains,
)


def _keys(n, prefix="k"):
    return [f"{prefix}{i:07d}" for i in range(n)]


@pytest.fixture(scope="module")
def built(spark):
    df = spark.createDataFrame([(k,) for k in _keys(20000)], "key string")
    cf = build_cuckoo_filter(df, "key", fp_bits=16, salt=3, target_block_keys=1 << 12)
    return cf


@pytest.mark.spark
def test_no_false_negatives_and_sharded(built):
    assert built.nblocks > 1  # the distributed path actually sharded
    hits = built.contains_batch(_keys(20000))
    assert hits.all()
    assert built.n_keys == 20000


@pytest.mark.spark
def test_fpr_within_bound(built):
    n_neg = 60000
    negs = [f"zz-neg-{i}" for i in range(n_neg)]
    fp = int(built.contains_batch(negs).sum())
    bound = built.fpr_bound()
    sd = (bound * (1 - bound) / n_neg) ** 0.5
    assert fp / n_neg <= bound + 4 * sd
    assert fp / n_neg > 0 or bound < 1e-3  # bound is tight-ish, not vacuous


@pytest.mark.spark
def test_deterministic_rebuild(spark, built):
    df = spark.createDataFrame([(k,) for k in _keys(20000)], "key string")
    again = build_cuckoo_filter(df, "key", fp_bits=16, salt=3, target_block_keys=1 << 12)
    assert again.state_bytes() == built.state_bytes()


@pytest.mark.spark
def test_delete_semantics(spark):
    df = spark.createDataFrame([(k,) for k in _keys(5000)], "key string")
    cf = build_cuckoo_filter(df, "key", fp_bits=16, salt=7, target_block_keys=1 << 11)
    gone = _keys(1000)          # first 1000 deleted
    kept = _keys(5000)[1000:]
    assert cf.delete_batch(gone) == 1000
    assert cf.n_keys == 4000
    assert cf.contains_batch(kept).all()                  # no collateral FNs
    resid = cf.contains_batch(gone).mean()                # deleted -> FPR level
    assert resid <= cf.fpr_bound() + 4 * (cf.fpr_bound() / 1000) ** 0.5
    with pytest.raises(KeyError):
        cf.delete_batch(["zz-was-never-inserted-0000001"])


@pytest.mark.spark
def test_envelope_roundtrip_and_probe_column(spark):
    df = spark.createDataFrame([(k,) for k in _keys(3000)], "key string")
    cf = build_cuckoo_filter(df, "key", fp_bits=8, salt=1, target_block_keys=1 << 11)
    blob = cf.serialize()
    from btl_bloomfilter_spark.operators.base import Sketch

    back = Sketch.deserialize(blob)
    assert isinstance(back, CuckooFilter)
    assert back.state_bytes() == cf.state_bytes()
    assert back.contains_batch(_keys(3000)).all()
    # distributed probe column: pure map over the broadcast envelope
    from pyspark.sql import functions as F

    frac = (
        df.select(cuckoo_contains(spark, cf, "key").cast("int").alias("h"))
        .agg(F.avg("h"))
        .collect()[0][0]
    )
    assert frac == 1.0


def test_guards():
    cf = CuckooFilter(fp_bits=16)
    with pytest.raises(NotImplementedError):
        cf.update(["x"])
    with pytest.raises(NotImplementedError):
        cf.merge(CuckooFilter(fp_bits=16))
    with pytest.raises(ValueError):
        CuckooFilter(fp_bits=12)


def test_block_solver_deterministic_and_full():
    from btl_bloomfilter_spark.operators.cuckoo import _build_block

    u = np.random.default_rng(5).integers(0, 2**63, size=5000, dtype=np.int64).view(np.uint64)
    a = _build_block(u, 3, 9, 16)
    b = _build_block(u, 3, 9, 16)
    assert a == b
    seed, nb, tb = a
    t = np.frombuffer(tb, dtype=np.uint16)
    n_distinct = np.unique(u).shape[0]
    assert (t != 0).sum() == n_distinct  # every key stored exactly once
    assert nb * 4 >= n_distinct

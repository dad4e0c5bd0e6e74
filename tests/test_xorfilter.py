"""XOR filter: zero false negatives (structural), FPR vs the exact
2^-b law, deterministic rebuild, envelope round-trip, distributed vs
local build equality, multi-block path, probe plan shape."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.xorfilter import (
    XorFilter,
    _build_block,
    _derive,
    _fp_of,
    _peel,
    build_xor_filter,
    xor_contains,
)
from btl_bloomfilter_spark.functions import hashing as H


def _local_filter(keys, fp_bits=8, salt=0, nblocks=1):
    """Driver-side reference build over the same block math."""
    from btl_bloomfilter_spark.functions.hashing import _splitmix64
    from btl_bloomfilter_spark.operators.xorfilter import _usalt

    u = H.hash_strings(list(keys), 1)[:, 0]
    bsel = ((_splitmix64(u ^ _usalt(salt)) >> np.uint64(1)) % np.uint64(nblocks)).astype(np.int64)
    xf = XorFilter(fp_bits=fp_bits, salt=salt, n_keys=len(set(keys)))
    xf.seeds = np.zeros(nblocks, dtype=np.int64)
    xf.seglens = np.zeros(nblocks, dtype=np.int64)
    parts = [b""] * nblocks
    for b in range(nblocks):
        seed, seglen, fpb = _build_block(u[bsel == b], b, salt, fp_bits)
        xf.seeds[b], xf.seglens[b], parts[b] = seed, seglen, fpb
    dt = np.uint8 if fp_bits <= 8 else np.uint16
    xf.fps = np.frombuffer(b"".join(parts), dtype=dt).copy()
    xf.offsets = np.zeros(nblocks + 1, dtype=np.int64)
    np.cumsum(3 * xf.seglens, out=xf.offsets[1:])
    return xf


KEYS = [f"key-{i:06d}" for i in range(20000)]
NEGS = [f"neg-{i:06d}" for i in range(60000)]


def test_no_false_negatives_and_fpr_bound():
    for bits in (8, 16):
        xf = _local_filter(KEYS, fp_bits=bits)
        assert xf.contains_batch(KEYS).all()
        fpr = xf.contains_batch(NEGS).mean()
        expect = 2.0 ** (-bits)
        # binomial 4-sigma envelope around the EXACT rate
        sd = (expect * (1 - expect) / len(NEGS)) ** 0.5
        assert fpr <= expect + 4 * sd, (bits, fpr)


def test_bits_per_key_beats_bloom_at_matched_fpr():
    xf = _local_filter(KEYS, fp_bits=8)
    bpk = xf.total_bits / xf.n_keys
    assert bpk < 10.5  # ~1.23 * 8 + block overhead
    # Bloom needs 1.44*log2(1/fpr) = 11.54 bits/key at fpr 2^-8
    assert bpk < 1.44 * 8


def test_deterministic_rebuild_and_envelope_roundtrip():
    a = _local_filter(KEYS[:5000], fp_bits=8, salt=7)
    b = _local_filter(KEYS[:5000], fp_bits=8, salt=7)
    assert a.fps.tobytes() == b.fps.tobytes()
    assert np.array_equal(a.seeds, b.seeds)
    from btl_bloomfilter_spark.operators.base import Sketch

    c = Sketch.deserialize(a.serialize())
    assert isinstance(c, XorFilter)
    assert c.fps.tobytes() == a.fps.tobytes()
    assert c.fp_bits == a.fp_bits and c.n_keys == a.n_keys
    assert c.contains_batch(KEYS[:100]).all()


def test_multiblock_equals_singleblock_semantics():
    # same membership answers for members regardless of sharding
    xf1 = _local_filter(KEYS[:8000], nblocks=1)
    xf4 = _local_filter(KEYS[:8000], nblocks=4)
    assert xf1.contains_batch(KEYS[:8000]).all()
    assert xf4.contains_batch(KEYS[:8000]).all()
    assert xf4.nblocks == 4 and xf4.offsets[-1] == xf4.fps.shape[0]


def test_update_merge_raise():
    xf = _local_filter(KEYS[:100])
    with pytest.raises(NotImplementedError):
        xf.update(["x"])
    with pytest.raises(NotImplementedError):
        xf.merge(xf)


def test_peel_detects_2core():
    # Construct an unpeelable instance by hand: two keys with
    # identical slots (duplicate edges) — every slot has count 2.
    h0 = np.array([0, 0])
    h1 = np.array([3, 3])
    h2 = np.array([6, 6])
    assert _peel(h0, h1, h2, 9) is None


def test_build_block_folds_duplicate_hashes():
    u = np.array([5, 5, 9, 9, 9, 11], dtype=np.uint64)
    seed, seglen, fpb = _build_block(u, 0, 0, 8)
    assert seglen > 0
    B = np.frombuffer(fpb, dtype=np.uint8)
    h0, h1, h2, fpsrc = _derive(np.unique(u), seed, seglen)
    assert ((B[h0] ^ B[h1] ^ B[h2]) == _fp_of(fpsrc, 8)).all()


def test_distributed_build_matches_local(spark):
    df = spark.createDataFrame([(k,) for k in KEYS[:6000]], "key string")
    # duplicate rows on purpose: distinct() must fold them
    df = df.union(df.limit(500))
    xf = build_xor_filter(df, "key", fp_bits=8, salt=3, nblocks=4)
    ref = _local_filter(KEYS[:6000], fp_bits=8, salt=3, nblocks=4)
    assert xf.n_keys == 6000
    assert xf.fps.tobytes() == ref.fps.tobytes()
    assert np.array_equal(xf.seeds, ref.seeds)
    # probe through the broadcast column path
    hits = (
        df.select(xor_contains(spark, xf, "key").alias("h"))
        .agg({"h": "min"})
        .collect()[0][0]
    )
    assert hits is True


def test_probe_plan_is_pure_map(spark):
    df = spark.createDataFrame([(k,) for k in KEYS[:1000]], "key string")
    xf = _local_filter(KEYS[:1000])
    plan = (
        df.select(xor_contains(spark, xf, "key").alias("h"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "EvalPython" in plan

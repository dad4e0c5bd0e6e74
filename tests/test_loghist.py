"""Log-linear histogram (operators/loghist): exact-bucketing spec
parity, contiguity/relative-width laws, merge partition invariance,
quantile interval guarantees, sketch-vs-Catalyst agreement, and the
distributed build path."""

import random

import numpy as np
import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.loghist import (
    LogHistogram,
    grouped_log_quantiles,
    grouped_log_quantiles_sql,
)


def _spec_id(v: int, k: int) -> int:
    """Independent Python-bigint spec of the bucket function."""
    j = k.bit_length() - 1
    e = v.bit_length() - 1 if v > 0 else 0
    s = max(e - j, 0)
    return s * k + (v >> s)


def _probe_values():
    vals = list(range(0, 600))
    for e in range(1, 63):
        for d in (-1, 0, 1):
            v = (1 << e) + d
            if 0 <= v <= (1 << 62):
                vals.append(v)
    rng = random.Random(42)
    vals += [rng.randrange(0, 1 << 62) for _ in range(500)]
    return sorted(set(vals))


@pytest.mark.parametrize("k", [2, 16, 64, 1024])
def test_bucket_spec_and_bounds_laws(k):
    vals = _probe_values()
    h = LogHistogram(k=k)
    ids = h._ids(np.array(vals, dtype=np.int64))
    prev_id = -1
    prev_hi = 0
    for v, got in zip(vals, ids.tolist()):
        assert got == _spec_id(v, k), (v, k)
        lo, w = LogHistogram.bucket_bounds(got, k)
        assert lo <= v < lo + w, (v, lo, w)
        assert w <= max(lo, 1) / k or w == 1, (v, lo, w)  # relative width law
        # monotone + contiguous: a later value's bucket never precedes,
        # and bucket intervals tile without gaps
        assert got >= prev_id
        if got != prev_id:
            if prev_id >= 0 and got == prev_id + 1:
                assert lo == prev_hi  # adjacent buckets touch exactly
            prev_id, prev_hi = got, lo + w


def test_contract_errors():
    with pytest.raises(ValueError):
        LogHistogram(k=3)
    with pytest.raises(ValueError):
        LogHistogram(k=1)
    h = LogHistogram(k=64)
    with pytest.raises(ValueError):
        h.update(np.array([-1]))
    with pytest.raises(ValueError):
        h.update(np.array([(1 << 62) + 1]))
    with pytest.raises(ValueError):
        h.quantile(0.5)  # empty
    h.update([1, 2, 3])
    with pytest.raises(ValueError):
        h.quantile(0.0)
    with pytest.raises(ValueError):
        LogHistogram(k=64).merge(LogHistogram(k=32))


def test_merge_partition_invariance_and_envelope():
    rng = random.Random(7)
    vals = [rng.randrange(0, 1 << 40) for _ in range(3000)]
    serial = LogHistogram(k=64)
    serial.update(vals)
    cuts = sorted({0, len(vals), *[rng.randrange(len(vals)) for _ in range(5)]})
    partials = []
    for a, b in zip(cuts, cuts[1:]):
        p = LogHistogram(k=64)
        p.update(vals[a:b])
        partials.append(p)
    rng.shuffle(partials)
    acc = LogHistogram(k=64)
    for p in partials:
        acc.merge(p)
    np.testing.assert_array_equal(acc.counts, serial.counts)
    assert acc.n == serial.n
    # envelope roundtrip
    from btl_bloomfilter_spark.operators.base import Sketch

    back = Sketch.deserialize(serial.serialize())
    np.testing.assert_array_equal(back.counts, serial.counts)
    assert back.n == serial.n and back.k == serial.k
    assert serial.metrics()["buckets_used"] > 0


@pytest.mark.parametrize("dist", ["uniform", "heavy_tail", "small_exact"])
def test_quantile_interval_contains_exact(dist):
    rng = random.Random(13)
    if dist == "uniform":
        vals = [rng.randrange(0, 100_000) for _ in range(5000)]
    elif dist == "heavy_tail":
        vals = [int(2 ** (rng.random() * 40)) for _ in range(5000)]
    else:
        vals = [rng.randrange(0, 100) for _ in range(5000)]  # inside exact region
    k = 64
    h = LogHistogram(k=k)
    h.update(vals)
    sv = sorted(vals)
    for q in (0.5, 0.9, 0.99, 1.0):
        rank = max(1, -(-int(round(q * 1000)) * len(vals) // 1000))
        true_q = sv[rank - 1]
        lo, hi = h.quantile_bounds(q)
        assert lo <= true_q < hi, (dist, q, lo, true_q, hi)
        assert (hi - lo) <= max(lo, 1) / k or (hi - lo) == 1
        if dist == "small_exact":
            assert hi - lo == 1 and lo == true_q  # exact below 2k


@pytest.mark.spark
def test_grouped_matches_sketch_and_exact(spark):
    rng = random.Random(21)
    rows = []
    for g in ("a", "b"):
        base = 10 if g == "a" else 1000
        for _ in range(800):
            rows.append((g, int(base * (1 + rng.random() * 200))))
    df = spark.createDataFrame(rows, "g string, v long")
    out = grouped_log_quantiles(df, ["g"], "v", k=64, qs_milli=(500, 900, 990))
    got = {(r.g, r.q_milli): r for r in out.collect()}
    for g in ("a", "b"):
        vals = sorted(v for gg, v in rows if gg == g)
        h = LogHistogram(k=64)
        h.update([v for gg, v in rows if gg == g])
        for qm in (500, 900, 990):
            r = got[(g, qm)]
            lo, hi = h.quantile_bounds(qm / 1000)
            assert (r.est_lo, r.est_hi) == (lo, hi)  # sketch == Catalyst
            rank = max(1, -(-qm * len(vals) // 1000))
            true_q = vals[rank - 1]
            assert r.est_lo <= true_q < r.est_hi
            assert r.n == len(vals)
            assert r.est_mid == float(lo) + float(hi - lo) / 2.0


@pytest.mark.spark
def test_grouped_duckdb_twin_and_negative_raise(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(33)
    pdf = pd.DataFrame(
        {
            "g": [("x" if i % 3 else "y") for i in range(2000)],
            "v": [rng.randrange(0, 1 << 30) for _ in range(2000)],
        }
    )
    p = str(tmp_path / "lh.parquet")
    pdf.to_parquet(p)
    got = (
        grouped_log_quantiles(
            spark.read.parquet(p), ["g"], "v", k=32, qs_milli=(250, 750, 999)
        )
        .orderBy("g", "q_milli")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        grouped_log_quantiles_sql("t", "g", "v", k=32, qs_milli=(250, 750, 999))
        + " ORDER BY g, q_milli"
    ).df()
    assert got.values.tolist() == want.values.tolist()
    # negative values raise in BOTH engines
    bad = spark.createDataFrame([("g", -5)], "g string, v long")
    with pytest.raises(Exception, match="negative value"):
        grouped_log_quantiles(bad, ["g"], "v", k=32).collect()
    con.sql("CREATE VIEW neg AS SELECT 'g' AS g, -5::BIGINT AS v")
    with pytest.raises(Exception):
        con.sql(grouped_log_quantiles_sql("neg", "g", "v", k=32)).df()


@pytest.mark.spark
def test_build_sketch_integration(spark):
    from btl_bloomfilter_spark.plans.agg import build_sketch

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(F.floor(F.abs(F.col("value")) * 100).cast("long").alias("v"))
    )
    h = build_sketch(ev, "v", lambda: LogHistogram(k=64), repartition=4)
    vals = sorted(r.v for r in ev.collect())
    assert h.n == len(vals)
    lo, hi = h.quantile_bounds(0.9)
    rank = max(1, -(-900 * len(vals) // 1000))
    assert lo <= vals[rank - 1] < hi


def test_invalid_qs(spark):
    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(ValueError):
        grouped_log_quantiles(df, ["g"], "v", qs_milli=())
    with pytest.raises(ValueError):
        grouped_log_quantiles(df, ["g"], "v", qs_milli=(0,))
    with pytest.raises(ValueError):
        grouped_log_quantiles(df, ["g"], "v", qs_milli=(1001,))
    with pytest.raises(ValueError):
        grouped_log_quantiles(df, ["g"], "v", k=48)


def test_float_column_rejected(spark):
    # implicit double->long casts truncate in Spark but round in DuckDB:
    # float columns must be rejected, not silently quantized
    df = spark.createDataFrame([("g", 3.7)], "g string, v double")
    with pytest.raises(ValueError, match="non-integral"):
        grouped_log_quantiles(df, ["g"], "v", k=32)
    ok = spark.createDataFrame([("g", 3)], "g string, v int")
    assert grouped_log_quantiles(ok, ["g"], "v", k=32, qs_milli=(500,)).count() == 1

"""Z-order layout: Morton interleave vs a Python bit-reference, DuckDB
twin parity, exact integer normalization, and the pruning-evidence
measurement (z-order tightens per-partition bounds on EVERY dimension;
a linear sort only on the first)."""

import random

import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.functions.layout import (
    cluster_by_zorder,
    interleave_bits,
    interleave_bits_sql,
    normalize_minmax,
    normalize_minmax_sql,
)


def _ref_morton(vals, bits):
    n = len(vals)
    out = 0
    for j, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + (n - 1 - j))
    return out


@pytest.mark.spark
@pytest.mark.parametrize("ncols,bits", [(2, 16), (3, 8), (2, 4), (4, 15)])
def test_interleave_matches_reference(spark, ncols, bits):
    rng = random.Random(ncols * bits)
    rows = [tuple(rng.randrange(1 << bits) for _ in range(ncols)) for _ in range(200)]
    cols = [f"c{i}" for i in range(ncols)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} long" for c in cols))
    got = df.select(*cols, interleave_bits(*cols, bits=bits).alias("z")).collect()
    for r in got:
        assert r["z"] == _ref_morton([r[c] for c in cols], bits)


def test_interleave_sql_twin_parity():
    import duckdb

    rng = random.Random(5)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(300)]
    con = duckdb.connect()
    con.sql("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    expr = interleave_bits_sql("a", "b", bits=16)
    for a, b, z in con.sql(f"SELECT a, b, {expr} FROM t").fetchall():
        assert z == _ref_morton([a, b], 16)


@pytest.mark.spark
def test_normalize_exact_and_clamped(spark):
    import duckdb

    lo, hi, bits = 100, 1_000_000, 16
    rng = random.Random(7)
    vals = [rng.randrange(-50_000, 2_000_000) for _ in range(500)]  # incl. out-of-range
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["n"] for r in df.select("v", normalize_minmax("v", lo, hi, bits=bits).alias("n")).collect()}
    con = duckdb.connect()
    con.sql("CREATE TABLE t(v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = dict(con.sql(f"SELECT v, {normalize_minmax_sql('v', lo, hi, bits=bits)} FROM t").fetchall())
    top = (1 << bits) - 1
    for v in vals:
        clamped = max(lo, min(hi, v))
        exact = (clamped - lo) * top // (hi - lo)
        assert got[v] == want[v] == exact
        assert 0 <= got[v] <= top


@pytest.mark.spark
def test_zkey_name_collision_raises(spark):
    df = spark.createDataFrame([(1, 2, 0)], "x long, y long, __zkey long")
    with pytest.raises(ValueError):
        cluster_by_zorder(df, interleave_bits("x", "y", bits=4))


def test_validation():
    with pytest.raises(ValueError):
        interleave_bits("a", bits=16)  # 1 column
    with pytest.raises(ValueError):
        interleave_bits("a", "b", "c", "d", bits=16)  # 64 bits
    with pytest.raises(ValueError):
        interleave_bits_sql("a", "b", bits=32)
    with pytest.raises(ValueError):
        normalize_minmax_sql("a", 5, 5)


@pytest.mark.spark
def test_zorder_prunes_both_dimensions(spark):
    # 256x256 uniform grid; 16 output partitions.  Linear sort on x
    # leaves each partition's y-range at ~full width (255); z-order
    # bounds BOTH dims near sqrt of the cell count per partition.
    rows = [(x, y) for x in range(256) for y in range(256)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(32)
    z = interleave_bits("x", "y", bits=8)
    zed = cluster_by_zorder(df, z, num_partitions=16)
    assert zed.count() == 256 * 256 and zed.columns == ["x", "y"]

    def widths(layout):
        pid = F.spark_partition_id()
        agg = (
            layout.withColumn("p", pid)
            .groupBy("p")
            .agg(
                (F.max("x") - F.min("x")).alias("wx"),
                (F.max("y") - F.min("y")).alias("wy"),
            )
            .collect()
        )
        n = len(agg)
        return sum(r["wx"] for r in agg) / n, sum(r["wy"] for r in agg) / n

    linear = df.repartitionByRange(16, "x").sortWithinPartitions("x")
    _, lin_wy = widths(linear)
    z_wx, z_wy = widths(zed)
    assert lin_wy > 200  # linear layout: y unclustered, ~full width
    # z-order: both dims bounded well below full width
    assert z_wx < 128 and z_wy < 128, (z_wx, z_wy)


# ---------------------------------------------------------------------------
# Quantile-driven balanced range partitioning
# ---------------------------------------------------------------------------

import numpy as np

from btl_bloomfilter_spark.functions.layout import (
    exact_range_boundaries,
    kll_range_boundaries,
    range_bucket,
    range_bucket_sql,
)


def _brute_boundaries(vals, B):
    s = sorted(vals)
    n = len(s)
    return [s[(i * n + B - 1) // B - 1] for i in range(1, B)]


def test_exact_boundaries_match_brute_force(spark):
    rng = random.Random(31)
    vals = [rng.randrange(0, 500) for _ in range(3000)]  # heavy duplicates
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    for B in (2, 7, 16):
        assert exact_range_boundaries(df, "x", B) == _brute_boundaries(vals, B)


def test_bucket_sizes_balanced_when_distinct(spark):
    rng = random.Random(5)
    vals = rng.sample(range(10**9), 4096)
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    B = 16
    bounds = exact_range_boundaries(df, "x", B)
    sizes = {
        r.b: r.c
        for r in df.select(range_bucket("x", bounds).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    n = len(vals)
    assert sum(sizes.values()) == n
    assert set(sizes) == set(range(B))
    assert all(n // B <= c <= -(-n // B) for c in sizes.values())


def test_heavy_ties_collapse_deterministically(spark):
    # one dominant value: its boundary repeats, buckets collapse (empty
    # buckets) instead of splitting the tie arbitrarily
    vals = [7] * 900 + list(range(100))
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    bounds = exact_range_boundaries(df, "x", 8)
    assert bounds.count(7) >= 5
    asg = df.select("x", range_bucket("x", bounds).alias("b"))
    rows = asg.collect()
    assert len({r.b for r in rows if r.x == 7}) == 1  # every tie, one bucket
    assert sum(1 for _ in rows) == len(vals)


def test_nulls_excluded_from_boundaries_and_null_bucket(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,), (None,)], "x int")
    bounds = exact_range_boundaries(df, "x", 2)
    assert bounds == [2]  # rank ceil(4/2)=2 over non-nulls
    got = {r.x: r.b for r in df.select("x", range_bucket("x", bounds).alias("b")).collect()}
    assert got[None] is None and got[2] == 0 and got[3] == 1


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "x long")
    with pytest.raises(ValueError, match="no non-null values"):
        exact_range_boundaries(df, "x", 4)
    with pytest.raises(ValueError, match="n_buckets"):
        exact_range_boundaries(df, "x", 1)


def test_boundaries_partition_invariant(spark):
    rng = random.Random(11)
    vals = [rng.randrange(0, 1000) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    b1 = exact_range_boundaries(df, "x", 10)
    b2 = exact_range_boundaries(df.repartition(17), "x", 10, partitions=5)
    assert b1 == b2


def test_range_bucket_sql_twin_parity(spark, tmp_path):
    import duckdb

    rng = random.Random(42)
    vals = [rng.gauss(0.0, 10.0) for _ in range(1500)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, x double")
    path = str(tmp_path / "vals.parquet")
    df.write.mode("overwrite").parquet(path)
    df2 = spark.read.parquet(path)
    bounds = exact_range_boundaries(df2, "x", 9)
    got = {
        r.id: r.b for r in df2.select("id", range_bucket("x", bounds).alias("b")).collect()
    }
    con = duckdb.connect()
    ref = dict(
        con.execute(
            f"SELECT id, {range_bucket_sql('x', bounds)} FROM read_parquet('{path}/*.parquet')"
        ).fetchall()
    )
    assert got == ref


def test_numpy_scalar_boundaries_coerced(spark):
    df = spark.createDataFrame([(1,), (5,), (9,)], "x long")
    bounds = [np.int64(2), np.int64(2**60 + 3)]  # beyond float53 — must stay int
    got = sorted(r.b for r in df.select(range_bucket("x", bounds).alias("b")).collect())
    assert got == [0, 1, 1]
    sql = range_bucket_sql("x", bounds)
    assert repr(2**60 + 3) in sql and "CAST" not in sql


def test_kll_boundaries_within_rank_tolerance(spark):
    rng = random.Random(3)
    vals = [rng.gauss(0, 1) for _ in range(20000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    B = 10
    bounds = kll_range_boundaries(df, "x", B, k=200)
    assert all(isinstance(b, float) for b in bounds)
    s = sorted(vals)
    n = len(s)
    import bisect

    for i, b in enumerate(bounds, start=1):
        rank = bisect.bisect_right(s, b)
        assert abs(rank - (i * n + B - 1) // B) <= 0.03 * n  # KLL k=200 rank error


def test_kll_boundaries_rejects_degenerate_buckets(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="n_buckets"):
        kll_range_boundaries(df, "x", 1)


def test_numpy_bool_boundary_rejected(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(TypeError, match="boolean boundaries"):
        df.select(range_bucket("x", [np.bool_(True)])).collect()


def test_boundaries_release_checkpoint_blocks(spark):
    # both the success path and the empty-input raise must unpersist
    # the checkpointed histogram (review finding, k_core leak class)
    jsc = spark.sparkContext._jsc.sc()
    df = spark.createDataFrame([(v,) for v in range(100)], "x long")
    before = jsc.getPersistentRDDs().size()
    exact_range_boundaries(df, "x", 4)
    assert jsc.getPersistentRDDs().size() == before
    empty = spark.createDataFrame([], "x long")
    with pytest.raises(ValueError, match="no non-null"):
        exact_range_boundaries(empty, "x", 4)
    assert jsc.getPersistentRDDs().size() == before

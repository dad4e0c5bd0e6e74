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

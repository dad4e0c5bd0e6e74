"""Grouped OLS regression (operators/trend.grouped_ols): brute
moment parity on the exact doubles, perfect-line r2 == 1.0 law,
constant-axis NULL semantics, partition invariance, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.trend import grouped_ols, grouped_ols_sql


def _brute(rows, x_scale, y_scale):
    """rows: list of (x, y) floats.  Mirrors the engines' fixed
    expression shapes exactly (integer moments, float(int)/float(int)
    divisions) so doubles are comparable with ==."""
    q = [
        (math.floor(x * x_scale), math.floor(y * y_scale))
        for x, y in rows
        if x is not None and x == x and y is not None and y == y
    ]
    n = len(q)
    if n == 0:
        return None
    sx = sum(a for a, _ in q)
    sy = sum(b for _, b in q)
    sxx = sum(a * a for a, _ in q)
    sxy = sum(a * b for a, b in q)
    syy = sum(b * b for _, b in q)
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    dy = n * syy - sy * sy
    slope = float(num * x_scale) / float(den * y_scale) if den != 0 else None
    intercept = (
        float(sy * sxx - sx * sxy) / float(den * y_scale) if den != 0 else None
    )
    r2 = (
        (float(num) * float(num)) / (float(den) * float(dy))
        if den != 0 and dy != 0
        else None
    )
    return (n, slope, intercept, r2)


def test_matches_brute_with_ties(spark):
    rng = random.Random(7)
    rows = []
    for g in range(5):
        n = rng.randint(2, 60)
        for _ in range(n):
            x = float(rng.randint(0, 20))  # heavy x ties
            y = (g - 2) * 0.7 * x + rng.gauss(0.0, 3.0)
            rows.append((g, x, y))
    df = spark.createDataFrame(rows, "g int, x double, y double")
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in grouped_ols(df, ["g"], "x", "y", y_scale=100).collect()
    }
    for g in range(5):
        want = _brute([(x, y) for gg, x, y in rows if gg == g], 1, 100)
        assert got[g] == want, (g, got[g], want)


def test_perfect_line_r2_exactly_one(spark):
    rows = [(0, float(i), 3.0 * i + 5.0) for i in range(30)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    r = grouped_ols(df, ["g"], "x", "y").collect()[0]
    assert r["slope"] == 3.0
    assert r["intercept"] == 5.0
    assert r["r2"] == 1.0


def test_constant_axis_semantics(spark):
    rows = [(0, 1.0, float(i)) for i in range(10)]  # constant x
    rows += [(1, float(i), 4.0) for i in range(10)]  # constant y
    rows += [(2, 5.0, 5.0)]  # n = 1
    df = spark.createDataFrame(rows, "g int, x double, y double")
    got = {r["g"]: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    assert got[0]["slope"] is None and got[0]["r2"] is None
    assert got[1]["slope"] == 0.0 and got[1]["intercept"] == 4.0
    assert got[1]["r2"] is None  # 0/0: constant y
    assert got[2]["slope"] is None and got[2]["n"] == 1


def test_null_nan_dropped_and_partition_invariance(spark):
    rows = [(0, float(i), 2.0 * i) for i in range(20)]
    df = spark.createDataFrame(
        rows + [(0, None, 9.0), (0, 3.0, float("nan"))],
        "g int, x double, y double",
    )
    a = grouped_ols(df, ["g"], "x", "y").collect()[0]
    assert a["n"] == 20 and a["slope"] == 2.0
    b = grouped_ols(df.repartition(7, "y"), ["g"], "x", "y").collect()[0]
    assert (a["n"], a["slope"], a["intercept"], a["r2"]) == (
        b["n"],
        b["slope"],
        b["intercept"],
        b["r2"],
    )


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(42)
    rows = []
    for g in range(6):
        slope = (g - 2) * 0.4
        for i in range(80):
            rows.append((g, float(i // 3), slope * i + rng.gauss(0.0, 2.0)))
    pdf = pd.DataFrame(rows, columns=["g", "x", "y"])
    p = str(tmp_path / "ols.parquet")
    pdf.to_parquet(p)
    got = (
        grouped_ols(spark.read.parquet(p), ["g"], "x", "y", y_scale=1000)
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        grouped_ols_sql("t", "g", "x", "y", y_scale=1000) + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([(0, 1.0, 1.0)], "g int, x double, y double")
    with pytest.raises(ValueError):
        grouped_ols(df, ["g"], "x", "y", x_scale=0)
    with pytest.raises(ValueError):
        grouped_ols_sql("t", "g", "x", "y", y_scale=-1)

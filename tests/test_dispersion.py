"""Grouped dispersion (operators/stats.grouped_dispersion): brute
exact parity, Poisson-ish fano ≈ 1 / constant fano == 0 / bursty
fano ≫ 1 laws, all-zero NULL semantics, float rejection, negative
raise, partition invariance, DuckDB twin."""

import random
from fractions import Fraction

import pytest

from btl_bloomfilter_spark.operators.stats import (
    grouped_dispersion,
    grouped_dispersion_sql,
)


def _brute(xs):
    n = len(xs)
    s = sum(xs)
    q = sum(x * x for x in xs)
    num = n * q - s * s
    return (
        n, s, float(Fraction(s, n)) if s % n == 0 else s / float(n),
        float(num) / float(n * n),
        float(num) / float(n * s) if s > 0 else None,
        float(num) / float(s * s) if s > 0 else None,
    )


def test_matches_brute(spark):
    rng = random.Random(2)
    rows = []
    for g in range(4):
        for _ in range(rng.randint(30, 120)):
            rows.append((g, rng.randint(0, 40)))
    df = spark.createDataFrame(rows, "g int, c long")
    got = {
        r["g"]: (r["n"], r["total"], r["mean"], r["var_pop"], r["fano"], r["cv2"])
        for r in grouped_dispersion(df, ["g"], "c").collect()
    }
    for g in range(4):
        xs = [c for gg, c in rows if gg == g]
        n, s = len(xs), sum(xs)
        q = sum(x * x for x in xs)
        num = n * q - s * s
        want = (n, s, s / float(n), float(num) / float(n * n),
                float(num) / float(n * s), float(num) / float(s * s))
        assert got[g] == want, g


def test_dispersion_laws(spark):
    # constant counts: var 0, fano 0; a burst: fano >> 1
    rows = [(0, 5)] * 50 + [(1, 0)] * 99 + [(1, 100)]
    df = spark.createDataFrame(rows, "g int, c long")
    got = {r["g"]: r for r in grouped_dispersion(df, ["g"], "c").collect()}
    assert got[0]["fano"] == 0.0 and got[0]["var_pop"] == 0.0
    assert got[1]["fano"] > 50  # one 100-burst in 100 windows
    # all-zero group: mean 0, fano/cv2 NULL
    z = spark.createDataFrame([(0, 0)] * 7, "g int, c long")
    r = grouped_dispersion(z, ["g"], "c").collect()[0]
    assert r["mean"] == 0.0 and r["fano"] is None and r["cv2"] is None


def test_float_rejected_and_negative_raises(spark):
    fdf = spark.createDataFrame([(0, 1.5)], "g int, c double")
    with pytest.raises(ValueError):
        grouped_dispersion(fdf, ["g"], "c")
    neg = spark.createDataFrame([(0, -3)], "g int, c long")
    with pytest.raises(Exception, match="negative count"):
        grouped_dispersion(neg, ["g"], "c").collect()


def test_partition_invariance(spark):
    rng = random.Random(10)
    rows = [(0, rng.randint(0, 9)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g int, c long")
    one = grouped_dispersion(df, ["g"], "c").collect()[0]
    two = grouped_dispersion(df.repartition(19, "c"), ["g"], "c").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(33)
    rows = [(rng.randint(0, 4), rng.randint(0, 60)) for _ in range(1200)]
    pdf = pd.DataFrame(rows, columns=["g", "c"])
    p = str(tmp_path / "dsp.parquet")
    pdf.to_parquet(p)
    got = grouped_dispersion(spark.read.parquet(p), ["g"], "c").orderBy("g").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(grouped_dispersion_sql("__t", "g", "c") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_column_arg_float_rejected(spark):
    # review catch: Column-typed args must hit the integral guard too
    from pyspark.sql import functions as SF

    df = spark.createDataFrame([(0, 1.5)], "g int, rate double")
    with pytest.raises(ValueError):
        grouped_dispersion(df, ["g"], SF.col("rate"))

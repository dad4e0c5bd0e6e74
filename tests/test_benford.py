"""Benford first-digit deviation (operators/profile.benford_deviation):
brute fixed-point parity, Benford-by-construction low chi² vs uniform
high chi², zero-count digit materialization, zero/NULL/negative
semantics, float rejection, partition invariance, DuckDB twin."""

import collections
import math
import random

import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.profile import (
    _BENFORD_MICRO,
    benford_deviation,
    benford_deviation_sql,
)


def _brute(vals, scale):
    """vals: nonzero ints.  Mirrors the engines' fixed point exactly."""
    o = collections.Counter(int(str(abs(v))[0]) for v in vals)
    n = len(vals)
    rows = {}
    fp = 0
    for d, p in zip(range(1, 10), _BENFORD_MICRO):
        num = o.get(d, 0) * 10**6 - n * p
        fp += (num * num * scale) // (n * p * 10**6)
    for d, p in zip(range(1, 10), _BENFORD_MICRO):
        num = o.get(d, 0) * 10**6 - n * p
        rows[d] = (
            o.get(d, 0), n, o.get(d, 0) / float(n), p / 1e6,
            float(num) / float(n * 10**6), str(fp), fp / float(scale),
        )
    return rows


def _collect(df):
    return {
        r["digit"]: (
            r["observed"], r["n"], r["share"], r["p_benford"], r["dev"],
            r["chi2_fp"], r["chi2"],
        )
        for r in df.collect()
    }


def test_matches_brute(spark):
    rng = random.Random(5)
    # log-uniform magnitudes -> Benford-ish; plus group 1 uniform
    rows = []
    for _ in range(800):
        rows.append((0, int(math.exp(rng.uniform(0, 14))) + 1))
        rows.append((1, rng.randint(1, 999)))
    df = spark.createDataFrame(rows, "g int, v long")
    out = benford_deviation(df, ["g"], "v")
    for g in range(2):
        got = _collect(out.where(f"g = {g}"))
        want = _brute([v for gg, v in rows if gg == g], 10**6)
        assert got == want, g


def test_benford_vs_uniform_discrimination(spark):
    rng = random.Random(7)
    # Benford-by-construction needs a WHOLE number of decades:
    # exp(U(ln 10, 8 ln 10)) spans exactly 7; a fractional span (the
    # first draft's U(0,16) ~ 6.95 decades) skews low digits and
    # pushed chi2 to ~52 — a wrong validation criterion, not a bug
    rows = [
        (0, int(math.exp(rng.uniform(math.log(10), 8 * math.log(10)))))
        for _ in range(3000)
    ]
    rows += [(1, rng.randint(100, 999)) for _ in range(3000)]
    df = spark.createDataFrame(rows, "g int, v long")
    chi = {
        r["g"]: r["chi2"]
        for r in benford_deviation(df, ["g"], "v").where("digit = 1").collect()
    }
    # dof 8 (mean 8, sd 4): seed-7 sample computes 9.63; uniform
    # 3-digit data fails by orders of magnitude
    assert chi[0] < 21
    assert chi[1] > 200


def test_zero_count_digits_materialized(spark):
    # all values start with 1: digits 2..9 must appear with observed 0
    df = spark.createDataFrame([(0, 10 + i) for i in range(5)], "g int, v long")
    got = _collect(benford_deviation(df, ["g"], "v"))
    assert set(got) == set(range(1, 10))
    assert got[1][0] == 5 and all(got[d][0] == 0 for d in range(2, 10))
    assert got[5][3] == _BENFORD_MICRO[4] / 1e6


def test_zero_null_negative_semantics(spark):
    rows = [(0, -234), (0, 0), (0, None), (0, 21)]
    df = spark.createDataFrame(rows, "g int, v long")
    got = _collect(benford_deviation(df, ["g"], "v"))
    assert got[2][0] == 2 and got[2][1] == 2  # |-234| and 21; 0/NULL dropped


def test_float_rejected(spark):
    df = spark.createDataFrame([(0, 1.5)], "g int, v double")
    with pytest.raises(ValueError):
        benford_deviation(df, ["g"], "v")
    idf = spark.createDataFrame([(0, 15)], "g int, v long")
    with pytest.raises(ValueError):
        benford_deviation(idf, ["g"], "v", scale=0)
    with pytest.raises(ValueError):
        benford_deviation_sql("t", "g", "v", scale=0)


def test_partition_invariance(spark):
    rng = random.Random(9)
    rows = [(0, rng.randint(1, 10**6)) for _ in range(600)]
    df = spark.createDataFrame(rows, "g int, v long")
    one = _collect(benford_deviation(df, ["g"], "v"))
    two = _collect(benford_deviation(df.repartition(13, "v"), ["g"], "v"))
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(31)
    rows = []
    for g in range(3):
        for _ in range(500):
            rows.append(
                (g, int(math.exp(rng.uniform(0, 10 + 2 * g))) + 1
                 if rng.random() < 0.8 else rng.randint(1, 99))
            )
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    p = str(tmp_path / "bf.parquet")
    pdf.to_parquet(p)
    got = (
        benford_deviation(spark.read.parquet(p), ["g"], "v")
        .orderBy("g", "digit")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        benford_deviation_sql("__t", "g", "v") + " ORDER BY g, digit"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_null_group_key(spark):
    # review catch: a NULL group key must keep its REAL counts (plain
    # equi-join orphaned it -> observed=0 for all digits, bogus chi2)
    rows = [(None, 123), (None, 456), (None, 137), ("a", 21)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"], r["digit"]): r["observed"]
        for r in benford_deviation(df, ["g"], "v").collect()
    }
    assert got[(None, 1)] == 2 and got[(None, 4)] == 1
    assert got[("a", 2)] == 1
    # and both engines agree on it
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["g", "v"])
    con = duckdb.connect()
    con.register("__t", pdf)
    want = con.sql(
        benford_deviation_sql("__t", "g", "v") + " ORDER BY g NULLS FIRST, digit"
    ).df()
    gotdf = (
        benford_deviation(spark.createDataFrame(pdf), ["g"], "v")
        .orderBy(F.col("g").asc_nulls_first(), "digit")
        .toPandas()
    )
    pd.testing.assert_frame_equal(gotdf, want, check_dtype=False)


def test_column_arg_float_rejected(spark):
    # review catch: the integral guard must fire for Column args too
    from pyspark.sql import functions as SF

    df = spark.createDataFrame([(0, 1.5)], "g int, price double")
    with pytest.raises(ValueError):
        benford_deviation(df, ["g"], SF.col("price"))

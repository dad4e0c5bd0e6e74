"""Grouped McNemar test (operators/stats.grouped_mcnemar): brute
parity, symmetric-discordance stat ~0 / one-sided discordance laws,
no-discordant-pairs NULL, boolean and 0/1 inputs, bad flag raises,
partition invariance, DuckDB twin."""

import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    grouped_mcnemar,
    grouped_mcnemar_sql,
)


def _brute(pairs):
    n11 = sum(1 for x, y in pairs if x and y)
    n00 = sum(1 for x, y in pairs if not x and not y)
    b = sum(1 for x, y in pairs if x and not y)
    c = sum(1 for x, y in pairs if not x and y)
    stat = float((b - c) ** 2) / float(b + c) if b + c else None
    cc = max(abs(b - c) - 1, 0)
    stat_cc = float(cc * cc) / float(b + c) if b + c else None
    orr = float(b) / float(c) if c else None
    return (len(pairs), n11, n00, b, c, stat, stat_cc, orr)


def test_matches_brute(spark):
    rng = random.Random(103)
    rows = []
    for g in range(4):
        for _ in range(rng.randint(50, 150)):
            rows.append((g, rng.random() < 0.4, rng.random() < 0.6))
    df = spark.createDataFrame(rows, "g int, x boolean, y boolean")
    got = {
        r["g"]: (r["n"], r["n11"], r["n00"], r["b"], r["c"], r["stat"],
                 r["stat_cc"], r["odds_ratio"])
        for r in grouped_mcnemar(df, ["g"], "x", "y").collect()
    }
    for g in range(4):
        assert got[g] == _brute([(x, y) for gg, x, y in rows if gg == g]), g


def test_laws(spark):
    # equal discordance both ways: stat == 0
    rows = [(0, True, False)] * 7 + [(0, False, True)] * 7 + [(0, True, True)] * 5
    df = spark.createDataFrame(rows, "g int, x boolean, y boolean")
    r = grouped_mcnemar(df, ["g"], "x", "y").collect()[0]
    assert r["stat"] == 0.0 and r["odds_ratio"] == 1.0
    # one-sided discordance: stat == b (since c == 0), odds NULL
    one = spark.createDataFrame(
        [(0, True, False)] * 9 + [(0, False, False)] * 3,
        "g int, x boolean, y boolean",
    )
    r1 = grouped_mcnemar(one, ["g"], "x", "y").collect()[0]
    assert r1["stat"] == 9.0 and r1["odds_ratio"] is None
    assert r1["stat_cc"] == 64.0 / 9.0
    # no discordant pairs: stat NULL, not 0
    conc = spark.createDataFrame(
        [(0, True, True)] * 4 + [(0, False, False)] * 4,
        "g int, x boolean, y boolean",
    )
    rc = grouped_mcnemar(conc, ["g"], "x", "y").collect()[0]
    assert rc["stat"] is None and rc["stat_cc"] is None


def test_int_flags_and_bad_value_raises(spark):
    df = spark.createDataFrame(
        [(0, 1, 0), (0, 0, 1), (0, 1, 1), (0, None, 1)], "g int, x int, y int"
    )
    r = grouped_mcnemar(df, ["g"], "x", "y").collect()[0]
    assert (r["n"], r["b"], r["c"]) == (3, 1, 1)
    bad = spark.createDataFrame([(0, 2, 0)], "g int, x int, y int")
    with pytest.raises(Exception, match="must be 0/1"):
        grouped_mcnemar(bad, ["g"], "x", "y").collect()


def test_partition_invariance(spark):
    rng = random.Random(107)
    rows = [(0, rng.random() < 0.5, rng.random() < 0.5) for _ in range(600)]
    df = spark.createDataFrame(rows, "g int, x boolean, y boolean")
    one = grouped_mcnemar(df, ["g"], "x", "y").collect()[0]
    two = grouped_mcnemar(df.repartition(11, "x"), ["g"], "x", "y").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(109)
    rows = [
        (rng.randint(0, 3), rng.random() < 0.35, rng.random() < 0.55)
        for _ in range(2500)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "x", "y"])
    p = str(tmp_path / "mc.parquet")
    pdf.to_parquet(p)
    got = (
        grouped_mcnemar(spark.read.parquet(p), ["g"], "x", "y")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(grouped_mcnemar_sql("__t", "g", "x", "y") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

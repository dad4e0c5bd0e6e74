"""Cochran's Q (operators/stats.cochran_q): brute parity, k=2 ==
McNemar identity on exact values, no-discordance NULL, incomplete
subjects excluded loudly, duplicate canonicalization, bad flag raises,
partition invariance, DuckDB twin."""

import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    cochran_q,
    cochran_q_sql,
    grouped_mcnemar,
)


def _brute(rows):
    """rows: [(subject, treat, flag)] (already unique per (s,t)) ->
    (n_subjects, n_excluded, n_used, k, df, q)."""
    from collections import defaultdict

    per_s = defaultdict(dict)
    treats = set()
    for s, t, x in rows:
        per_s[s][t] = max(x, per_s[s].get(t, 0))
        treats.add(t)
    k = len(treats)
    complete = {s: d for s, d in per_s.items() if len(d) == k}
    R = {s: sum(d.values()) for s, d in complete.items()}
    T = {t: sum(d[t] for d in complete.values()) for t in treats}
    N = sum(R.values())
    sr2 = sum(r * r for r in R.values())
    st2 = sum(v * v for v in T.values())
    den = k * N - sr2
    q = float((k - 1) * (k * st2 - N * N)) / float(den) if den > 0 else None
    return (len(per_s), len(per_s) - len(complete), len(complete), k, k - 1, q)


def test_matches_brute(spark):
    rng = random.Random(139)
    rows = []
    for g in range(3):
        for s in range(60):
            for t in range(4):
                if rng.random() < 0.9:  # some incomplete subjects
                    rows.append((g, s, f"t{t}", int(rng.random() < 0.3 + 0.1 * t)))
    df = spark.createDataFrame(rows, "g int, s int, t string, x int")
    got = {
        r["g"]: (r["n_subjects"], r["n_excluded"], r["n_used"], r["k"],
                 r["df"], r["q_stat"])
        for r in cochran_q(df, ["g"], "s", "t", "x").collect()
    }
    for g in range(3):
        assert got[g] == _brute([(s, t, x) for gg, s, t, x in rows if gg == g]), g


def test_k2_equals_mcnemar(spark):
    rng = random.Random(149)
    rows = []
    for s in range(200):
        rows.append((0, s, "A", int(rng.random() < 0.4)))
        rows.append((0, s, "B", int(rng.random() < 0.6)))
    df = spark.createDataFrame(rows, "g int, s int, t string, x int")
    q = cochran_q(df, ["g"], "s", "t", "x").collect()[0]["q_stat"]
    # pivot to paired flags and run McNemar
    pairs = (
        df.groupBy("g", "s")
        .pivot("t", ["A", "B"])
        .max("x")
        .select("g", "A", "B")
    )
    m = grouped_mcnemar(pairs, ["g"], "A", "B").collect()[0]["stat"]
    assert q == m


def test_no_discordance_null_and_exclusion(spark):
    # every subject all-1: denominator k*N - sum R^2 = 0 -> NULL
    rows = [(0, s, t, 1) for s in range(10) for t in ("A", "B", "C")]
    df = spark.createDataFrame(rows, "g int, s int, t string, x int")
    r = cochran_q(df, ["g"], "s", "t", "x").collect()[0]
    assert r["q_stat"] is None and r["n_used"] == 10
    # a group where NO subject is complete keeps its row
    rows2 = [(1, s, "A", 1) for s in range(5)] + [(1, 99, "B", 0)]
    df2 = spark.createDataFrame(rows2, "g int, s int, t string, x int")
    r2 = cochran_q(df2, ["g"], "s", "t", "x").collect()[0]
    assert r2["n_subjects"] == 6 and r2["n_used"] == 0
    assert r2["q_stat"] is None and r2["k"] == 0


def test_duplicates_canonicalize_and_bad_flag(spark):
    rows = [
        (0, 1, "A", 0), (0, 1, "A", 1),  # dup -> max = 1
        (0, 1, "B", 0), (0, 2, "A", 0), (0, 2, "B", 1),
    ]
    df = spark.createDataFrame(rows, "g int, s int, t string, x int")
    r = cochran_q(df, ["g"], "s", "t", "x").collect()[0]
    assert r == next(
        iter(
            cochran_q(
                spark.createDataFrame(
                    [(0, 1, "A", 1), (0, 1, "B", 0), (0, 2, "A", 0), (0, 2, "B", 1)],
                    "g int, s int, t string, x int",
                ),
                ["g"], "s", "t", "x",
            ).collect()
        )
    )
    bad = spark.createDataFrame([(0, 1, "A", 3)], "g int, s int, t string, x int")
    with pytest.raises(Exception, match="must be 0/1"):
        cochran_q(bad, ["g"], "s", "t", "x").collect()


def test_partition_invariance(spark):
    rng = random.Random(151)
    rows = [
        (0, rng.randint(0, 80), f"t{rng.randint(0, 2)}", int(rng.random() < 0.5))
        for _ in range(900)
    ]
    df = spark.createDataFrame(rows, "g int, s int, t string, x int")
    one = cochran_q(df, ["g"], "s", "t", "x").collect()[0]
    two = cochran_q(df.repartition(23, "s"), ["g"], "s", "t", "x").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(157)
    rows = []
    for g in range(3):
        for s in range(70):
            for t in range(3):
                if rng.random() < 0.92:
                    rows.append((g, s, f"t{t}", int(rng.random() < 0.45)))
    pdf = pd.DataFrame(rows, columns=["g", "s", "t", "x"])
    p = str(tmp_path / "cq.parquet")
    pdf.to_parquet(p)
    got = (
        cochran_q(spark.read.parquet(p), ["g"], "s", "t", "x")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(cochran_q_sql("__t", "g", "s", "t", "x") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

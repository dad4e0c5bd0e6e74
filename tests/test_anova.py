"""Grouped one-way ANOVA (operators/stats.grouped_anova): exact
fixed-point parity against a Fraction/integer brute (including the
per-treatment truncation), classic-F closeness, perfect-separation
eta2 == 1 / single-treatment laws, float rejection, partition
invariance, DuckDB twin."""

import random
from fractions import Fraction

import pytest

from btl_bloomfilter_spark.operators.stats import (
    grouped_anova,
    grouped_anova_sql,
)

TS = 1_000_000


def _brute(rows):
    """rows: [(treat, value)] -> dict of the operator's outputs,
    replicating the quantize-once truncation exactly."""
    by_t = {}
    for t, x in rows:
        by_t.setdefault(t, []).append(x)
    N = len(rows)
    k = len(by_t)
    S = sum(x for _, x in rows)
    Q = sum(x * x for _, x in rows)
    A = sum((sum(xs) ** 2 * TS) // len(xs) for xs in by_t.values())
    ssb = max(A - (S * S * TS) // N, 0)
    ssw = Q * TS - A
    sst = ssb + ssw
    f = (
        float(ssb * (N - k)) / float(ssw * (k - 1))
        if k >= 2 and N - k >= 1 and ssw > 0
        else None
    )
    eta2 = float(ssb) / float(sst) if sst > 0 else None
    return {
        "n": N, "k": k, "df1": k - 1, "df2": N - k,
        "ssb_fp": str(ssb), "ssw_fp": str(ssw),
        "ssb": float(ssb) / float(TS), "ssw": float(ssw) / float(TS),
        "f_stat": f, "eta2": eta2,
    }


def _classic_f(rows):
    """Exact-rational classic one-way F for the closeness check."""
    by_t = {}
    for t, x in rows:
        by_t.setdefault(t, []).append(x)
    N, k = len(rows), len(by_t)
    S = sum(x for _, x in rows)
    Q = sum(x * x for _, x in rows)
    A = sum(Fraction(sum(xs) ** 2, len(xs)) for xs in by_t.values())
    ssb = A - Fraction(S * S, N)
    ssw = Q - A
    if ssw == 0 or k < 2:
        return None
    return float((ssb / (k - 1)) / (ssw / (N - k)))


def test_matches_brute_and_classic(spark):
    rng = random.Random(7)
    rows = []
    for g in range(3):
        shift = g * 3
        for t in range(4):
            for _ in range(rng.randint(20, 60)):
                rows.append((g, f"t{t}", rng.randint(0, 50) + t * shift))
    df = spark.createDataFrame(rows, "g int, t string, x long")
    got = {r["g"]: r.asDict() for r in grouped_anova(df, ["g"], "t", "x").collect()}
    for g in range(3):
        sub = [(t, x) for gg, t, x in rows if gg == g]
        want = _brute(sub)
        have = {c: got[g][c] for c in want}
        assert have == want, g
        cf = _classic_f(sub)
        assert abs(got[g]["f_stat"] - cf) < 1e-4 * max(1.0, cf), g


def test_perfect_separation_and_single_treatment(spark):
    # each treatment constant, distinct values: SSW_fp == 0 exactly,
    # f NULL, eta2 == 1.0 exactly
    rows = [(0, "a", 5)] * 10 + [(0, "b", 9)] * 7 + [(0, "c", 2)] * 3
    df = spark.createDataFrame(rows, "g int, t string, x long")
    r = grouped_anova(df, ["g"], "t", "x").collect()[0]
    assert r["ssw_fp"] == "0" and r["f_stat"] is None and r["eta2"] == 1.0
    # single treatment: ssb_fp == 0 (A and the S-term are the same
    # expression), f NULL, eta2 == 0
    one = spark.createDataFrame(
        [(0, "a", v) for v in (1, 5, 9, 2)], "g int, t string, x long"
    )
    r1 = grouped_anova(one, ["g"], "t", "x").collect()[0]
    assert r1["ssb_fp"] == "0" and r1["f_stat"] is None and r1["eta2"] == 0.0
    # all values identical across 2 treatments: sst == 0, eta2 NULL
    flat = spark.createDataFrame(
        [(0, "a", 4)] * 5 + [(0, "b", 4)] * 5, "g int, t string, x long"
    )
    rf = grouped_anova(flat, ["g"], "t", "x").collect()[0]
    assert rf["eta2"] is None and rf["f_stat"] is None


def test_identical_treatments_f_near_zero(spark):
    # the same multiset in every treatment: true SSB = 0; the
    # truncation bound allows ssb_fp <= k, so F <= tiny
    vals = [3, 8, 1, 9, 4, 4, 7]
    rows = [(0, f"t{t}", v) for t in range(3) for v in vals]
    df = spark.createDataFrame(rows, "g int, t string, x long")
    r = grouped_anova(df, ["g"], "t", "x").collect()[0]
    assert int(r["ssb_fp"]) <= 3
    assert r["f_stat"] is None or r["f_stat"] < 1e-4


def test_float_rejected_and_null_drops(spark):
    fdf = spark.createDataFrame([(0, "a", 1.5)], "g int, t string, x double")
    with pytest.raises(ValueError):
        grouped_anova(fdf, ["g"], "t", "x")
    df = spark.createDataFrame(
        [(0, "a", 1), (0, "a", 3), (0, None, 99), (0, "b", None), (0, "b", 5)],
        "g int, t string, x long",
    )
    r = grouped_anova(df, ["g"], "t", "x").collect()[0]
    assert r["n"] == 3 and r["k"] == 2


def test_partition_invariance(spark):
    rng = random.Random(11)
    rows = [(0, f"t{rng.randint(0, 3)}", rng.randint(-20, 20)) for _ in range(600)]
    df = spark.createDataFrame(rows, "g int, t string, x long")
    one = grouped_anova(df, ["g"], "t", "x").collect()[0]
    two = grouped_anova(df.repartition(17, "x"), ["g"], "t", "x").collect()[0]
    assert one == two


def test_negative_values_match_brute(spark):
    # S_i may be negative; every div operand stays nonnegative (squares)
    rows = [(0, "a", -5), (0, "a", -9), (0, "b", 4), (0, "b", -1), (0, "b", 7)]
    df = spark.createDataFrame(rows, "g int, t string, x long")
    r = grouped_anova(df, ["g"], "t", "x").collect()[0]
    want = _brute([(t, x) for _, t, x in rows])
    assert {c: r[c] for c in want} == want


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(23)
    rows = [
        (rng.randint(0, 3), f"t{rng.randint(0, 4)}", rng.randint(0, 500))
        for _ in range(3000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "t", "x"])
    p = str(tmp_path / "av.parquet")
    pdf.to_parquet(p)
    got = (
        grouped_anova(spark.read.parquet(p), ["g"], "t", "x")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(grouped_anova_sql("__t", "g", "t", "x") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

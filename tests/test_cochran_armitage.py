"""Cochran–Armitage trend test (operators/stats.cochran_armitage):
brute parity replicating the exact-integer + div→√→div shape,
z² == chi2_independence's Pearson χ² at k = 2 (the score-test
identity), monotone sign law, affine-score invariance, degenerate
NULLs with rows kept, float-dose rejection, bad-flag raises (both
engines), partition invariance, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    cochran_armitage,
    cochran_armitage_sql,
)


def _brute(pairs):
    """pairs: [(dose:int, flag:0/1)] — replicate the operator's exact
    integer terms and its float shape step for step."""
    from collections import defaultdict

    cell_n = defaultdict(int)
    cell_r = defaultdict(int)
    for d, f in pairs:
        cell_n[d] += 1
        cell_r[d] += f
    n = sum(cell_n.values())
    r = sum(cell_r.values())
    swn = sum(d * c for d, c in cell_n.items())
    swr = sum(d * c for d, c in cell_r.items())
    swwn = sum(d * d * c for d, c in cell_n.items())
    tn = n * swr - r * swn
    vn3 = r * (n - r) * (n * swwn - swn * swn)
    out = {"k": len(cell_n), "n": n, "r": r, "t_fp": str(tn)}
    if vn3 > 0:
        z = (float(tn) / float(n)) / math.sqrt(float(vn3) / float(n**3))
        out["z"] = z
        out["chi2"] = z * z
    else:
        out["z"] = None
        out["chi2"] = None
    return out


def test_matches_brute(spark):
    rng = random.Random(431)
    rows = []
    for g in range(4):
        base = rng.uniform(0.15, 0.4)
        slope = rng.uniform(-0.05, 0.12)
        for _ in range(500):
            d = rng.randint(0, 4)
            f = 1 if rng.random() < base + slope * d else 0
            rows.append((g, d, f))
    df = spark.createDataFrame(rows, "g int, d int, f int")
    got = {r["g"]: r.asDict() for r in cochran_armitage(df, ["g"], "d", "f").collect()}
    for g in range(4):
        want = _brute([(d, f) for gg, d, f in rows if gg == g])
        assert {k: got[g][k] for k in want} == want, g


def test_score_test_identity_k2(spark):
    """At k = 2 with scores {0, 1}, CA's χ² is algebraically the 2×2
    Pearson χ²: T = (r₁n₀ − r₀n₁)/N and Var = R(N−R)n₀n₁/N³ give
    z² = N(ad − bc)²/((a+b)(c+d)(a+c)(b+d)) — pinned against
    chi2_independence on the same data (different op shapes → approx,
    not hash)."""
    from btl_bloomfilter_spark.operators.stats import chi2_independence

    rng = random.Random(433)
    rows = [
        (0, rng.randint(0, 1), 1 if rng.random() < 0.3 else 0)
        for _ in range(900)
    ]
    df = spark.createDataFrame(rows, "g int, d int, f int")
    ca = cochran_armitage(df, ["g"], "d", "f").collect()[0]
    chi = chi2_independence(df, ["g"], "d", "f").collect()[0]
    assert ca["chi2"] == pytest.approx(chi["chi2"], rel=1e-9)


def test_monotone_sign_law(spark):
    up = [(0, d, 1 if (d * 37 + i) % 10 < 2 + 2 * d else 0)
          for d in range(4) for i in range(200)]
    df = spark.createDataFrame(up, "g int, d int, f int")
    r = cochran_armitage(df, ["g"], "d", "f").collect()[0]
    assert r["z"] > 5.0
    down = [(0, 3 - d, f) for _, d, f in up]
    r2 = cochran_armitage(
        spark.createDataFrame(down, "g int, d int, f int"), ["g"], "d", "f"
    ).collect()[0]
    assert r2["z"] < -5.0


def test_affine_score_invariance(spark):
    """z is invariant under dose → a·d + b (a > 0): the trend test
    depends only on score ORDER+spacing ratios.  Float shape is a
    rescaling, so approx (the exact integers rescale exactly)."""
    rng = random.Random(437)
    rows = [
        (0, rng.randint(0, 3), 1 if rng.random() < 0.2 + 0.1 * 0 else 0)
        for _ in range(600)
    ]
    rows = [(g, d, 1 if rng.random() < 0.15 + 0.08 * d else 0) for g, d, _ in rows]
    df = spark.createDataFrame(rows, "g int, d int, f int")
    z0 = cochran_armitage(df, ["g"], "d", "f").collect()[0]["z"]
    df2 = df.selectExpr("g", "7 * d + 3 AS d", "f")
    z1 = cochran_armitage(df2, ["g"], "d", "f").collect()[0]["z"]
    assert z1 == pytest.approx(z0, rel=1e-12)


def test_degenerate_nulls_keep_rows(spark):
    rows = (
        [(0, 2, 0)] * 10          # R = 0
        + [(1, d, 1) for d in (1, 2, 3)] * 5   # R = N
        + [(2, 5, 1), (2, 5, 0)]  # single dose level
    )
    df = spark.createDataFrame(rows, "g int, d int, f int")
    got = {r["g"]: r for r in cochran_armitage(df, ["g"], "d", "f").collect()}
    assert len(got) == 3
    for g in range(3):
        assert got[g]["z"] is None and got[g]["chi2"] is None
    assert got[0]["r"] == 0 and got[1]["r"] == 15 and got[2]["k"] == 1


def test_float_dose_and_bad_flag_raise(spark):
    df = spark.createDataFrame([(0, 1.5, 1)], "g int, d double, f int")
    with pytest.raises(ValueError, match="must be integral"):
        cochran_armitage(df, ["g"], "d", "f")
    df2 = spark.createDataFrame([(0, 1, 2)], "g int, d int, f int")
    with pytest.raises(Exception, match="0/1 or boolean"):
        cochran_armitage(df2, ["g"], "d", "f").collect()


def test_boolean_flag_and_null_drops(spark):
    rows = [(0, 1, True), (0, 1, False), (0, 2, True), (0, None, True),
            (0, 2, None)]
    df = spark.createDataFrame(rows, "g int, d int, f boolean")
    r = cochran_armitage(df, ["g"], "d", "f").collect()[0]
    assert r["n"] == 3 and r["r"] == 2


def test_partition_invariance(spark):
    rng = random.Random(439)
    rows = [
        (0, rng.randint(0, 5), 1 if rng.random() < 0.3 else 0)
        for _ in range(900)
    ]
    df = spark.createDataFrame(rows, "g int, d int, f int")
    one = cochran_armitage(df, ["g"], "d", "f").collect()[0]
    two = cochran_armitage(df.repartition(11, "d"), ["g"], "d", "f").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(443)
    rows = [
        (rng.randint(0, 4), rng.randint(0, 4),
         1 if rng.random() < 0.25 + 0.05 * (rng.random() < 0.5) else 0)
        for _ in range(4000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "d", "f"])
    p = str(tmp_path / "ca.parquet")
    pdf.to_parquet(p)
    got = (
        cochran_armitage(spark.read.parquet(p), ["g"], "d", "f")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        cochran_armitage_sql("__t", "g", "d", "f") + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_duckdb_twin_bad_flag_error_branch():
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("__ca_bad", pd.DataFrame([(0, 1, 3)], columns=["g", "d", "f"]))
    with pytest.raises(Exception, match="0/1 or boolean"):
        con.sql(cochran_armitage_sql("__ca_bad", "g", "d", "f")).df()

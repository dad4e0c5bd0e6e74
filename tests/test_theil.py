"""Theil T + mean log deviation (operators/stats.grouped_theil):
truncation-exact brute parity, all-equal ~0 and concentration -> ln n
laws, scale invariance within quantization, nonpositive exclusion +
empty-group NULL row, float rejection, Gini ordering consistency,
partition invariance, DuckDB twin."""

import math
import random
from collections import Counter

import pytest

from btl_bloomfilter_spark.operators.stats import (
    grouped_gini,
    grouped_theil,
    grouped_theil_sql,
)


def _lnm(x):
    # round-half-away micro-nat, matching both engines on positive args
    v = math.log(x) * 1e6
    return int(math.floor(v + 0.5))


def _brute(vals):
    n_rows = len(vals)
    n_nonpos = sum(1 for x in vals if x <= 0)
    pos = [x for x in vals if x > 0]
    out = {"n_rows": n_rows, "n_nonpos": n_nonpos, "n": len(pos)}
    if not pos:
        out.update({"sum_fp": None, "theil_t_micro": None, "theil_t": None,
                    "theil_l_micro": None, "theil_l": None})
        return out
    h = Counter(pos)
    n, s = len(pos), sum(pos)
    sl = sum(c * _lnm(v) for v, c in h.items())
    svl = sum(c * v * _lnm(v) for v, c in h.items())
    tm = max(svl // s - _lnm(s) + _lnm(n), 0)
    lm = max(_lnm(s) - _lnm(n) - sl // n, 0)
    out.update({"sum_fp": str(s), "theil_t_micro": tm, "theil_t": tm / 1e6,
                "theil_l_micro": lm, "theil_l": lm / 1e6})
    return out


def test_matches_brute(spark):
    rng = random.Random(307)
    rows = []
    for g in range(4):
        for _ in range(300):
            rows.append((g, max(1, int(rng.lognormvariate(3, 1.2)))))
    df = spark.createDataFrame(rows, "g int, x long")
    got = {r["g"]: r.asDict() for r in grouped_theil(df, ["g"], "x").collect()}
    for g in range(4):
        want = _brute([x for gg, x in rows if gg == g])
        assert {k: got[g][k] for k in want} == want, g


def test_all_equal_near_zero_and_concentration(spark):
    rows = [(0, 500)] * 200
    df = spark.createDataFrame(rows, "g int, x long")
    r = grouped_theil(df, ["g"], "x").collect()[0]
    assert r["theil_t_micro"] <= 3 and r["theil_l_micro"] <= 3
    # one giant holder among n tiny ones: T approaches ln n
    n = 1000
    rows2 = [(0, 1)] * (n - 1) + [(0, 10**9)]
    df2 = spark.createDataFrame(rows2, "g int, x long")
    r2 = grouped_theil(df2, ["g"], "x").collect()[0]
    assert r2["theil_t"] == pytest.approx(math.log(n), rel=0.01)


def test_scale_invariance_within_quantization(spark):
    rng = random.Random(311)
    vals = [max(1, int(rng.expovariate(0.01))) for _ in range(400)]
    df1 = spark.createDataFrame([(0, v) for v in vals], "g int, x long")
    df2 = spark.createDataFrame([(0, v * 10) for v in vals], "g int, x long")
    a = grouped_theil(df1, ["g"], "x").collect()[0]
    b = grouped_theil(df2, ["g"], "x").collect()[0]
    assert abs(a["theil_t_micro"] - b["theil_t_micro"]) <= 5
    assert abs(a["theil_l_micro"] - b["theil_l_micro"]) <= 5


def test_nonpos_excluded_and_empty_group_null_row(spark):
    rows = [(0, 10), (0, 20), (0, 0), (0, -5), (1, -1), (1, 0)]
    df = spark.createDataFrame(rows, "g int, x long")
    got = {r["g"]: r.asDict() for r in grouped_theil(df, ["g"], "x").collect()}
    assert got[0]["n_rows"] == 4 and got[0]["n_nonpos"] == 2 and got[0]["n"] == 2
    assert got[1]["n"] == 0 and got[1]["theil_t"] is None
    assert got[1]["theil_l_micro"] is None and got[1]["sum_fp"] is None


def test_float_rejected(spark):
    df = spark.createDataFrame([(0, 1.5)], "g int, x double")
    with pytest.raises(ValueError, match="integral"):
        grouped_theil(df, ["g"], "x")


def test_gini_ordering_consistency(spark):
    # a more concentrated distribution must score higher on BOTH
    # Theil indices and Gini
    rng = random.Random(313)
    flat = [(0, rng.randint(90, 110)) for _ in range(500)]
    skew = [(0, max(1, int(rng.paretovariate(1.2) * 10))) for _ in range(500)]
    dflat = spark.createDataFrame(flat, "g int, x long")
    dskew = spark.createDataFrame(skew, "g int, x long")
    tf = grouped_theil(dflat, ["g"], "x").collect()[0]
    ts = grouped_theil(dskew, ["g"], "x").collect()[0]
    assert ts["theil_t"] > tf["theil_t"] and ts["theil_l"] > tf["theil_l"]
    gf = grouped_gini(dflat, ["g"], "x").collect()[0]
    gs = grouped_gini(dskew, ["g"], "x").collect()[0]
    assert gs["gini"] > gf["gini"]


def test_partition_invariance(spark):
    rng = random.Random(317)
    rows = [(0, rng.randint(1, 10000)) for _ in range(900)]
    df = spark.createDataFrame(rows, "g int, x long")
    one = grouped_theil(df, ["g"], "x").collect()[0]
    two = grouped_theil(df.repartition(17, "x"), ["g"], "x").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(331)
    rows = [
        (rng.randint(0, 3), max(0, int(rng.lognormvariate(4, 1.5)) - 3))
        for _ in range(4000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    p = str(tmp_path / "t.parquet")
    pdf.to_parquet(p)
    got = grouped_theil(spark.read.parquet(p), ["g"], "x").orderBy("g").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(grouped_theil_sql("__t", "g", "x") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

"""CUSUM changepoint (operators/changepoint): brute argmax parity,
planted-shift localization, tie-break determinism, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.changepoint import changepoint, changepoint_sql


def _brute(rows, scale):
    """rows: list of (o, v) — exact bigint CUSUM argmax."""
    q = sorted(
        ((o, math.floor(v * scale)) for o, v in rows if o is not None and v == v),
        key=lambda t: (t[0], t[1]),
    )
    n = len(q)
    if n < 2:
        return None
    t = sum(x for _, x in q)
    best_i, best_d = None, -1
    p = 0
    for i, (o, x) in enumerate(q, start=1):
        if i == n:
            break
        p += x
        d = abs(n * p - i * t)
        if d > best_d:
            best_d, best_i = d, i
    if best_d == 0:
        return None
    return n, best_i, q[best_i - 1][0], best_d, best_d / (n * n * scale)


def test_matches_brute_and_localizes_planted_shift(spark):
    rng = random.Random(155)
    rows, truth = [], {}
    for g, cp_at in (("early", 50), ("late", 220), ("none", None)):
        seq = []
        for i in range(300):
            shift = 5.0 if (cp_at is not None and i >= cp_at) else 0.0
            seq.append((i, rng.gauss(10.0, 1.0) + shift))
        rows += [(g, o, v) for o, v in seq]
        truth[g] = _brute(seq, 1000)
    df = spark.createDataFrame(rows, "g string, o long, v double")
    got = {r.g: r for r in changepoint(df, ["g"], "v", "o", scale=1000).collect()}
    for g in ("early", "late", "none"):
        n, cp, cpo, dm, shift = truth[g]
        r = got[g]
        assert (r.n, r.cp_index, r.cp_order, int(r.d_max)) == (n, cp, cpo, dm)
        assert r.shift == shift
    # the planted splits are recovered within a few samples
    assert abs(got["early"].cp_index - 50) <= 3
    assert abs(got["late"].cp_index - 220) <= 3
    # shift = |mean diff| * (i/n)(1-i/n): 5.0 * (50/300)(250/300) ~ 0.69
    assert abs(got["early"].shift - 5.0 * (50 / 300) * (250 / 300)) < 0.1
    assert abs(got["late"].shift - 5.0 * (220 / 300) * (80 / 300)) < 0.1
    assert got["none"].shift < got["early"].shift / 3


def test_exclusions_and_tie_break(spark):
    rows = [("const", i, 2.0) for i in range(10)]          # D == 0 everywhere
    rows += [("single", 0, 1.0)]                            # n < 2
    rows += [("tie", 0, 0.0), ("tie", 1, 10.0), ("tie", 2, 0.0), ("tie", 3, 10.0)]
    df = spark.createDataFrame(rows, "g string, o long, v double")
    got = {r.g: r for r in changepoint(df, ["g"], "v", "o", scale=10).collect()}
    assert "const" not in got and "single" not in got
    # alternating series has tied |D| maxima -> min index wins, exactly
    # matching the brute spec (deterministic in both engines)
    n, cp, cpo, dm, shift = _brute([(0, 0.0), (1, 10.0), (2, 0.0), (3, 10.0)], 10)
    assert (got["tie"].cp_index, int(got["tie"].d_max)) == (cp, dm)
    # and partition invariance: repartitioned input gives identical rows
    again = {
        r.g: r
        for r in changepoint(df.repartition(5), ["g"], "v", "o", scale=10).collect()
    }
    assert {g: tuple(r) for g, r in got.items()} == {
        g: tuple(r) for g, r in again.items()
    }


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(77)
    rows = []
    for g in range(6):
        cp = rng.randrange(20, 80)
        for i in range(100):
            rows.append((g, i, rng.gauss(0, 1) + (3.0 if i >= cp else 0.0)))
    pdf = pd.DataFrame(rows, columns=["g", "o", "v"])
    p = str(tmp_path / "cp.parquet")
    pdf.to_parquet(p)
    got = (
        changepoint(spark.read.parquet(p), ["g"], "v", "o", scale=1000)
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        changepoint_sql("t", "g", "v", "o", scale=1000) + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([("g", 1, 1.0)], "g string, o long, v double")
    with pytest.raises(ValueError):
        changepoint(df, ["g"], "v", "o", scale=0)
    with pytest.raises(ValueError):
        changepoint_sql("t", "g", "v", "o", scale=-1)

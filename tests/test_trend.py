"""Mann-Kendall + Sen slope (operators/trend): brute pair parity
(S, var, z, weighted-lower-median slope), planted trend recovery,
tie/exclusion semantics, partition invariance, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.trend import mann_kendall, mann_kendall_sql


def _brute(rows, scale, order_scale):
    """rows: list of (o, v).  Mirrors the engines' fixed expression
    shapes exactly (float(int)/float(int) divisions, left-assoc var
    sum) so doubles are comparable with ==."""
    q = [
        (math.floor(o * order_scale), math.floor(v * scale))
        for o, v in rows
        if o is not None and v == v
    ]
    n = len(q)
    s = 0
    slopes = []  # (slope_double, weight 1 per row pair)
    for i in range(n):
        for j in range(n):
            ta, xa = q[i]
            tb, xb = q[j]
            if ta < tb:
                s += (xb > xa) - (xb < xa)
                slopes.append(float((xb - xa) * order_scale) / float((tb - ta) * scale))
    w = len(slopes)
    if w == 0:
        return None
    slopes.sort()
    sen = slopes[(w + (w % 2)) // 2 - 1]

    def runs(key):
        c = {}
        for t in q:
            c[key(t)] = c.get(key(t), 0) + 1
        return list(c.values())

    t1 = t2 = t3 = x1 = x2 = x3 = 0
    for u in runs(lambda t: t[0]):
        t1 += u * (u - 1) * (2 * u + 5)
        t2 += u * (u - 1) * (u - 2)
        t3 += u * (u - 1)
    for u in runs(lambda t: t[1]):
        x1 += u * (u - 1) * (2 * u + 5)
        x2 += u * (u - 1) * (u - 2)
        x3 += u * (u - 1)
    term1 = float(n * (n - 1) * (2 * n + 5) - t1 - x1) / 18.0
    term2 = (
        float(t2 * x2) / float(9 * n * (n - 1) * (n - 2)) if n > 2 else 0.0
    )
    term3 = float(t3 * x3) / float(2 * n * (n - 1))
    var = (term1 + term2) + term3
    if var <= 0.0:
        z = None
    elif s > 0:
        z = (float(s) - 1.0) / math.sqrt(var)
    elif s < 0:
        z = (float(s) + 1.0) / math.sqrt(var)
    else:
        z = 0.0
    return n, w, s, var, z, sen


def test_matches_brute_with_ties(spark):
    rng = random.Random(161)
    rows, truth = [], {}
    for g in range(5):
        seq = []
        for i in range(60):
            # coarse time buckets (ties) + coarse values (ties)
            seq.append((float(i // 3), float(rng.randrange(-5, 6)) + 0.1 * i * (g % 3)))
        rows += [(str(g), o, v) for o, v in seq]
        truth[str(g)] = _brute(seq, 10, 1)
    df = spark.createDataFrame(rows, "g string, o double, v double")
    got = {
        r.g: r
        for r in mann_kendall(df, ["g"], "v", "o", scale=10, order_scale=1).collect()
    }
    assert set(got) == set(truth)
    for g, (n, w, s, var, z, sen) in truth.items():
        r = got[g]
        assert (r.n, r.n_pairs, int(r.s)) == (n, w, s)
        assert r.var_s == var
        assert r.z == z if z is not None else r.z is None
        assert r.sen_slope == sen
    # partition invariance
    again = {
        r.g: tuple(r)
        for r in mann_kendall(
            df.repartition(7), ["g"], "v", "o", scale=10, order_scale=1
        ).collect()
    }
    assert {g: tuple(r) for g, r in got.items()} == again


def test_planted_trend_recovered(spark):
    rng = random.Random(7)
    rows = []
    for i in range(200):
        rows.append(("up", float(i), 0.5 * i + rng.gauss(0, 2.0)))
        rows.append(("flat", float(i), rng.gauss(0, 2.0)))
    df = spark.createDataFrame(rows, "g string, o double, v double")
    got = {r.g: r for r in mann_kendall(df, ["g"], "v", "o", scale=1000).collect()}
    assert got["up"].z > 3.0  # strongly significant upward trend
    assert abs(got["up"].sen_slope - 0.5) < 0.05  # slope recovered
    assert abs(got["flat"].z) < 3.0
    assert abs(got["flat"].sen_slope) < 0.05


def test_exclusions(spark):
    rows = [("one_t", 1.0, float(v)) for v in range(5)]  # all rows share one time
    rows += [("single", 0.0, 1.0)]
    rows += [("ok", 0.0, 1.0), ("ok", 1.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, o double, v double")
    got = {r.g: r for r in mann_kendall(df, ["g"], "v", "o", scale=10).collect()}
    assert set(got) == {"ok"}
    r = got["ok"]
    assert (r.n, r.n_pairs, int(r.s)) == (2, 1, 1)
    assert r.sen_slope == 1.0
    # n=2: the n>2 cross-term is suppressed identically in both shapes
    assert r.var_s == _brute([(0.0, 1.0), (1.0, 2.0)], 10, 1)[3]


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(42)
    rows = []
    for g in range(6):
        slope = (g - 2) * 0.3
        for i in range(50):
            rows.append((g, float(i // 2), slope * i + rng.gauss(0, 1.0)))
    pdf = pd.DataFrame(rows, columns=["g", "o", "v"])
    p = str(tmp_path / "mk.parquet")
    pdf.to_parquet(p)
    got = (
        mann_kendall(
            spark.read.parquet(p), ["g"], "v", "o", scale=100, order_scale=1
        )
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        mann_kendall_sql("t", "g", "v", "o", scale=100, order_scale=1) + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([("g", 1.0, 1.0)], "g string, o double, v double")
    with pytest.raises(ValueError):
        mann_kendall(df, ["g"], "v", "o", scale=0)
    with pytest.raises(ValueError):
        mann_kendall(df, ["g"], "v", "o", order_scale=0)
    with pytest.raises(ValueError):
        mann_kendall_sql("t", "g", "v", "o", scale=-1)
    with pytest.raises(ValueError):
        mann_kendall_sql("t", "g", "v", "o", order_scale=0)

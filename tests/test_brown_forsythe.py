"""Brown–Forsythe variance-homogeneity test
(operators/stats.brown_forsythe): brute parity through the doubled-
median + grouped_anova composition, equal-spread vs unequal-spread
discrimination, pure-shift insensitivity (the property ANOVA's F
lacks), even/odd median conventions, shuffle-join fallback equality,
partition invariance, DuckDB twin."""

import random

from btl_bloomfilter_spark.operators.stats import (
    brown_forsythe,
    brown_forsythe_sql,
    grouped_anova,
)

TS = 1_000_000


def _med2(xs):
    s = sorted(xs)
    n = len(s)
    if n % 2 == 1:
        return 2 * s[n // 2]
    return s[n // 2 - 1] + s[n // 2]


def _brute_f(rows):
    """Replicate the composition: |2x - med2| then the grouped_anova
    fixed-point F."""
    by_t = {}
    for t, x in rows:
        by_t.setdefault(t, []).append(x)
    dev = []
    for t, xs in by_t.items():
        m2 = _med2(xs)
        dev += [(t, abs(2 * x - m2)) for x in xs]
    N, k = len(dev), len(by_t)
    S = sum(z for _, z in dev)
    Q = sum(z * z for _, z in dev)
    by_td = {}
    for t, z in dev:
        by_td.setdefault(t, []).append(z)
    A = sum((sum(zs) ** 2 * TS) // len(zs) for zs in by_td.values())
    ssb = max(A - (S * S * TS) // N, 0)
    ssw = Q * TS - A
    if k < 2 or N - k < 1 or ssw == 0:
        return None
    return float(ssb * (N - k)) / float(ssw * (k - 1))


def test_matches_brute(spark):
    rng = random.Random(41)
    rows = []
    for g in range(3):
        for t in range(3):
            spread = 1 + 4 * t
            for _ in range(rng.randint(21, 60)):
                rows.append((g, f"t{t}", rng.randint(-spread * 10, spread * 10)))
    df = spark.createDataFrame(rows, "g int, t string, x long")
    got = {r["g"]: r["f_stat"] for r in brown_forsythe(df, ["g"], "t", "x").collect()}
    for g in range(3):
        sub = [(t, x) for gg, t, x in rows if gg == g]
        assert got[g] == _brute_f(sub), g


def test_shift_insensitive_spread_sensitive(spark):
    rng = random.Random(43)
    base = [rng.randint(-20, 20) for _ in range(120)]
    # pure LOCATION shift: same spread, +1000 offset -> BF sees nothing
    shift = [(0, "a", v) for v in base] + [(0, "b", v + 1000) for v in base]
    d1 = spark.createDataFrame(shift, "g int, t string, x long")
    r1 = brown_forsythe(d1, ["g"], "t", "x").collect()[0]
    assert int(r1["ssb_fp"]) <= 2  # identical deviation multisets
    # ANOVA on the same data screams (the two tests answer different
    # questions)
    ra = grouped_anova(d1, ["g"], "t", "x").collect()[0]
    assert ra["f_stat"] > 1000
    # pure SCALE change: x5 spread, same median -> BF screams
    wide = [(0, "a", v) for v in base] + [(0, "b", 5 * v) for v in base]
    d2 = spark.createDataFrame(wide, "g int, t string, x long")
    r2 = brown_forsythe(d2, ["g"], "t", "x").collect()[0]
    assert r2["f_stat"] > 50


def test_even_odd_median_conventions(spark):
    # odd n: med2 = 2*middle; even n: lo+hi - checked through the
    # deviations' brute
    rows = [(0, "a", v) for v in (1, 3, 9)] + [(0, "b", v) for v in (2, 4, 6, 100)]
    df = spark.createDataFrame(rows, "g int, t string, x long")
    got = brown_forsythe(df, ["g"], "t", "x").collect()[0]
    assert got["f_stat"] == _brute_f([(t, x) for _, t, x in rows])
    assert got["n"] == 7 and got["k"] == 2


def test_shuffle_join_fallback_equal(spark):
    rng = random.Random(47)
    rows = [(0, f"t{rng.randint(0, 3)}", rng.randint(-50, 50)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g int, t string, x long")
    a = brown_forsythe(df, ["g"], "t", "x").collect()[0]
    b = brown_forsythe(df, ["g"], "t", "x", broadcast_medians=False).collect()[0]
    assert a == b


def test_null_group_key_kept(spark):
    rows = [(None, "a", v) for v in (1, 2, 9, 4)] + [
        (None, "b", v) for v in (0, 50, 3)
    ]
    df = spark.createDataFrame(rows, "g string, t string, x long")
    out = brown_forsythe(df, ["g"], "t", "x").collect()
    assert len(out) == 1 and out[0]["g"] is None and out[0]["n"] == 7


def test_partition_invariance(spark):
    rng = random.Random(53)
    rows = [(0, f"t{rng.randint(0, 2)}", rng.randint(-30, 30)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g int, t string, x long")
    one = brown_forsythe(df, ["g"], "t", "x").collect()[0]
    two = brown_forsythe(df.repartition(19, "x"), ["g"], "t", "x").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(59)
    rows = [
        (rng.randint(0, 3), f"t{rng.randint(0, 3)}",
         rng.randint(0, 80) * (1 + rng.randint(0, 3)))
        for _ in range(2500)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "t", "x"])
    p = str(tmp_path / "bf.parquet")
    pdf.to_parquet(p)
    got = (
        brown_forsythe(spark.read.parquet(p), ["g"], "t", "x")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(brown_forsythe_sql("__t", "g", "t", "x") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

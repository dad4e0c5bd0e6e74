"""Jonckheere–Terpstra trend test (operators/stats.jonckheere_terpstra):
brute O(n²)-pair parity replicating the exact integers and the
div→√→div shape, k = 2 consistency with grouped_mannwhitney (jt == u
and z ≈ MWU z), monotone sign law, all-tied NULL z, float-dose
rejection, duplicate-value tie handling, partition invariance,
DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    jonckheere_terpstra,
    jonckheere_terpstra_sql,
)


def _brute(pairs):
    """pairs: [(dose:int, value)] — direct pair loops + the exact
    Hollander–Wolfe tie-corrected variance, replicated step for
    step (num4/4, VarD/D, sqrt, div)."""
    from collections import Counter

    n = len(pairs)
    c = e = 0
    for i in range(n):
        for j in range(n):
            if pairs[i][0] < pairs[j][0]:
                if pairs[i][1] < pairs[j][1]:
                    c += 1
                elif pairs[i][1] == pairs[j][1]:
                    e += 1
    jt2 = 2 * c + e
    ni = Counter(d for d, _ in pairs)
    tj = Counter(v for _, v in pairs)
    s2 = sum(x * x for x in ni.values())
    num4 = 2 * jt2 - (n * n - s2)
    a = (
        n * (n - 1) * (2 * n + 5)
        - sum(x * (x - 1) * (2 * x + 5) for x in ni.values())
        - sum(x * (x - 1) * (2 * x + 5) for x in tj.values())
    )
    b = sum(x * (x - 1) * (x - 2) for x in ni.values()) * sum(
        x * (x - 1) * (x - 2) for x in tj.values()
    )
    cp = sum(x * (x - 1) for x in ni.values()) * sum(
        x * (x - 1) for x in tj.values()
    )
    vard = a * n * (n - 1) * (n - 2) + 2 * b + 9 * cp * (n - 2)
    dden = 72 * n * (n - 1) * (n - 2)
    out = {
        "k": len(ni),
        "n": n,
        "jt2_fp": str(jt2),
        "jt": jt2 / 2.0,
    }
    if n >= 3 and vard > 0:
        out["z"] = (float(num4) / 4.0) / math.sqrt(float(vard) / float(dden))
    else:
        out["z"] = None
    return out


def test_matches_brute(spark):
    rng = random.Random(449)
    rows = []
    for g in range(4):
        shift = rng.uniform(0.0, 0.8)
        for _ in range(120):
            d = rng.randint(0, 3)
            v = rng.randint(0, 12) + int(shift * d * rng.random() * 4)
            rows.append((g, d, v))
    df = spark.createDataFrame(rows, "g int, d int, v int")
    got = {
        r["g"]: r.asDict()
        for r in jonckheere_terpstra(df, ["g"], "d", "v").collect()
    }
    for g in range(4):
        want = _brute([(d, v) for gg, d, v in rows if gg == g])
        assert {k: got[g][k] for k in want} == want, g


def test_matches_brute_doubles(spark):
    """Values COMPARE, never compute — doubles (incl. ties planted by
    halving) work verbatim; NaN drops."""
    rng = random.Random(457)
    rows = [
        (0, rng.randint(0, 2), round(rng.uniform(0, 3) * 2) / 2.0)
        for _ in range(150)
    ] + [(0, 1, float("nan"))]
    df = spark.createDataFrame(rows, "g int, d int, v double")
    got = jonckheere_terpstra(df, ["g"], "d", "v").collect()[0].asDict()
    want = _brute([(d, v) for _, d, v in rows if v == v])
    assert {k: got[k] for k in want} == want


def test_k2_is_mannwhitney(spark):
    """With two dose levels JT IS the Mann–Whitney count: jt == u
    (dose-ascending orientation) exactly on the integers, and the
    tie-corrected z agrees (the H&W variance reduces to MWU's —
    different op shapes, so approx)."""
    from btl_bloomfilter_spark.operators.stats import grouped_mannwhitney

    rng = random.Random(461)
    rows = [(0, rng.randint(0, 1), rng.randint(0, 9)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g int, d int, v int")
    jt = jonckheere_terpstra(df, ["g"], "d", "v").collect()[0]
    mw = grouped_mannwhitney(
        df, ["g"], "v", "d"
    ).collect()[0]
    # grouped_mannwhitney's u counts cohort-1 (= dose 1) value wins
    # over cohort-2 (= dose 0); JT counts low-dose < high-dose pairs
    # — the same orientation
    assert jt["jt"] == mw["u"]
    assert jt["z"] == pytest.approx(mw["z"], rel=1e-9)


def test_monotone_sign_law(spark):
    up = [(0, d, d * 10 + i % 5) for d in range(4) for i in range(80)]
    df = spark.createDataFrame(up, "g int, d int, v int")
    r = jonckheere_terpstra(df, ["g"], "d", "v").collect()[0]
    assert r["z"] > 10.0
    down = [(0, 3 - d, v) for _, d, v in up]
    r2 = jonckheere_terpstra(
        spark.createDataFrame(down, "g int, d int, v int"), ["g"], "d", "v"
    ).collect()[0]
    assert r2["z"] == pytest.approx(-r["z"], rel=1e-12)


def test_all_tied_and_small_n_null(spark):
    rows = [(0, d, 7) for d in range(3) for _ in range(5)] + [(1, 0, 1), (1, 1, 2)]
    df = spark.createDataFrame(rows, "g int, d int, v int")
    got = {r["g"]: r for r in jonckheere_terpstra(df, ["g"], "d", "v").collect()}
    assert got[0]["z"] is None          # every value tied → Var ≤ 0
    assert got[1]["z"] is None          # n < 3
    assert got[1]["jt"] == 1.0


def test_single_dose_level(spark):
    df = spark.createDataFrame([(0, 1, v) for v in range(6)], "g int, d int, v int")
    r = jonckheere_terpstra(df, ["g"], "d", "v").collect()[0]
    assert r["k"] == 1 and r["jt"] == 0.0 and r["z"] is None


def test_float_dose_raises(spark):
    df = spark.createDataFrame([(0, 0.5, 1)], "g int, d double, v int")
    with pytest.raises(ValueError, match="must be integral"):
        jonckheere_terpstra(df, ["g"], "d", "v")


def test_partition_invariance(spark):
    rng = random.Random(463)
    rows = [(0, rng.randint(0, 4), rng.randint(0, 20)) for _ in range(800)]
    df = spark.createDataFrame(rows, "g int, d int, v int")
    one = jonckheere_terpstra(df, ["g"], "d", "v").collect()[0]
    two = jonckheere_terpstra(
        df.repartition(13, "v"), ["g"], "d", "v"
    ).collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(467)
    rows = [
        (rng.randint(0, 4), rng.randint(0, 3), rng.randint(0, 15))
        for _ in range(3000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "d", "v"])
    p = str(tmp_path / "jt.parquet")
    pdf.to_parquet(p)
    got = (
        jonckheere_terpstra(spark.read.parquet(p), ["g"], "d", "v")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        jonckheere_terpstra_sql("__t", "g", "d", "v") + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_null_group_key_kept_with_correct_statistics(spark):
    """NULL group keys keep their row with the REAL statistics in
    BOTH engines (review catch: a null-unsafe pair join dropped the
    NULL group's concordance rows — jt reported 0 with a fabricated
    negative z — while the DuckDB twin dropped the row entirely)."""
    import duckdb
    import pandas as pd

    rows = [(None, d, d * 10 + i) for d in range(3) for i in range(6)] + [
        (1, d, d * 5 + i) for d in range(3) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "g int, d int, v int")
    got = {
        r["g"]: r for r in jonckheere_terpstra(df, ["g"], "d", "v").collect()
    }
    assert None in got and got[None]["z"] > 3  # genuine increasing trend
    assert got[None]["jt"] > 0
    pdf = pd.DataFrame(rows, columns=["g", "d", "v"])
    con = duckdb.connect()
    con.register("__jtn", pdf)
    want = con.sql(
        jonckheere_terpstra_sql("__jtn", "g", "d", "v")
    ).df()
    nrow = want[want["g"].isna()]
    assert len(nrow) == 1
    assert nrow.iloc[0]["z"] == got[None]["z"]

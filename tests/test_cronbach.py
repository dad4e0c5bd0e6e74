"""Cronbach's alpha (operators/stats.cronbach_alpha): brute parity,
redundant-items alpha == 1.0 exactly, independent-noise ~0,
constant-total NULL, incomplete exclusion, duplicates canonicalize,
float rejection, partition invariance, DuckDB twin."""

import random
from collections import defaultdict

import pytest

from btl_bloomfilter_spark.operators.stats import (
    cronbach_alpha,
    cronbach_alpha_sql,
)


def _brute(rows):
    """rows: [(s, i, v)] -> operator outputs."""
    per = defaultdict(dict)
    items = set()
    for s, i, v in rows:
        per[s][i] = max(v, per[s].get(i, v))
        items.add(i)
    k = len(items)
    complete = {s: d for s, d in per.items() if len(d) == k}
    n = len(complete)
    out = {
        "n_subjects": len(per), "n_excluded": len(per) - n, "n_used": n,
        "k": k,
    }
    if n == 0:
        out.update({"vt_fp": None, "svi_fp": None, "alpha": None})
        return out
    svi = 0
    for i in items:
        xs = [d[i] for d in complete.values()]
        svi += n * sum(x * x for x in xs) - sum(xs) ** 2
    ts = [sum(d.values()) for d in complete.values()]
    vt = n * sum(t * t for t in ts) - sum(ts) ** 2
    alpha = (
        float(k * (vt - svi)) / float((k - 1) * vt)
        if k >= 2 and vt > 0
        else None
    )
    out.update({"vt_fp": str(vt), "svi_fp": str(svi), "alpha": alpha})
    return out


def test_matches_brute(spark):
    rng = random.Random(181)
    rows = []
    for g in range(3):
        for s in range(60):
            latent = rng.randint(0, 50)
            for i in range(4):
                if rng.random() < 0.93:
                    rows.append((g, s, f"i{i}", latent + rng.randint(-5, 5)))
    df = spark.createDataFrame(rows, "g int, s int, i string, v long")
    got = {r["g"]: r.asDict() for r in cronbach_alpha(df, ["g"], "s", "i", "v").collect()}
    for g in range(3):
        want = _brute([(s, i, v) for gg, s, i, v in rows if gg == g])
        assert {c: got[g][c] for c in want} == want, g
        assert got[g]["alpha"] > 0.8, g  # strong shared latent


def test_redundant_items_alpha_one_exactly(spark):
    rng = random.Random(191)
    rows = []
    for s in range(30):
        x = rng.randint(0, 20)
        for i in range(3):
            rows.append((0, s, f"i{i}", x))
    df = spark.createDataFrame(rows, "g int, s int, i string, v long")
    r = cronbach_alpha(df, ["g"], "s", "i", "v").collect()[0]
    assert r["alpha"] == 1.0


def test_independent_noise_near_zero_and_constant_total_null(spark):
    rng = random.Random(193)
    rows = [
        (0, s, f"i{i}", rng.randint(0, 100))
        for s in range(400)
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "g int, s int, i string, v long")
    r = cronbach_alpha(df, ["g"], "s", "i", "v").collect()[0]
    assert abs(r["alpha"]) < 0.15
    # every subject the same scores: V_T == 0 -> NULL
    const = spark.createDataFrame(
        [(1, s, f"i{i}", 5 + i) for s in range(10) for i in range(3)],
        "g int, s int, i string, v long",
    )
    rc = cronbach_alpha(const, ["g"], "s", "i", "v").collect()[0]
    assert rc["alpha"] is None and rc["vt_fp"] == "0"


def test_exclusion_duplicates_float_reject(spark):
    rows = [
        (0, 1, "a", 3), (0, 1, "b", 4), (0, 1, "b", 2),  # dup b -> 4
        (0, 2, "a", 1),  # incomplete
        (0, 3, "a", 5), (0, 3, "b", 6),
    ]
    df = spark.createDataFrame(rows, "g int, s int, i string, v long")
    r = cronbach_alpha(df, ["g"], "s", "i", "v").collect()[0]
    assert r["n_subjects"] == 3 and r["n_excluded"] == 1 and r["n_used"] == 2
    want = _brute([(1, "a", 3), (1, "b", 4), (3, "a", 5), (3, "b", 6)])
    assert r["vt_fp"] == want["vt_fp"] and r["svi_fp"] == want["svi_fp"]
    fdf = spark.createDataFrame([(0, 1, "a", 1.5)], "g int, s int, i string, v double")
    with pytest.raises(ValueError):
        cronbach_alpha(fdf, ["g"], "s", "i", "v")


def test_partition_invariance(spark):
    rng = random.Random(197)
    rows = [
        (0, rng.randint(0, 70), f"i{rng.randint(0, 2)}", rng.randint(0, 30))
        for _ in range(900)
    ]
    df = spark.createDataFrame(rows, "g int, s int, i string, v long")
    one = cronbach_alpha(df, ["g"], "s", "i", "v").collect()[0]
    two = cronbach_alpha(df.repartition(13, "s"), ["g"], "s", "i", "v").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(199)
    rows = []
    for g in range(3):
        for s in range(80):
            latent = rng.randint(0, 40)
            for i in range(3):
                if rng.random() < 0.95:
                    rows.append((g, s, f"i{i}", latent + rng.randint(-8, 8)))
    pdf = pd.DataFrame(rows, columns=["g", "s", "i", "v"])
    p = str(tmp_path / "cr.parquet")
    pdf.to_parquet(p)
    got = (
        cronbach_alpha(spark.read.parquet(p), ["g"], "s", "i", "v")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        cronbach_alpha_sql("__t", "g", "s", "i", "v") + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

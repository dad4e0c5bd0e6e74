"""Wilson proportion CI + Benjamini-Hochberg FDR (operators/stats):
brute shape parity, textbook laws, tie determinism, DuckDB twins."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    _Z95,
    bh_adjust,
    bh_adjust_sql,
    grouped_proportion_ci,
    grouped_proportion_ci_sql,
)


def _wilson(x, n, z=_Z95):
    """Mirrors the engines' fixed expression shape."""
    z2 = z * z
    xd, nd = float(x), float(n)
    denom = nd + z2
    center = (xd + z2 / 2.0) / denom
    half = z * math.sqrt(xd * (nd - xd) / nd + z2 / 4.0) / denom
    return center - half, center + half


def test_wilson_matches_brute_and_laws(spark):
    rows = []
    cases = {"half": (50, 100), "rare": (1, 200), "zero": (0, 40), "all": (30, 30)}
    for g, (x, n) in cases.items():
        rows += [(g, 1)] * x + [(g, 0)] * (n - x)
    rows += [("nulls", 1), ("nulls", None), ("nulls", 0)]
    df = spark.createDataFrame(rows, "g string, s int")
    got = {r.g: r for r in grouped_proportion_ci(df, ["g"], "s").collect()}
    for g, (x, n) in cases.items():
        lo, hi = _wilson(x, n)
        r = got[g]
        assert (r.n, r.successes) == (n, x)
        assert r.p_hat == x / n
        assert (r.ci_lo, r.ci_hi) == (lo, hi)
        # Wilson laws: interval inside [~0,1], contains p_hat, nonzero
        # width even at p_hat = 0 or 1 (the Wald collapse it avoids)
        assert -1e-12 <= r.ci_lo < r.ci_hi <= 1 + 1e-12
        # containment up to a ulp: at p_hat = 1 the exact value of hi
        # is 1 but the fixed shape evaluates to 1 - 1ulp (both engines
        # identically — the shape is the metric definition)
        assert r.ci_lo - 1e-12 <= r.p_hat <= r.ci_hi + 1e-12
        assert r.ci_hi - r.ci_lo > 0
    assert got["nulls"].n == 2  # NULL trial dropped


def test_wilson_shrinks_with_n(spark):
    rows = [("small", i % 2) for i in range(20)]
    rows += [("big", i % 2) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, s int")
    got = {r.g: r for r in grouped_proportion_ci(df, ["g"], "s").collect()}
    w_small = got["small"].ci_hi - got["small"].ci_lo
    w_big = got["big"].ci_hi - got["big"].ci_lo
    assert w_big < w_small / 5  # ~1/sqrt(100) shrink


def _bh_brute(ps):
    """ps: list of (key, p) — returns {key: q} with the same shapes."""
    m = len(ps)
    s = sorted(ps, key=lambda t: (t[1], t[0]))
    raw = [p * float(m) / float(i + 1) for i, (_, p) in enumerate(s)]
    q = [0.0] * m
    run = float("inf")
    for i in range(m - 1, -1, -1):
        run = min(run, raw[i])
        q[i] = min(1.0, run)
    return {s[i][0]: q[i] for i in range(m)}


def test_bh_matches_brute_and_monotone(spark):
    rng = random.Random(164)
    ps = [(f"h{i:02d}", round(rng.random() ** 2, 4)) for i in range(40)]
    ps += [("tie_a", 0.02), ("tie_b", 0.02)]  # p-tie broken by key
    df = spark.createDataFrame(ps, "key string, p double")
    got = {r.key: r for r in bh_adjust(df, "p", ["key"]).collect()}
    want = _bh_brute(ps)
    assert {k: r.q_value for k, r in got.items()} == want
    # q >= p everywhere, q monotone in p-rank, capped at 1
    ranked = sorted(got.values(), key=lambda r: r.p_rank)
    for r in ranked:
        assert r.q_value >= r.p - 1e-15 and r.q_value <= 1.0
    for a, b in zip(ranked, ranked[1:]):
        assert a.q_value <= b.q_value + 1e-15
    # deterministic tie-break: tie_a ranks before tie_b
    assert got["tie_a"].p_rank < got["tie_b"].p_rank


def test_bh_families_and_nulls(spark):
    rows = [("f1", "a", 0.01), ("f1", "b", 0.04), ("f2", "c", 0.01),
            ("f2", "d", None), ("f2", "e", float("nan"))]
    df = spark.createDataFrame(rows, "fam string, key string, p double")
    got = bh_adjust(df, "p", ["key"], family_cols=["fam"]).collect()
    by = {(r.fam, r.key): r for r in got}
    assert len(got) == 3  # NULL/NaN p dropped
    assert by[("f1", "a")].m == 2 and by[("f2", "c")].m == 1
    # single-hypothesis family: q = p
    assert by[("f2", "c")].q_value == 0.01
    with pytest.raises(ValueError):
        bh_adjust(df, "p", [])
    with pytest.raises(ValueError):
        bh_adjust_sql("t", "p", [])


def test_duckdb_twins(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(5)
    pdf = pd.DataFrame(
        {
            "g": [f"g{i % 7}" for i in range(300)],
            "s": [int(rng.random() < 0.3) for _ in range(300)],
            "p": [round(rng.random(), 5) for _ in range(300)],
            "key": [f"k{i:03d}" for i in range(300)],
        }
    )
    p = str(tmp_path / "cf.parquet")
    pdf.to_parquet(p)
    sdf = spark.read.parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")

    got = grouped_proportion_ci(sdf, ["g"], "s").orderBy("g").toPandas()
    want = con.sql(grouped_proportion_ci_sql("t", "g", "s") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got2 = bh_adjust(sdf, "p", ["key"], family_cols=["g"]).orderBy("g", "key").toPandas()
    want2 = con.sql(
        bh_adjust_sql("t", "p", ["key"], family="g") + " ORDER BY fam, key"
    ).df()
    want2 = want2.rename(columns={"fam": "g"})
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)

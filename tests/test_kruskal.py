"""Grouped Kruskal–Wallis (operators/stats.grouped_kruskal_wallis):
exact fixed-point parity against an integer midrank brute (truncation
replicated), classic tie-corrected H Fraction closeness, all-tied /
identical-treatments / separation laws, float rejection, partition
invariance, DuckDB twin."""

import random
from fractions import Fraction

import pytest

from btl_bloomfilter_spark.operators.stats import (
    grouped_kruskal_wallis,
    grouped_kruskal_wallis_sql,
)

TS = 1_000_000


def _brute(rows):
    """rows: [(treat, value)] -> (n, k, df, ties_t, h, h_corrected),
    replicating the operator's quantize-once truncation exactly."""
    from collections import Counter

    N = len(rows)
    vals = Counter(v for _, v in rows)
    cum, r2 = 0, {}
    for v in sorted(vals):
        ct = vals[v]
        cum += ct
        r2[v] = 2 * cum - ct + 1
    by_t = {}
    for t, v in rows:
        by_t.setdefault(t, []).append(v)
    k = len(by_t)
    A = 0
    for xs in by_t.values():
        R2 = sum(r2[v] for v in xs)
        A += (R2 * R2 * TS) // (4 * len(xs))
    T = sum(ct**3 - ct for ct in vals.values())
    hnum = max(12 * A - 3 * TS * N * (N + 1) ** 2, 0)
    h = float(hnum) / float(TS * N * (N + 1)) if k >= 2 else None
    n3n = N**3 - N
    hc = (
        h / (float(n3n - T) / float(n3n))
        if k >= 2 and n3n > T
        else None
    )
    return (N, k, k - 1, T, h, hc)


def _classic(rows):
    """Exact-rational tie-corrected H for the closeness check."""
    from collections import Counter

    N = len(rows)
    vals = Counter(v for _, v in rows)
    cum, r2 = 0, {}
    for v in sorted(vals):
        ct = vals[v]
        cum += ct
        r2[v] = 2 * cum - ct + 1
    by_t = {}
    for t, v in rows:
        by_t.setdefault(t, []).append(v)
    A = sum(
        Fraction(sum(r2[v] for v in xs), 2) ** 2 / len(xs)
        for xs in by_t.values()
    )
    h = Fraction(12, N * (N + 1)) * A - 3 * (N + 1)
    T = sum(ct**3 - ct for ct in vals.values())
    corr = 1 - Fraction(T, N**3 - N)
    return float(h / corr) if corr != 0 else None


def test_matches_brute_and_classic(spark):
    rng = random.Random(5)
    rows = []
    for g in range(3):
        for t in range(4):
            for _ in range(rng.randint(15, 50)):
                rows.append((g, f"t{t}", rng.randint(0, 30) + t * g))
    df = spark.createDataFrame(rows, "g int, t string, v long")
    got = {
        r["g"]: (r["n"], r["k"], r["df"], r["ties_t"], r["h"], r["h_corrected"])
        for r in grouped_kruskal_wallis(df, ["g"], "t", "v").collect()
    }
    for g in range(3):
        sub = [(t, v) for gg, t, v in rows if gg == g]
        assert got[g] == _brute(sub), g
        hc = _classic(sub)
        assert abs(got[g][5] - hc) < 1e-4 * max(1.0, hc), g


def test_all_tied_and_identical_treatments(spark):
    # every value equal: h == 0.0 exactly, h_corrected NULL
    tied = spark.createDataFrame(
        [(0, f"t{i % 3}", 7) for i in range(30)], "g int, t string, v long"
    )
    r = grouped_kruskal_wallis(tied, ["g"], "t", "v").collect()[0]
    assert r["h"] == 0.0 and r["h_corrected"] is None
    # identical multisets per treatment: true H == 0; truncation
    # undershoot is clamped, overshoot bounded tiny
    vals = [1, 4, 4, 9, 2]
    rows = [(0, f"t{t}", v) for t in range(3) for v in vals]
    df = spark.createDataFrame(rows, "g int, t string, v long")
    r = grouped_kruskal_wallis(df, ["g"], "t", "v").collect()[0]
    assert r["h"] < 1e-4
    # single treatment: h NULL
    one = spark.createDataFrame(
        [(0, "a", v) for v in (3, 1, 5)], "g int, t string, v long"
    )
    r1 = grouped_kruskal_wallis(one, ["g"], "t", "v").collect()[0]
    assert r1["h"] is None and r1["h_corrected"] is None


def test_separation_beats_mixing(spark):
    # fully separated blocks score far above interleaved ones
    sep = [(0, "a", v) for v in range(10)] + [(0, "b", v + 100) for v in range(10)]
    mix = [(0, "a", v) for v in range(0, 20, 2)] + [
        (0, "b", v) for v in range(1, 21, 2)
    ]
    d1 = spark.createDataFrame(sep, "g int, t string, v long")
    d2 = spark.createDataFrame(mix, "g int, t string, v long")
    h1 = grouped_kruskal_wallis(d1, ["g"], "t", "v").collect()[0]["h_corrected"]
    h2 = grouped_kruskal_wallis(d2, ["g"], "t", "v").collect()[0]["h_corrected"]
    assert h1 > 10 and h2 < 1 and h1 > 20 * h2


def test_float_rejected_and_null_drops(spark):
    fdf = spark.createDataFrame([(0, "a", 1.5)], "g int, t string, v double")
    with pytest.raises(ValueError):
        grouped_kruskal_wallis(fdf, ["g"], "t", "v")
    df = spark.createDataFrame(
        [(0, "a", 1), (0, "a", 2), (0, None, 9), (0, "b", None), (0, "b", 3)],
        "g int, t string, v long",
    )
    r = grouped_kruskal_wallis(df, ["g"], "t", "v").collect()[0]
    assert r["n"] == 3 and r["k"] == 2


def test_monotone_transform_invariance(spark):
    # ranks see only order: v -> 1000*v + 5 leaves H identical (the
    # property ANOVA lacks)
    rng = random.Random(9)
    rows = [(0, f"t{rng.randint(0, 2)}", rng.randint(0, 50)) for _ in range(200)]
    d1 = spark.createDataFrame(rows, "g int, t string, v long")
    d2 = spark.createDataFrame(
        [(g, t, 1000 * v + 5) for g, t, v in rows], "g int, t string, v long"
    )
    r1 = grouped_kruskal_wallis(d1, ["g"], "t", "v").collect()[0]
    r2 = grouped_kruskal_wallis(d2, ["g"], "t", "v").collect()[0]
    assert (r1["h"], r1["h_corrected"]) == (r2["h"], r2["h_corrected"])


def test_partition_invariance(spark):
    rng = random.Random(13)
    rows = [(0, f"t{rng.randint(0, 3)}", rng.randint(0, 15)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g int, t string, v long")
    one = grouped_kruskal_wallis(df, ["g"], "t", "v").collect()[0]
    two = grouped_kruskal_wallis(
        df.repartition(23, "v"), ["g"], "t", "v"
    ).collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(29)
    rows = [
        (rng.randint(0, 3), f"t{rng.randint(0, 4)}", rng.randint(0, 40))
        for _ in range(2500)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "t", "v"])
    p = str(tmp_path / "kw.parquet")
    pdf.to_parquet(p)
    got = (
        grouped_kruskal_wallis(spark.read.parquet(p), ["g"], "t", "v")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        grouped_kruskal_wallis_sql("__t", "g", "t", "v") + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

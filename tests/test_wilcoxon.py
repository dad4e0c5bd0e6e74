"""Wilcoxon signed-rank + paired t (operators/stats): brute parity
(signed midranks / exact moments), all-positive rank_biserial == 1.0
exactly, sign-flip antisymmetry, symmetric-pairs z == 0, all-zero-diff
NULLs, zero-diff conventions (Wilcoxon drops, t keeps), float handling
(Wilcoxon welcomes, t rejects), location-shift law, partition
invariance, DuckDB twins."""

import math
import random
from collections import defaultdict

import pytest

from btl_bloomfilter_spark.operators.stats import (
    paired_t,
    paired_t_sql,
    wilcoxon_signed_rank,
    wilcoxon_signed_rank_sql,
)


def _brute_wsr(pairs):
    """pairs: [(a, b)] -> operator outputs (via signed midranks)."""
    ds = [a - b for a, b in pairs if not math.isnan(a - b)]
    n_pairs, n_zero = len(ds), sum(1 for d in ds if d == 0)
    ds = [d for d in ds if d != 0]
    n = len(ds)
    out = {"n_pairs": n_pairs, "n_zero": n_zero, "n_used": n}
    if n == 0:
        out.update({"ties_t": 0, "w2_fp": None, "w_plus": None,
                    "rank_biserial": None, "z": None})
        return out
    hist = defaultdict(lambda: [0, 0])  # |d| -> [t, pos]
    for d in ds:
        hist[abs(d)][0] += 1
        hist[abs(d)][1] += d > 0
    w2 = tt = 0
    cum = 0
    for v in sorted(hist):
        t, p = hist[v]
        w2 += p * (2 * cum + t + 1)
        tt += t * t * t - t
        cum += t
    s = n * (n + 1)
    den = 2 * n * (n + 1) * (2 * n + 1) - tt
    out.update({
        "ties_t": tt,
        "w2_fp": str(w2),
        "w_plus": float(w2) / 2.0,
        "rank_biserial": float(2 * w2 - s) / float(s),
        "z": float(2 * w2 - s) / math.sqrt(float(den) / 3.0),
    })
    return out


def test_wsr_matches_brute(spark):
    rng = random.Random(211)
    rows = []
    for g in range(3):
        for _ in range(200):
            a = rng.randint(0, 30)
            rows.append((g, a, a + rng.randint(-4, 6)))
    df = spark.createDataFrame(rows, "g int, a long, b long")
    got = {r["g"]: r.asDict()
           for r in wilcoxon_signed_rank(df, ["g"], "a", "b").collect()}
    for g in range(3):
        want = _brute_wsr([(a, b) for gg, a, b in rows if gg == g])
        for k, v in want.items():
            if isinstance(v, float):
                assert got[g][k] == pytest.approx(v, abs=0, rel=0), (g, k)
            else:
                assert got[g][k] == v, (g, k)


def test_wsr_scipy_like_no_ties_golden(spark):
    # distinct |d| (no ties): z must match the textbook normal approx
    # computed independently with single (undoubled) ranks.
    ds = [3, -1, 7, -12, 5, 9, -4, 15, 2, -8, 11, 6]
    rows = [(0, d, 0) for d in ds]
    df = spark.createDataFrame(rows, "g int, a long, b long")
    r = wilcoxon_signed_rank(df, ["g"], "a", "b").collect()[0]
    ranked = sorted(range(len(ds)), key=lambda i: abs(ds[i]))
    wp = sum(rk + 1 for rk, i in enumerate(ranked) if ds[i] > 0)
    n = len(ds)
    z = (wp - n * (n + 1) / 4.0) / math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0)
    assert r["w_plus"] == float(wp)
    assert r["z"] == pytest.approx(z, rel=1e-12)


def test_wsr_all_positive_rb_one_exactly_and_antisymmetry(spark):
    rows = [(0, 10 + i, i) for i in range(25)]
    df = spark.createDataFrame(rows, "g int, a long, b long")
    r = wilcoxon_signed_rank(df, ["g"], "a", "b").collect()[0]
    assert r["rank_biserial"] == 1.0
    assert r["w_plus"] == 25 * 26 / 2.0  # n(n+1)/2
    flipped = wilcoxon_signed_rank(df, ["g"], "b", "a").collect()[0]
    assert flipped["rank_biserial"] == -1.0
    assert flipped["z"] == -r["z"]


def test_wsr_symmetric_zero_and_all_zero_null(spark):
    rows = [(0, x, 0) for x in range(1, 11)] + [(0, -x, 0) for x in range(1, 11)]
    df = spark.createDataFrame(rows, "g int, a long, b long")
    r = wilcoxon_signed_rank(df, ["g"], "a", "b").collect()[0]
    assert r["z"] == 0.0 and r["rank_biserial"] == 0.0
    rows2 = [(0, 5, 5)] * 8
    df2 = spark.createDataFrame(rows2, "g int, a long, b long")
    r2 = wilcoxon_signed_rank(df2, ["g"], "a", "b").collect()[0]
    assert r2["n_zero"] == 8 and r2["n_used"] == 0
    assert r2["z"] is None and r2["rank_biserial"] is None


def test_wsr_doubles_and_nan_dropped(spark):
    rows = [(0, 1.5, 1.0), (0, 2.25, 1.0), (0, float("nan"), 1.0),
            (0, 0.5, 1.0), (0, 1.0, 1.0)]
    df = spark.createDataFrame(rows, "g int, a double, b double")
    r = wilcoxon_signed_rank(df, ["g"], "a", "b").collect()[0]
    assert r["n_pairs"] == 4 and r["n_zero"] == 1 and r["n_used"] == 3
    want = _brute_wsr([(1.5, 1.0), (2.25, 1.0), (0.5, 1.0), (1.0, 1.0)])
    assert r["z"] == pytest.approx(want["z"], rel=0, abs=0)


def test_pt_matches_brute(spark):
    rng = random.Random(223)
    rows = []
    for g in range(3):
        for _ in range(150):
            a = rng.randint(0, 100)
            rows.append((g, a, a + rng.randint(-10, 14)))
    df = spark.createDataFrame(rows, "g int, a long, b long")
    got = {r["g"]: r.asDict() for r in paired_t(df, ["g"], "a", "b").collect()}
    for g in range(3):
        ds = [a - b for gg, a, b in rows if gg == g]
        n, s, q = len(ds), sum(ds), sum(d * d for d in ds)
        vd = n * q - s * s
        assert got[g]["n"] == n and got[g]["s_fp"] == str(s)
        assert got[g]["vd_fp"] == str(vd)
        assert got[g]["mean_diff"] == float(s) / float(n)
        assert got[g]["t"] == float(s) / math.sqrt(float(vd) / float(n - 1))
        assert got[g]["cohens_dz"] == float(s) / math.sqrt(
            float(n * vd) / float(n - 1))
        assert got[g]["dof"] == n - 1


def test_pt_laws(spark):
    # constant nonzero diff: vd == 0, t NULL (observable via vd_fp)
    rows = [(0, i + 7, i) for i in range(10)]
    df = spark.createDataFrame(rows, "g int, a long, b long")
    r = paired_t(df, ["g"], "a", "b").collect()[0]
    assert r["vd_fp"] == "0" and r["t"] is None and r["mean_diff"] == 7.0
    # antisymmetry: swapping a/b negates mean_diff, t, dz exactly
    rows2 = [(0, i * 3 % 17, (i * 5 + 2) % 13) for i in range(40)]
    df2 = spark.createDataFrame(rows2, "g int, a long, b long")
    fw = paired_t(df2, ["g"], "a", "b").collect()[0]
    bw = paired_t(df2, ["g"], "b", "a").collect()[0]
    assert bw["t"] == -fw["t"] and bw["cohens_dz"] == -fw["cohens_dz"]
    assert bw["mean_diff"] == -fw["mean_diff"]
    # zero diffs are KEPT (t-test convention, unlike Wilcoxon)
    rows3 = [(0, 5, 5)] * 6 + [(0, 9, 5)] * 2
    df3 = spark.createDataFrame(rows3, "g int, a long, b long")
    r3 = paired_t(df3, ["g"], "a", "b").collect()[0]
    assert r3["n"] == 8 and r3["mean_diff"] == 1.0


def test_pt_float_rejected(spark):
    df = spark.createDataFrame([(0, 1.5, 1.0)], "g int, a double, b double")
    with pytest.raises(ValueError, match="integral"):
        paired_t(df, ["g"], "a", "b")


def test_partition_invariance(spark):
    rng = random.Random(227)
    rows = [(0, rng.randint(0, 40), rng.randint(0, 40)) for _ in range(800)]
    df = spark.createDataFrame(rows, "g int, a long, b long")
    for op in (wilcoxon_signed_rank, paired_t):
        one = op(df, ["g"], "a", "b").collect()[0]
        two = op(df.repartition(13, "a"), ["g"], "a", "b").collect()[0]
        assert one == two, op.__name__


def test_duckdb_twins(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(229)
    rows = [
        (rng.randint(0, 3), rng.randint(0, 50), rng.randint(0, 50))
        for _ in range(3000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "a", "b"])
    p = str(tmp_path / "w.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    for op, twin in (
        (wilcoxon_signed_rank, wilcoxon_signed_rank_sql),
        (paired_t, paired_t_sql),
    ):
        got = op(spark.read.parquet(p), ["g"], "a", "b").orderBy("g").toPandas()
        want = con.sql(twin("__t", "g", "a", "b") + " ORDER BY g").df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

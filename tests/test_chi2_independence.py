"""Chi-square test of independence + Cramér's V
(operators/stats.chi2_independence): brute fixed-point parity
(including the empty-cell identity), classic-chi² closeness bound,
perfect-association v == 1.0 and exact-independence chi² == 0 laws,
single-axis NULL semantics, partition invariance, DuckDB twin."""

import collections
import math
import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    chi2_independence,
    chi2_independence_sql,
)


def _brute(pairs, scale):
    """pairs: list of (a, b) with no NULLs.  Mirrors the engines'
    fixed-point identity exactly: fp = max(Σ o²·N·S div (r·c) − N·S, 0)."""
    o = collections.Counter(pairs)
    ra = collections.Counter(a for a, _ in pairs)
    cb = collections.Counter(b for _, b in pairs)
    n = len(pairs)
    fpr = sum((v * v * n * scale) // (ra[a] * cb[b]) for (a, b), v in o.items())
    fp = max(fpr - n * scale, 0)
    ka, kb = len(ra), len(cb)
    chi2 = float(fp) / float(scale)
    v = (
        math.sqrt(float(fp) / float(scale * n * (min(ka, kb) - 1)))
        if min(ka, kb) > 1
        else None
    )
    return (n, ka, kb, (ka - 1) * (kb - 1), str(fp), chi2, v)


def _classic(pairs):
    """Textbook Σ(o−e)²/e over ALL cells including empty ones."""
    o = collections.Counter(pairs)
    ra = collections.Counter(a for a, _ in pairs)
    cb = collections.Counter(b for _, b in pairs)
    n = len(pairs)
    return sum(
        (o.get((a, b), 0) - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for a in ra
        for b in cb
    )


def test_matches_brute_and_classic(spark):
    rng = random.Random(3)
    rows = []
    for g in range(4):
        n = rng.randint(30, 120)
        for _ in range(n):
            a = rng.choice("abcd"[: 2 + g % 3])
            # mild dependence: b leans on a
            b = a.upper() if rng.random() < 0.3 else rng.choice("ABC")
            rows.append((g, a, b))
    df = spark.createDataFrame(rows, "g int, a string, b string")
    got = {
        r["g"]: (r["n"], r["n_a"], r["n_b"], r["dof"], r["chi2_fp"], r["chi2"],
                 r["cramers_v"])
        for r in chi2_independence(df, ["g"], "a", "b").collect()
    }
    for g in range(4):
        pairs = [(a, b) for gg, a, b in rows if gg == g]
        want = _brute(pairs, 10**12)
        assert got[g] == want, (g, got[g], want)
        # the fixed-point sum understates classic chi² by < n_cells/scale
        cells = len(set(pairs))
        assert 0 <= _classic(pairs) - got[g][5] < (cells + 1) / 1e12


def test_perfect_association_v_exactly_one(spark):
    rows = [(0, c, c.upper()) for c in "abc" for _ in range(7)]
    df = spark.createDataFrame(rows, "g int, a string, b string")
    r = chi2_independence(df, ["g"], "a", "b").collect()[0]
    assert r["cramers_v"] == 1.0
    assert r["chi2"] == float(2 * 21)  # (k-1)·N exactly, no truncation


def test_exact_independence_chi2_zero(spark):
    # product table: o(a,b) = ra·cb/N exactly -> every term exact, fp = 0
    rows = []
    for a, na in (("x", 2), ("y", 3)):
        for b, nb in (("u", 4), ("v", 1)):
            rows += [(0, a, b)] * (na * nb)
    df = spark.createDataFrame(rows, "g int, a string, b string")
    r = chi2_independence(df, ["g"], "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["chi2_fp"] == "0" and r["cramers_v"] == 0.0


def test_single_axis_and_nulls(spark):
    rows = [(0, c, "only") for c in "aabbbcc"]
    df = spark.createDataFrame(
        rows + [(0, None, "x"), (0, "a", None)], "g int, a string, b string"
    )
    r = chi2_independence(df, ["g"], "a", "b").collect()[0]
    assert r["n"] == 7 and r["n_b"] == 1 and r["dof"] == 0
    assert r["chi2"] == 0.0 and r["cramers_v"] is None


def test_partition_invariance(spark):
    rng = random.Random(9)
    rows = [(0, rng.choice("abcde"), rng.choice("XY")) for _ in range(300)]
    df = spark.createDataFrame(rows, "g int, a string, b string")
    one = chi2_independence(df, ["g"], "a", "b").collect()[0]
    two = chi2_independence(df.repartition(13, "b"), ["g"], "a", "b").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(42)
    rows = []
    for g in range(5):
        for _ in range(rng.randint(40, 150)):
            a = rng.choice("abcd")
            b = a.upper() if rng.random() < 0.2 + 0.1 * g else rng.choice("ABCDE")
            rows.append((g, a, b))
    pdf = pd.DataFrame(rows, columns=["g", "a", "b"])
    p = str(tmp_path / "chi.parquet")
    pdf.to_parquet(p)
    got = (
        chi2_independence(spark.read.parquet(p), ["g"], "a", "b")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(chi2_independence_sql("t", "g", "a", "b") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([(0, "a", "b")], "g int, a string, b string")
    with pytest.raises(ValueError):
        chi2_independence(df, ["g"], "a", "b", scale=0)
    with pytest.raises(ValueError):
        chi2_independence_sql("t", "g", "a", "b", scale=-5)

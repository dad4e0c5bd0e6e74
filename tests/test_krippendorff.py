"""Krippendorff's alpha (operators/stats.krippendorff_alpha): brute
parity (truncation replicated) + definitional pair-counting Fraction
cross-check, perfect-agreement alpha == 1.0 exactly, singleton
drop-with-report, all-singleton group kept with NULL alpha,
single-category NULL, unequal panels (the fleiss gap), two-rater
full-panel sanity vs chance, partition invariance, DuckDB twin."""

import random
from collections import Counter, defaultdict
from fractions import Fraction

from btl_bloomfilter_spark.operators.stats import (
    krippendorff_alpha,
    krippendorff_alpha_sql,
)

TS = 1_000_000


def _brute(rows):
    """rows: [(unit, cat)] -> operator outputs with truncation
    replicated."""
    units = defaultdict(Counter)
    for u, c in rows:
        units[u][c] += 1
    n_units = len(units)
    pairable = {u: cnt for u, cnt in units.items() if sum(cnt.values()) >= 2}
    do = 0
    for cnt in pairable.values():
        m = sum(cnt.values())
        so2 = sum(o * o for o in cnt.values())
        do += ((m * m - so2) * TS) // (m - 1)
    marg = Counter()
    for cnt in pairable.values():
        marg.update(cnt)
    n = sum(marg.values())
    snc2 = sum(v * v for v in marg.values())
    de = n * n - snc2
    alpha = (
        float(TS * de - (n - 1) * do) / float(TS * de)
        if de > 0 and n >= 2
        else None
    )
    return {
        "n_units": n_units, "n_units_pairable": len(pairable), "n": n,
        "k": len(marg), "do_fp": str(do), "de_fp": str(de), "alpha": alpha,
    }


def _definitional(rows):
    """Exact-rational alpha straight from Krippendorff's definition:
    D_o = (1/n) sum_u (disagreeing ordered pairs in u)/(m_u - 1),
    D_e = (sum_{c != k} n_c n_k)/(n(n-1)); alpha = 1 - D_o/D_e."""
    units = defaultdict(list)
    for u, c in rows:
        units[u].append(c)
    pairable = {u: v for u, v in units.items() if len(v) >= 2}
    n = sum(len(v) for v in pairable.values())
    do = Fraction(0)
    for v in pairable.values():
        m = len(v)
        dis = sum(1 for i in range(m) for j in range(m) if i != j and v[i] != v[j])
        do += Fraction(dis, m - 1)
    do = do / n
    marg = Counter()
    for v in pairable.values():
        marg.update(v)
    de_pairs = sum(
        marg[c] * marg[k] for c in marg for k in marg if c != k
    )
    de = Fraction(de_pairs, n * (n - 1))
    if de == 0:
        return None
    return float(1 - do / de)


def test_matches_brute_and_definition(spark):
    rng = random.Random(113)
    rows = []
    for g in range(3):
        for u in range(40):
            m = rng.choice([1, 2, 3, 3, 4, 5])
            true = rng.randint(0, 3)
            for _ in range(m):
                c = true if rng.random() < 0.7 else rng.randint(0, 3)
                rows.append((g, u, f"c{c}"))
    df = spark.createDataFrame(rows, "g int, u int, cat string")
    got = {
        r["g"]: r.asDict()
        for r in krippendorff_alpha(df, ["g"], "u", "cat").collect()
    }
    for g in range(3):
        sub = [(u, c) for gg, u, c in rows if gg == g]
        want = _brute(sub)
        assert {k: got[g][k] for k in want} == want, g
        # the fixed-point truncation is tiny vs the definitional value
        assert abs(got[g]["alpha"] - _definitional(sub)) < 1e-6, g


def test_perfect_agreement_and_degenerate(spark):
    # unanimous panels (unequal sizes!): alpha == 1.0 exactly
    rows = []
    for u in range(20):
        for _ in range(2 + u % 3):
            rows.append((0, u, f"c{u % 4}"))
    df = spark.createDataFrame(rows, "g int, u int, cat string")
    r = krippendorff_alpha(df, ["g"], "u", "cat").collect()[0]
    assert r["alpha"] == 1.0 and r["do_fp"] == "0"
    # every pairable rating one category: de == 0, alpha NULL
    one_cat = spark.createDataFrame(
        [(1, u, "x") for u in range(5) for _ in range(3)],
        "g int, u int, cat string",
    )
    r1 = krippendorff_alpha(one_cat, ["g"], "u", "cat").collect()[0]
    assert r1["alpha"] is None and r1["de_fp"] == "0"
    # all-singleton group: row kept, n == 0, alpha NULL (the fleiss
    # review lesson)
    single = spark.createDataFrame(
        [(2, u, f"c{u}") for u in range(6)], "g int, u int, cat string"
    )
    r2 = krippendorff_alpha(single, ["g"], "u", "cat").collect()[0]
    assert r2["n_units"] == 6 and r2["n_units_pairable"] == 0
    assert r2["n"] == 0 and r2["k"] == 0 and r2["alpha"] is None


def test_singletons_dropped_but_reported(spark):
    rows = [(0, 0, "a"), (0, 0, "a"), (0, 1, "b")]  # unit 1 singleton
    df = spark.createDataFrame(rows, "g int, u int, cat string")
    r = krippendorff_alpha(df, ["g"], "u", "cat").collect()[0]
    assert r["n_units"] == 2 and r["n_units_pairable"] == 1
    assert r["n"] == 2 and r["k"] == 1  # only unit 0's 'a' margins


def test_random_panels_near_zero(spark):
    rng = random.Random(127)
    rows = []
    for u in range(300):
        for _ in range(3):
            rows.append((0, u, f"c{rng.randint(0, 3)}"))
    df = spark.createDataFrame(rows, "g int, u int, cat string")
    r = krippendorff_alpha(df, ["g"], "u", "cat").collect()[0]
    assert abs(r["alpha"]) < 0.1


def test_partition_invariance(spark):
    rng = random.Random(131)
    rows = [
        (0, rng.randint(0, 50), f"c{rng.randint(0, 3)}") for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "g int, u int, cat string")
    one = krippendorff_alpha(df, ["g"], "u", "cat").collect()[0]
    two = krippendorff_alpha(df.repartition(17, "u"), ["g"], "u", "cat").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(137)
    rows = []
    for g in range(3):
        for u in range(60):
            for _ in range(rng.choice([1, 2, 3, 4])):
                rows.append((g, u, f"c{rng.randint(0, 4)}"))
    pdf = pd.DataFrame(rows, columns=["g", "u", "cat"])
    p = str(tmp_path / "ka.parquet")
    pdf.to_parquet(p)
    got = (
        krippendorff_alpha(spark.read.parquet(p), ["g"], "u", "cat")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        krippendorff_alpha_sql("__t", "g", "u", "cat") + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

"""Friedman test + Kendall's W (operators/stats.friedman): brute
parity (pure-integer statistic), classic no-tie formula cross-check,
perfect concordance W == 1.0 exactly, all-tied blocks NULL correction,
incomplete-block exclusion, duplicate canonicalization, double values,
partition invariance, DuckDB twin."""

import random
from collections import Counter, defaultdict

from btl_bloomfilter_spark.operators.stats import friedman, friedman_sql


def _brute(rows):
    """rows: [(s, t, v)] unique per (s,t) -> operator outputs."""
    blocks = defaultdict(dict)
    treats = set()
    for s, t, v in rows:
        blocks[s][t] = max(v, blocks[s].get(t, v))
        treats.add(t)
    k = len(treats)
    complete = {s: d for s, d in blocks.items() if len(d) == k}
    n = len(complete)
    r2j = Counter()
    T = 0
    for d in complete.values():
        cnt = Counter(d.values())
        cum = 0
        rk = {}
        for v in sorted(cnt):
            ct = cnt[v]
            cum += ct
            rk[v] = 2 * cum - ct + 1
            T += ct**3 - ct
        for t, v in d.items():
            r2j[t] += rk[v]
    out = {
        "n_blocks": len(blocks),
        "n_excluded": len(blocks) - n,
        "n_used": n,
        "k": k,
        "df": k - 1,
        "ties_t": T if n else 0,
    }
    if k < 2 or n == 0:
        out.update({"chi2": None, "chi2_corrected": None, "kendall_w": None})
        return out
    sr2 = sum(x * x for x in r2j.values())
    num = 3 * (sr2 - n * n * k * (k + 1) ** 2)
    den = n * k * (k + 1)
    chi = float(num) / float(den)
    tden = n * k * (k * k - 1)
    out["chi2"] = chi
    out["chi2_corrected"] = (
        chi / (float(tden - T) / float(tden)) if tden - T > 0 else None
    )
    out["kendall_w"] = float(num) / float(den * n * (k - 1))
    return out


def test_matches_brute_and_classic(spark):
    rng = random.Random(163)
    rows = []
    for g in range(3):
        for s in range(50):
            for t in range(4):
                if rng.random() < 0.93:
                    rows.append((g, s, f"t{t}", rng.randint(0, 20) + 2 * t))
    df = spark.createDataFrame(rows, "g int, s int, t string, v long")
    got = {r["g"]: r.asDict() for r in friedman(df, ["g"], "s", "t", "v").collect()}
    for g in range(3):
        want = _brute([(s, t, v) for gg, s, t, v in rows if gg == g])
        assert {c: got[g][c] for c in want} == want, g


def test_no_ties_classic_formula(spark):
    # distinct values within every block: chi2 equals the textbook
    # 12/(nk(k+1)) sum R_j^2 - 3n(k+1) computed independently
    rng = random.Random(167)
    rows = []
    for s in range(40):
        perm = rng.sample(range(100), 3)
        for t, v in enumerate(perm):
            rows.append((0, s, f"t{t}", v))
    df = spark.createDataFrame(rows, "g int, s int, t string, v long")
    r = friedman(df, ["g"], "s", "t", "v").collect()[0]
    # independent computation with single (not doubled) ranks
    R = Counter()
    for s in range(40):
        vals = sorted((v, t) for g, ss, t, v in rows if ss == s)
        for rank, (_, t) in enumerate(vals, start=1):
            R[t] += rank
    n, k = 40, 3
    want = 12.0 / (n * k * (k + 1)) * sum(x * x for x in R.values()) - 3 * n * (
        k + 1
    )
    assert abs(r["chi2"] - want) < 1e-9
    assert r["ties_t"] == 0 and r["chi2_corrected"] == r["chi2"]


def test_perfect_concordance_and_all_tied(spark):
    # every block ranks treatments identically: W == 1.0 EXACTLY
    rows = [(0, s, f"t{t}", 10 * t) for s in range(25) for t in range(4)]
    df = spark.createDataFrame(rows, "g int, s int, t string, v long")
    r = friedman(df, ["g"], "s", "t", "v").collect()[0]
    assert r["kendall_w"] == 1.0 and r["chi2"] == 25.0 * 3  # n(k-1)
    # all blocks fully tied: chi2 == 0, correction NULL
    flat = [(1, s, f"t{t}", 7) for s in range(10) for t in range(3)]
    df2 = spark.createDataFrame(flat, "g int, s int, t string, v long")
    r2 = friedman(df2, ["g"], "s", "t", "v").collect()[0]
    assert r2["chi2"] == 0.0 and r2["chi2_corrected"] is None
    assert r2["kendall_w"] == 0.0


def test_incomplete_and_duplicates(spark):
    rows = [
        (0, 1, "A", 3.0), (0, 1, "B", 5.0), (0, 1, "B", 1.0),  # dup B -> 5
        (0, 2, "A", 9.0),  # incomplete block
        (0, 3, "A", 2.5), (0, 3, "B", 2.5),  # doubles + within-block tie
    ]
    df = spark.createDataFrame(rows, "g int, s int, t string, v double")
    r = friedman(df, ["g"], "s", "t", "v").collect()[0]
    assert r["n_blocks"] == 3 and r["n_excluded"] == 1 and r["n_used"] == 2
    want = _brute([(1, "A", 3.0), (1, "B", 5.0), (3, "A", 2.5), (3, "B", 2.5)])
    assert r["chi2"] == want["chi2"] and r["ties_t"] == want["ties_t"]


def test_partition_invariance(spark):
    rng = random.Random(173)
    rows = [
        (0, rng.randint(0, 60), f"t{rng.randint(0, 2)}", rng.randint(0, 9))
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "g int, s int, t string, v long")
    one = friedman(df, ["g"], "s", "t", "v").collect()[0]
    two = friedman(df.repartition(19, "s"), ["g"], "s", "t", "v").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(179)
    rows = []
    for g in range(3):
        for s in range(60):
            for t in range(3):
                if rng.random() < 0.94:
                    rows.append((g, s, f"t{t}", rng.randint(0, 15)))
    pdf = pd.DataFrame(rows, columns=["g", "s", "t", "v"])
    p = str(tmp_path / "fr.parquet")
    pdf.to_parquet(p)
    got = (
        friedman(spark.read.parquet(p), ["g"], "s", "t", "v")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(friedman_sql("__t", "g", "s", "t", "v") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

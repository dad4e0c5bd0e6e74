"""Page trend test (operators/stats.page_trend): brute parity
replicating the doubled-midrank + permutation-variance shape,
no-ties golden vs the textbook L/z formulas computed independently
with single ranks, perfect-concordance pin, exact order-reversal
antisymmetry, incomplete-block exclusion, all-tied NULL, duplicate
canonicalization, partition invariance, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.stats import page_trend, page_trend_sql


def _brute(rows):
    """rows: [(subject, treat, value)] — replicate the operator step
    for step: complete blocks, doubled midranks, dense-rank weights,
    num2 / sqrt(var12/12)."""
    from collections import defaultdict

    panel = {}
    for s, t, v in rows:
        key = (s, t)
        panel[key] = max(panel.get(key, v), v)
    treats = sorted({t for _, t in panel})
    k = len(treats)
    wj = {t: i + 1 for i, t in enumerate(treats)}
    blocks = defaultdict(dict)
    for (s, t), v in panel.items():
        blocks[s][t] = v
    complete = {s: b for s, b in blocks.items() if len(b) == k}
    n = len(complete)
    l2 = 0
    q2 = 0
    for b in complete.values():
        vals = sorted(b.values())
        for t, v in b.items():
            below = sum(1 for x in vals if x < v)
            ct = sum(1 for x in vals if x == v)
            r2 = 2 * below + ct + 1  # doubled midrank
            l2 += wj[t] * r2
            q2 += r2 * r2
    out = {
        "n_blocks": len(blocks),
        "n_excluded": len(blocks) - n,
        "n_used": n,
        "k": k,
        "l2_fp": str(l2),
    }
    ok = k >= 2 and n > 0
    out["l"] = l2 / 2.0 if ok else None
    ss = q2 - n * k * (k + 1) * (k + 1)
    if ok and ss > 0:
        num2 = 2 * l2 - n * k * (k + 1) * (k + 1)
        out["z"] = (float(num2) / 2.0) / math.sqrt(
            float(k * (k + 1) * ss) / 12.0
        )
    else:
        out["z"] = None
    return out


def test_matches_brute(spark):
    rng = random.Random(479)
    rows = []
    for g in range(3):
        drift = rng.uniform(0.0, 1.5)
        for s in range(60):
            for t in range(4):
                rows.append(
                    (g, s, t, rng.randint(0, 8) + int(drift * t))
                )
    df = spark.createDataFrame(rows, "g int, s int, t int, v int")
    got = {
        r["g"]: r.asDict()
        for r in page_trend(df, ["g"], "s", "t", "v").collect()
    }
    for g in range(3):
        want = _brute([(s, t, v) for gg, s, t, v in rows if gg == g])
        assert {c: got[g][c] for c in want} == want, g


def test_no_ties_golden_textbook(spark):
    """With no within-block ties, z must equal the Page 1963 textbook
    normal approximation (L = Σ j·R_j with SINGLE ranks,
    E = n·k(k+1)²/4, Var = n·k²(k+1)²(k−1)/144) computed
    independently here."""
    rng = random.Random(487)
    k, n = 5, 40
    rows = []
    l_txt = 0.0
    for s in range(n):
        vals = rng.sample(range(1000), k)  # distinct → no ties
        rows.append((0, s, list(range(k)), vals))
    flat = [(g, s, t, vs[t]) for g, s, ts, vs in rows for t in ts]
    for _, s, ts, vs in rows:
        order = sorted(range(k), key=lambda t: vs[t])
        rank = {t: i + 1 for i, t in enumerate(order)}
        l_txt += sum((t + 1) * rank[t] for t in range(k))
    e = n * k * (k + 1) ** 2 / 4.0
    var = n * k * k * (k + 1) ** 2 * (k - 1) / 144.0
    z_txt = (l_txt - e) / math.sqrt(var)
    df = spark.createDataFrame(flat, "g int, s int, t int, v int")
    r = page_trend(df, ["g"], "s", "t", "v").collect()[0]
    assert r["l"] == l_txt
    assert r["z"] == pytest.approx(z_txt, rel=1e-12)


def test_perfect_concordance(spark):
    """Every block strictly increasing along the treatment order:
    L == n·Σj² == n·k(k+1)(2k+1)/6 exactly, z > 0 maximal."""
    k, n = 4, 25
    rows = [(0, s, t, t * 10) for s in range(n) for t in range(k)]
    df = spark.createDataFrame(rows, "g int, s int, t int, v int")
    r = page_trend(df, ["g"], "s", "t", "v").collect()[0]
    assert r["l"] == n * k * (k + 1) * (2 * k + 1) / 6.0
    # closed form at the concordant extreme: num2 == SS == n·k(k²−1)/3
    # so z = √(3·SS/(k(k+1))) = √(n(k−1))
    assert r["z"] == pytest.approx(math.sqrt(n * (k - 1)), rel=1e-12)


def test_order_reversal_antisymmetry_exact(spark):
    """Reversing the treatment order maps w_j → k+1−w_j, so
    num2 → −num2 with SS unchanged: z flips sign EXACTLY (same
    floats, not approx)."""
    rng = random.Random(491)
    rows = [
        (0, s, t, rng.randint(0, 6) + t) for s in range(50) for t in range(4)
    ]
    df = spark.createDataFrame(rows, "g int, s int, t int, v int")
    fw = page_trend(df, ["g"], "s", "t", "v").collect()[0]
    rev = df.selectExpr("g", "s", "3 - t AS t", "v")
    bw = page_trend(rev, ["g"], "s", "t", "v").collect()[0]
    assert bw["z"] == -fw["z"]
    assert bw["l2_fp"] != fw["l2_fp"]


def test_incomplete_blocks_excluded_and_all_tied_null(spark):
    rows = (
        [(0, s, t, t) for s in range(10) for t in range(3)]
        + [(0, 99, 0, 5)]                       # incomplete block
        + [(1, s, t, 7) for s in range(6) for t in range(3)]  # all tied
    )
    df = spark.createDataFrame(rows, "g int, s int, t int, v int")
    got = {r["g"]: r for r in page_trend(df, ["g"], "s", "t", "v").collect()}
    assert got[0]["n_blocks"] == 11 and got[0]["n_excluded"] == 1
    assert got[0]["n_used"] == 10 and got[0]["z"] > 3
    assert got[1]["z"] is None and got[1]["l"] is not None


def test_duplicates_canonicalize_to_max(spark):
    rows = [(0, s, t, t) for s in range(8) for t in range(3)] + [
        (0, 0, 2, -50)  # duplicate (subject 0, treat 2) — max wins
    ]
    df = spark.createDataFrame(rows, "g int, s int, t int, v int")
    a = page_trend(df, ["g"], "s", "t", "v").collect()[0]
    b = page_trend(
        spark.createDataFrame(
            [(0, s, t, t) for s in range(8) for t in range(3)],
            "g int, s int, t int, v int",
        ),
        ["g"], "s", "t", "v",
    ).collect()[0]
    assert a == b


def test_partition_invariance(spark):
    rng = random.Random(499)
    rows = [
        (0, s, t, rng.randint(0, 9)) for s in range(80) for t in range(4)
    ]
    df = spark.createDataFrame(rows, "g int, s int, t int, v int")
    one = page_trend(df, ["g"], "s", "t", "v").collect()[0]
    two = page_trend(
        df.repartition(11, "v"), ["g"], "s", "t", "v"
    ).collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(503)
    rows = [
        (g, s, t, rng.randint(0, 7) + (t if g % 2 else 0))
        for g in range(4)
        for s in range(50)
        for t in range(5)
        if rng.random() < 0.97  # a few incomplete blocks
    ]
    pdf = pd.DataFrame(rows, columns=["g", "s", "t", "v"])
    p = str(tmp_path / "pg.parquet")
    pdf.to_parquet(p)
    got = (
        page_trend(spark.read.parquet(p), ["g"], "s", "t", "v")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        page_trend_sql("__t", "g", "s", "t", "v") + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_null_group_key_parity(spark):
    """NULL group keys: the twin's final join is null-safe (review
    catch: `ON b.g = a.g` reported n_used = 0 / all-NULL L and z for
    the NULL group while Spark computed the real values)."""
    import duckdb
    import pandas as pd

    rows = [(None, s, t, t * 3 + s % 2) for s in range(10) for t in range(3)]
    df = spark.createDataFrame(rows, "g int, s int, t int, v int")
    got = page_trend(df, ["g"], "s", "t", "v").collect()[0]
    assert got["n_used"] == 10 and got["z"] is not None
    con = duckdb.connect()
    con.register("__pgn", pd.DataFrame(rows, columns=["g", "s", "t", "v"]))
    want = con.sql(page_trend_sql("__pgn", "g", "s", "t", "v")).df()
    assert len(want) == 1
    assert want.iloc[0]["n_used"] == 10
    assert want.iloc[0]["z"] == got["z"]

"""Cochran–Mantel–Haenszel stratified 2×2 (operators/stats.
mantel_haenszel): brute parity replicating the quantize-once
micro-unit terms, single-stratum reduction laws (chi2 ==
Pearson·(N−1)/N vs chi2_independence, or_mh ≈ two_by_two's OR),
planted Simpson's paradox (crude OR > 1, stratified ≈ 1),
exposure-flip z antisymmetry, degenerate NULLs, bad-flag raises
(both engines), partition invariance, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    mantel_haenszel,
    mantel_haenszel_sql,
)

M = 1_000_000


def _brute(rows):
    """rows: [(stratum, exposed, outcome)] — replicate the quantized
    terms and float shapes step for step."""
    from collections import defaultdict

    cell = defaultdict(lambda: [0, 0, 0, 0])
    for st, e, o in rows:
        cell[st][(1 - e) * 2 + (1 - o)] += 1
    oa = em = vm = rm = sm = nn = 0
    for a, b, c, d in cell.values():
        n = a + b + c + d
        nn += n
        oa += a
        em += (a + b) * (a + c) * M // n
        if n > 1:
            vm += (a + b) * (c + d) * (a + c) * (b + d) * M // (n * n * (n - 1))
        rm += a * d * M // n
        sm += b * c * M // n
    out = {
        "n_strata": len(cell),
        "n": nn,
        "o_a": oa,
        "e_micro": str(em),
        "v_micro": str(vm),
        "or_mh": float(rm) / float(sm) if sm > 0 else None,
    }
    if vm > 0:
        num = oa * M - em
        chi = float(num * num) / float(vm * M)
        out["chi2"] = chi
        out["z"] = (-1.0 if num < 0 else 1.0) * math.sqrt(chi)
    else:
        out["chi2"] = None
        out["z"] = None
    return out


def test_matches_brute(spark):
    rng = random.Random(509)
    rows = []
    for g in range(4):
        for _ in range(600):
            st = rng.randint(0, 4)
            e = 1 if rng.random() < 0.3 + 0.08 * st else 0
            o = 1 if rng.random() < 0.2 + 0.06 * st + 0.1 * e else 0
            rows.append((g, st, e, o))
    df = spark.createDataFrame(rows, "g int, st int, e int, o int")
    got = {
        r["g"]: r.asDict()
        for r in mantel_haenszel(df, ["g"], "st", "e", "o").collect()
    }
    for g in range(4):
        want = _brute([(st, e, o) for gg, st, e, o in rows if gg == g])
        assert {k: got[g][k] for k in want} == want, g


def test_single_stratum_reduction_laws(spark):
    """One stratum: CMH chi2 is the 2×2 score test = Pearson·(N−1)/N,
    and or_mh is the plain cross-product ratio (both to quantization
    tolerance, not hash)."""
    from btl_bloomfilter_spark.operators.stats import (
        chi2_independence,
        two_by_two_effects,
    )

    rng = random.Random(521)
    rows = [
        (0, 7, 1 if rng.random() < 0.4 else 0, 1 if rng.random() < 0.35 else 0)
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "g int, st int, e int, o int")
    mh = mantel_haenszel(df, ["g"], "st", "e", "o").collect()[0]
    pe = chi2_independence(df, ["g"], "e", "o").collect()[0]
    tb = two_by_two_effects(df, ["g"], "e", "o").collect()[0]
    n = mh["n"]
    assert mh["chi2"] == pytest.approx(pe["chi2"] * (n - 1) / n, rel=1e-4)
    assert mh["or_mh"] == pytest.approx(tb["odds_ratio"], rel=1e-4)


def test_simpson_paradox_planted(spark):
    """Stratum 0: exposure common, outcome common; stratum 1: both
    rare — within each stratum exposure and outcome are EXACTLY
    independent (a·d == b·c), yet the crude pooled table shows a
    strong positive association.  CMH must report or_mh ≈ 1 and
    chi2 ≈ 0 where the crude 2×2 is fooled."""
    from btl_bloomfilter_spark.operators.stats import two_by_two_effects

    rows = []
    # stratum 0: e=1 w.p. 3/4, o=1 w.p. 3/4, independent: counts
    # a,b,c,d = 90,30,30,10 (ad == bc == 900)
    rows += [(0, 0, 1, 1)] * 90 + [(0, 0, 1, 0)] * 30
    rows += [(0, 0, 0, 1)] * 30 + [(0, 0, 0, 0)] * 10
    # stratum 1: e=1 w.p. 1/4, o=1 w.p. 1/4, independent: 10,30,30,90
    rows += [(0, 1, 1, 1)] * 10 + [(0, 1, 1, 0)] * 30
    rows += [(0, 1, 0, 1)] * 30 + [(0, 1, 0, 0)] * 90
    df = spark.createDataFrame(rows, "g int, st int, e int, o int")
    crude = two_by_two_effects(df, ["g"], "e", "o").collect()[0]
    assert crude["odds_ratio"] > 2.0  # the confounded lie
    mh = mantel_haenszel(df, ["g"], "st", "e", "o").collect()[0]
    assert mh["or_mh"] == pytest.approx(1.0, abs=1e-5)
    assert mh["chi2"] == pytest.approx(0.0, abs=1e-6)


def test_exposure_flip_antisymmetry(spark):
    rng = random.Random(523)
    rows = [
        (0, rng.randint(0, 3), 1 if rng.random() < 0.4 else 0,
         1 if rng.random() < 0.3 else 0)
        for _ in range(700)
    ]
    df = spark.createDataFrame(rows, "g int, st int, e int, o int")
    fw = mantel_haenszel(df, ["g"], "st", "e", "o").collect()[0]
    bw = mantel_haenszel(
        df.selectExpr("g", "st", "1 - e AS e", "o"), ["g"], "st", "e", "o"
    ).collect()[0]
    # flipping exposure swaps (a,b)↔(c,d): O−E negates up to
    # quantization, so z flips sign (approx — the div truncations
    # land on different cells)
    assert bw["z"] == pytest.approx(-fw["z"], abs=1e-4)
    assert bw["or_mh"] == pytest.approx(1.0 / fw["or_mh"], rel=1e-4)


def test_degenerate_nulls_and_counts(spark):
    rows = (
        [(0, s, 1, 1) for s in range(3) for _ in range(4)]  # no variation
        + [(1, 0, 1, 1), (1, 0, 0, 0)]                      # tiny stratum
    )
    df = spark.createDataFrame(rows, "g int, st int, e int, o int")
    got = {r["g"]: r for r in mantel_haenszel(df, ["g"], "st", "e", "o").collect()}
    assert got[0]["chi2"] is None and got[0]["z"] is None
    assert got[0]["or_mh"] is None           # Σs == 0
    assert got[0]["n_strata"] == 3 and got[0]["o_a"] == 12
    assert got[1]["chi2"] is not None        # 2×2 with both margins split


def test_bad_flag_raises_both_engines(spark):
    df = spark.createDataFrame([(0, 0, 2, 1)], "g int, st int, e int, o int")
    with pytest.raises(Exception, match="exposed must be 0/1"):
        mantel_haenszel(df, ["g"], "st", "e", "o").collect()
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("__mh_bad", pd.DataFrame([(0, 0, 1, 5)],
                                          columns=["g", "st", "e", "o"]))
    with pytest.raises(Exception, match="outcome must be 0/1"):
        con.sql(mantel_haenszel_sql("__mh_bad", "g", "st", "e", "o")).df()


def test_partition_invariance(spark):
    rng = random.Random(541)
    rows = [
        (0, rng.randint(0, 5), 1 if rng.random() < 0.5 else 0,
         1 if rng.random() < 0.4 else 0)
        for _ in range(900)
    ]
    df = spark.createDataFrame(rows, "g int, st int, e int, o int")
    one = mantel_haenszel(df, ["g"], "st", "e", "o").collect()[0]
    two = mantel_haenszel(
        df.repartition(13, "st"), ["g"], "st", "e", "o"
    ).collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(547)
    rows = [
        (rng.randint(0, 4), rng.randint(0, 3),
         rng.random() < 0.45, rng.random() < 0.3)
        for _ in range(5000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "st", "e", "o"])
    p = str(tmp_path / "mh.parquet")
    pdf.to_parquet(p)
    got = (
        mantel_haenszel(spark.read.parquet(p), ["g"], "st", "e", "o")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        mantel_haenszel_sql("__t", "g", "st", "e", "o") + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

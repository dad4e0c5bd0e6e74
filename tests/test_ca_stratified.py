"""Stratified Cochran–Armitage / CMH trend (operators/stats.
cochran_armitage_stratified): brute parity (the brute sign-splits because PYTHON's // floors
while both engines truncate — the operator itself divides plainly), single-stratum == plain CA·(N−1)/N
reduction, planted trend-Simpson (within-stratum flat rates make
every t_micro EXACTLY 0 while the pooled CA sees a strong trend),
dose-reversal antisymmetry, degenerate NULLs, raises both engines,
partition invariance, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    cochran_armitage,
    cochran_armitage_stratified,
    cochran_armitage_stratified_sql,
)

M = 1_000_000


def _brute(rows):
    """rows: [(stratum, dose, flag)] — replicate the quantized signed
    terms and the div→√ shape step for step."""
    from collections import defaultdict

    out_tm = out_vm = nn_tot = rr_tot = 0
    kmax = 0
    strata = defaultdict(list)
    for st, d, f in rows:
        strata[st].append((d, f))
    for pairs in strata.values():
        cn = defaultdict(int)
        cr = defaultdict(int)
        for d, f in pairs:
            cn[d] += 1
            cr[d] += f
        n = sum(cn.values())
        r = sum(cr.values())
        swn = sum(d * c for d, c in cn.items())
        swr = sum(d * c for d, c in cr.items())
        swwn = sum(d * d * c for d, c in cn.items())
        tn = n * swr - r * swn
        vn = r * (n - r) * (n * swwn - swn * swn)
        sgn = -1 if tn < 0 else 1
        out_tm += sgn * ((abs(tn) * M) // n)
        if n > 1:
            out_vm += (vn * M) // (n * n * (n - 1))
        nn_tot += n
        rr_tot += r
        kmax = max(kmax, len(cn))
    out = {
        "n_strata": len(strata),
        "k": kmax,
        "n": nn_tot,
        "r": rr_tot,
        "t_micro": str(out_tm),
        "v_micro": str(out_vm),
    }
    if out_vm > 0:
        z = float(out_tm) / math.sqrt(float(out_vm * M))
        out["z"] = z
        out["chi2"] = z * z
    else:
        out["z"] = None
        out["chi2"] = None
    return out


def test_matches_brute(spark):
    rng = random.Random(601)
    rows = []
    for g in range(4):
        for _ in range(700):
            st = rng.randint(0, 3)
            d = rng.randint(0, 4)
            f = 1 if rng.random() < 0.2 + 0.05 * st + 0.06 * d else 0
            rows.append((g, st, d, f))
    df = spark.createDataFrame(rows, "g int, st int, d int, f int")
    got = {
        r["g"]: r.asDict()
        for r in cochran_armitage_stratified(
            df, ["g"], "st", "d", "f"
        ).collect()
    }
    for g in range(4):
        want = _brute([(st, d, f) for gg, st, d, f in rows if gg == g])
        assert {k: got[g][k] for k in want} == want, g


def test_single_stratum_is_ca_times_n_minus_1_over_n(spark):
    """One stratum: the CMH trend χ² equals the plain Cochran–Armitage
    χ² times (N−1)/N — the standard CMH finite-population factor
    (approx: the quantization shapes differ)."""
    rng = random.Random(607)
    rows = [
        (0, 9, rng.randint(0, 3), 1 if rng.random() < 0.2 + 0.07 * 1 else 0)
        for _ in range(900)
    ]
    rows = [(g, st, d, 1 if rng.random() < 0.15 + 0.08 * d else 0)
            for g, st, d, _ in rows]
    df = spark.createDataFrame(rows, "g int, st int, d int, f int")
    strat = cochran_armitage_stratified(df, ["g"], "st", "d", "f").collect()[0]
    plain = cochran_armitage(df, ["g"], "d", "f").collect()[0]
    n = strat["n"]
    assert strat["chi2"] == pytest.approx(
        plain["chi2"] * (n - 1) / n, rel=1e-4
    )


def test_trend_simpson_planted_exact_zero(spark):
    """Within each stratum the flag rate is FLAT across doses with
    exact integer proportions (r = n/2 at every dose level), so every
    TN_s = N·Σdr − R·Σdn = 0 EXACTLY and the stratified z is 0.0 —
    while stratum A (high rate 3/4) is dosed HIGH and stratum B (low
    rate 1/4) dosed LOW, so the pooled plain CA reports a strong
    spurious positive trend."""
    rows = []
    # stratum A: doses 3/4, rate 3/4 at each dose (r=3 of n=4 per cell)
    for d in (3, 4):
        rows += [(0, "A", d, 1)] * 9 + [(0, "A", d, 0)] * 3
    # stratum B: doses 0/1, rate 1/4 at each dose
    for d in (0, 1):
        rows += [(0, "B", d, 1)] * 3 + [(0, "B", d, 0)] * 9
    df = spark.createDataFrame(rows, "g int, st string, d int, f int")
    pooled = cochran_armitage(df, ["g"], "d", "f").collect()[0]
    assert pooled["z"] > 3.0  # the confounded lie
    strat = cochran_armitage_stratified(df, ["g"], "st", "d", "f").collect()[0]
    assert strat["t_micro"] == "0"
    assert strat["z"] == 0.0 and strat["chi2"] == 0.0


def test_dose_reversal_antisymmetry(spark):
    rng = random.Random(613)
    rows = [
        (0, rng.randint(0, 2), rng.randint(0, 3),
         1 if rng.random() < 0.3 else 0)
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "g int, st int, d int, f int")
    fw = cochran_armitage_stratified(df, ["g"], "st", "d", "f").collect()[0]
    rev = df.selectExpr("g", "st", "3 - d AS d", "f")
    bw = cochran_armitage_stratified(rev, ["g"], "st", "d", "f").collect()[0]
    # dose -> a - d negates every TN_s exactly; |TN| quantizes the
    # same, so t_micro and z flip EXACTLY
    assert int(bw["t_micro"]) == -int(fw["t_micro"])
    assert bw["z"] == -fw["z"]
    assert bw["v_micro"] == fw["v_micro"]


def test_degenerate_nulls_and_raises(spark):
    rows = [(0, s, 2, 1) for s in range(3) for _ in range(4)]  # R = N
    df = spark.createDataFrame(rows, "g int, st int, d int, f int")
    r = cochran_armitage_stratified(df, ["g"], "st", "d", "f").collect()[0]
    assert r["z"] is None and r["v_micro"] == "0"
    with pytest.raises(ValueError, match="must be integral"):
        cochran_armitage_stratified(
            spark.createDataFrame([(0, 0, 1.5, 1)], "g int, st int, d double, f int"),
            ["g"], "st", "d", "f",
        )
    with pytest.raises(Exception, match="0/1 or boolean"):
        cochran_armitage_stratified(
            spark.createDataFrame([(0, 0, 1, 7)], "g int, st int, d int, f int"),
            ["g"], "st", "d", "f",
        ).collect()
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "__cas_bad", pd.DataFrame([(0, 0, 1, 7)], columns=["g", "st", "d", "f"])
    )
    with pytest.raises(Exception, match="0/1 or boolean"):
        con.sql(
            cochran_armitage_stratified_sql("__cas_bad", "g", "st", "d", "f")
        ).df()


def test_partition_invariance(spark):
    rng = random.Random(617)
    rows = [
        (0, rng.randint(0, 4), rng.randint(0, 4),
         1 if rng.random() < 0.35 else 0)
        for _ in range(1000)
    ]
    df = spark.createDataFrame(rows, "g int, st int, d int, f int")
    one = cochran_armitage_stratified(df, ["g"], "st", "d", "f").collect()[0]
    two = cochran_armitage_stratified(
        df.repartition(13, "d"), ["g"], "st", "d", "f"
    ).collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(619)
    rows = [
        (rng.randint(0, 4), rng.randint(0, 3), rng.randint(0, 4),
         1 if rng.random() < 0.2 + 0.05 * rng.random() else 0)
        for _ in range(5000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "st", "d", "f"])
    p = str(tmp_path / "cas.parquet")
    pdf.to_parquet(p)
    got = (
        cochran_armitage_stratified(
            spark.read.parquet(p), ["g"], "st", "d", "f"
        )
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        cochran_armitage_stratified_sql("__t", "g", "st", "d", "f")
        + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

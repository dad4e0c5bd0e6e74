"""van Elteren stratified Mann–Whitney (operators/stats.
mannwhitney_stratified): brute parity (the brute sign-splits because PYTHON's // floors
while both engines truncate — the operator itself divides plainly), single-stratum == plain MWU z reduction,
planted rank-Simpson (proportional-copy cohorts give U₂ == n1·n2
identically → stratified z == 0.0 exactly while the pooled MWU
lies), cohort-swap antisymmetry, empty-cohort strata contribute
zero, degenerate NULLs, partition invariance, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    grouped_mannwhitney,
    mannwhitney_stratified,
    mannwhitney_stratified_sql,
)

M = 1_000_000


def _brute(rows):
    """rows: [(stratum, value, cohort1?)] — replicate the operator's
    signed quantized terms step for step."""
    from collections import defaultdict

    strata = defaultdict(list)
    for st, v, c in rows:
        strata[st].append((v, c))
    tm = vm = n1t = n2t = 0
    for pairs in strata.values():
        ones = sorted(v for v, c in pairs if c)
        twos = sorted(v for v, c in pairs if not c)
        n1, n2 = len(ones), len(twos)
        n1t += n1
        n2t += n2
        if n1 == 0 or n2 == 0:
            continue
        gt = sum(1 for a in ones for b in twos if a > b)
        ties = sum(1 for a in ones for b in twos if a == b)
        from collections import Counter

        tt = sum(c**3 - c for c in Counter(v for v, _ in pairs).values())
        n = n1 + n2
        u2 = 2 * gt + ties
        tnum = u2 - n1 * n2
        sgn = -1 if tnum < 0 else 1
        tm += sgn * ((abs(tnum) * M) // (2 * (n + 1)))
        if n >= 2:
            vm += (n1 * n2 * (n**3 - n - tt) * M) // (
                12 * n * (n - 1) * (n + 1) * (n + 1)
            )
    out = {
        "n_strata": len(strata),
        "n1": n1t,
        "n2": n2t,
        "t_micro": str(tm),
        "v_micro": str(vm),
    }
    if vm > 0:
        z = float(tm) / math.sqrt(float(vm * M))
        out["z"] = z
        out["chi2"] = z * z
    else:
        out["z"] = None
        out["chi2"] = None
    return out


def test_matches_brute(spark):
    rng = random.Random(631)
    rows = []
    for g in range(4):
        for _ in range(500):
            st = rng.randint(0, 3)
            c = rng.random() < 0.5
            v = rng.randint(0, 15) + (2 if c else 0) + st
            rows.append((g, st, v, c))
    df = spark.createDataFrame(rows, "g int, st int, v int, c boolean")
    got = {
        r["g"]: r.asDict()
        for r in mannwhitney_stratified(df, ["g"], "st", "v", "c").collect()
    }
    for g in range(4):
        want = _brute([(st, v, c) for gg, st, v, c in rows if gg == g])
        assert {k: got[g][k] for k in want} == want, g


def test_single_stratum_is_plain_mwu(spark):
    """One stratum: the 1/(N+1) weight cancels and z reduces to the
    plain tie-corrected Mann–Whitney z (approx — quantization)."""
    rng = random.Random(641)
    rows = [
        (0, 7, rng.randint(0, 12) + (3 if rng.random() < 0.5 else 0),
         rng.random() < 0.5)
        for _ in range(600)
    ]
    rows = [(g, st, v + (2 if c else 0), c) for g, st, v, c in rows]
    df = spark.createDataFrame(rows, "g int, st int, v int, c boolean")
    ve = mannwhitney_stratified(df, ["g"], "st", "v", "c").collect()[0]
    mw = grouped_mannwhitney(df, ["g"], "v", "c").collect()[0]
    assert ve["z"] == pytest.approx(mw["z"], rel=1e-4)


def test_rank_simpson_planted_exact_zero(spark):
    """Within each stratum both cohorts are PROPORTIONAL COPIES of
    one value multiset (k vs m copies), so U₂ = km(2G + T) = km·p² =
    n1·n2 IDENTICALLY → every t_micro is 0 and the stratified z is
    0.0 exactly — while cohort TRUE concentrates in the high-valued
    stratum, so the pooled MWU reports a large spurious z."""
    low = [1, 2, 3, 4]
    high = [11, 12, 13, 14]
    rows = []
    # stratum A (high values): 4 TRUE copies, 1 FALSE copy
    for _ in range(4):
        rows += [(0, "A", v, True) for v in high]
    rows += [(0, "A", v, False) for v in high]
    # stratum B (low values): 1 TRUE copy, 4 FALSE copies
    rows += [(0, "B", v, True) for v in low]
    for _ in range(4):
        rows += [(0, "B", v, False) for v in low]
    df = spark.createDataFrame(rows, "g int, st string, v int, c boolean")
    pooled = grouped_mannwhitney(df, ["g"], "v", "c").collect()[0]
    assert pooled["z"] > 2.0  # the confounded lie
    ve = mannwhitney_stratified(df, ["g"], "st", "v", "c").collect()[0]
    assert ve["t_micro"] == "0"
    assert ve["z"] == 0.0 and ve["chi2"] == 0.0


def test_cohort_swap_antisymmetry(spark):
    rng = random.Random(643)
    rows = [
        (0, rng.randint(0, 2), rng.randint(0, 9), rng.random() < 0.5)
        for _ in range(700)
    ]
    df = spark.createDataFrame(rows, "g int, st int, v int, c boolean")
    fw = mannwhitney_stratified(df, ["g"], "st", "v", "c").collect()[0]
    bw = mannwhitney_stratified(
        df.selectExpr("g", "st", "v", "NOT c AS c"), ["g"], "st", "v", "c"
    ).collect()[0]
    # swapping cohorts maps U₂ → 2n1n2 − U₂, negating tnum exactly
    assert int(bw["t_micro"]) == -int(fw["t_micro"])
    assert bw["z"] == -fw["z"]
    assert bw["v_micro"] == fw["v_micro"]


def test_empty_cohort_strata_contribute_zero(spark):
    rows = (
        [(0, "A", v, v % 2 == 0) for v in range(12)]
        + [(0, "B", v, True) for v in range(6)]   # FALSE cohort empty
    )
    df = spark.createDataFrame(rows, "g int, st string, v int, c boolean")
    both = mannwhitney_stratified(df, ["g"], "st", "v", "c").collect()[0]
    only_a = mannwhitney_stratified(
        df.where("st = 'A'"), ["g"], "st", "v", "c"
    ).collect()[0]
    assert both["t_micro"] == only_a["t_micro"]
    assert both["v_micro"] == only_a["v_micro"]
    assert both["z"] == only_a["z"]
    assert both["n_strata"] == 2 and only_a["n_strata"] == 1


def test_all_degenerate_null(spark):
    rows = [(0, s, 5, s % 2 == 0) for s in range(4)]  # 1-row strata
    df = spark.createDataFrame(rows, "g int, st int, v int, c boolean")
    r = mannwhitney_stratified(df, ["g"], "st", "v", "c").collect()[0]
    assert r["z"] is None and r["v_micro"] == "0"


def test_partition_invariance(spark):
    rng = random.Random(647)
    rows = [
        (0, rng.randint(0, 4), rng.randint(0, 20), rng.random() < 0.4)
        for _ in range(900)
    ]
    df = spark.createDataFrame(rows, "g int, st int, v int, c boolean")
    one = mannwhitney_stratified(df, ["g"], "st", "v", "c").collect()[0]
    two = mannwhitney_stratified(
        df.repartition(13, "v"), ["g"], "st", "v", "c"
    ).collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(653)
    rows = [
        (rng.randint(0, 4), rng.randint(0, 3), rng.randint(0, 12),
         rng.random() < 0.45)
        for _ in range(5000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "st", "v", "c"])
    p = str(tmp_path / "ve.parquet")
    pdf.to_parquet(p)
    got = (
        mannwhitney_stratified(
            spark.read.parquet(p), ["g"], "st", "v", "c"
        )
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        mannwhitney_stratified_sql("__t", "g", "st", "v", "c")
        + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_nonbinary_cohort_raises_in_plan(spark):
    """A {1,2}-coded arm index would give negative c2 counts and a
    plausible-but-wrong z — the stratified-family convention raises
    in-plan instead (review catch)."""
    df = spark.createDataFrame(
        [(0, 0, 5, 2), (0, 0, 6, 1)], "g int, st int, v int, c int"
    )
    with pytest.raises(Exception, match="0/1 or boolean"):
        mannwhitney_stratified(df, ["g"], "st", "v", "c").collect()
    ok = spark.createDataFrame(
        [(0, 0, 5, 1), (0, 0, 6, 0), (0, 0, 7, 1)],
        "g int, st int, v int, c int",
    )
    r = mannwhitney_stratified(ok, ["g"], "st", "v", "c").collect()[0]
    assert r["n1"] == 2 and r["n2"] == 1  # 0/1 ints still accepted


def test_null_int_cohort_drops_not_raises(spark):
    """NULL integer cohorts DROP the row (the histogram contract) —
    the 0/1 validation must not fire on them."""
    rows = [(0, 0, 5, 1), (0, 0, 6, 0), (0, 0, 7, None), (0, 0, 8, 1)]
    df = spark.createDataFrame(rows, "g int, st int, v int, c int")
    r = mannwhitney_stratified(df, ["g"], "st", "v", "c").collect()[0]
    assert r["n1"] == 2 and r["n2"] == 1

"""Grouped Mann–Whitney U (operators/stats.grouped_mannwhitney):
brute pair-count parity, Cliff identity U2 == n1·n2 + (gt − lt),
auc == (delta+1)/2, KW two-sample consistency (z² ≈ H_corrected),
all-tied NULL z, partition invariance, DuckDB twin."""

import math
import random

from btl_bloomfilter_spark.operators.stats import (
    grouped_cliffs_delta,
    grouped_kruskal_wallis,
    grouped_mannwhitney,
    grouped_mannwhitney_sql,
)


def _brute(pairs):
    """pairs: [(cohort_bool, value)] -> (n1, n2, T, u2, u, auc, z)."""
    from collections import Counter

    xs = [v for c, v in pairs if c]
    ys = [v for c, v in pairs if not c]
    n1, n2 = len(xs), len(ys)
    gt = sum(1 for x in xs for y in ys if x > y)
    ties = sum(1 for x in xs for y in ys if x == y)
    u2 = 2 * gt + ties
    cnt = Counter(v for _, v in pairs)
    T = sum(t**3 - t for t in cnt.values())
    N = n1 + n2
    v4num = n1 * n2 * (N**3 - N - T)
    z = (
        float(u2 - n1 * n2)
        / math.sqrt(float(v4num) / float(3 * N * (N - 1)))
        if v4num > 0 and N >= 2
        else None
    )
    return (
        n1, n2, T, str(u2), float(u2) / 2.0,
        float(u2) / float(2 * n1 * n2), z,
    )


def test_matches_brute(spark):
    rng = random.Random(3)
    rows = []
    for g in range(3):
        for _ in range(rng.randint(40, 90)):
            c = rng.random() < 0.5
            rows.append((g, c, rng.randint(0, 25) + (3 if c else 0)))
    df = spark.createDataFrame(rows, "g int, c boolean, v long")
    got = {
        r["g"]: (r["n1"], r["n2"], r["ties_t"], r["u2_fp"], r["u"], r["auc"], r["z"])
        for r in grouped_mannwhitney(df, ["g"], "v", "c").collect()
    }
    for g in range(3):
        sub = [(c, v) for gg, c, v in rows if gg == g]
        assert got[g] == _brute(sub), g


def test_cliff_identity_and_auc(spark):
    rng = random.Random(17)
    rows = [(0, rng.random() < 0.4, rng.randint(0, 12)) for _ in range(300)]
    df = spark.createDataFrame(rows, "g int, c boolean, v long")
    mw = grouped_mannwhitney(df, ["g"], "v", "c").collect()[0]
    cd = grouped_cliffs_delta(df, ["g"], "v", "c").collect()[0]
    # U2 = n1*n2 + (gt - lt), exactly on the integers
    assert int(mw["u2_fp"]) == mw["n1"] * mw["n2"] + (
        int(cd["gt_pairs"]) - int(cd["lt_pairs"])
    )
    # auc = (delta + 1) / 2 up to one rounding of each side
    assert abs(mw["auc"] - (cd["delta"] + 1.0) / 2.0) < 1e-15


def test_two_sample_kw_consistency(spark):
    # for k = 2 the tie-corrected KW H equals z² (chi2(1) = N(0,1)²)
    rng = random.Random(21)
    rows = [(0, rng.random() < 0.5, rng.randint(0, 30)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g int, c boolean, v long")
    z = grouped_mannwhitney(df, ["g"], "v", "c").collect()[0]["z"]
    kw = grouped_kruskal_wallis(
        df.withColumn("t", df["c"].cast("int")), ["g"], "t", "v"
    ).collect()[0]["h_corrected"]
    assert abs(z * z - kw) < 1e-3 * max(1.0, kw)


def test_all_tied_and_shift_laws(spark):
    tied = spark.createDataFrame(
        [(0, i % 2 == 0, 5) for i in range(40)], "g int, c boolean, v long"
    )
    r = grouped_mannwhitney(tied, ["g"], "v", "c").collect()[0]
    assert r["z"] is None and r["auc"] == 0.5
    # complete separation: auc == 1.0, z strongly positive
    sep = spark.createDataFrame(
        [(0, True, 100 + i) for i in range(20)]
        + [(0, False, i) for i in range(20)],
        "g int, c boolean, v long",
    )
    r2 = grouped_mannwhitney(sep, ["g"], "v", "c").collect()[0]
    assert r2["auc"] == 1.0 and r2["z"] > 5


def test_double_values_and_null_drops(spark):
    # values compare, never compute: doubles are fine
    rows = [
        (0, True, 1.5), (0, True, 2.25), (0, False, 1.5),
        (0, False, 0.75), (0, None, 9.0), (0, False, None),
        (0, True, float("nan")),
    ]
    df = spark.createDataFrame(rows, "g int, c boolean, v double")
    r = grouped_mannwhitney(df, ["g"], "v", "c").collect()[0]
    assert r["n1"] == 2 and r["n2"] == 2
    want = _brute([(True, 1.5), (True, 2.25), (False, 1.5), (False, 0.75)])
    assert (r["n1"], r["n2"], r["ties_t"], r["u2_fp"], r["u"], r["auc"], r["z"]) == want


def test_partition_invariance(spark):
    rng = random.Random(31)
    rows = [(0, rng.random() < 0.5, rng.randint(0, 9)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g int, c boolean, v long")
    one = grouped_mannwhitney(df, ["g"], "v", "c").collect()[0]
    two = grouped_mannwhitney(df.repartition(13, "v"), ["g"], "v", "c").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(37)
    rows = [
        (rng.randint(0, 3), rng.random() < 0.5, rng.randint(0, 50))
        for _ in range(2000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "c", "v"])
    p = str(tmp_path / "mw.parquet")
    pdf.to_parquet(p)
    got = (
        grouped_mannwhitney(spark.read.parquet(p), ["g"], "v", "c")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(grouped_mannwhitney_sql("__t", "g", "v", "c") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

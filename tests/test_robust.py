"""Exact grouped lower-median/MAD: hand-checked semantics (odd/even
counts, NULL drop, degenerate MAD=0), brute-force parity on random
data, DuckDB-twin parity (same explicit construction, never builtin
median), outlier-rule parity, and the broadcast plan shape."""

import random

import pytest

from btl_bloomfilter_spark.operators.robust import (
    grouped_median_mad,
    grouped_median_mad_sql,
    robust_outliers,
)


def _lower_median(xs):
    s = sorted(xs)
    return s[(len(s) + 1) // 2 - 1]


def _brute(rows):
    """rows: (g, v) with v possibly None -> {g: (n, med, mad)}"""
    by_g = {}
    for g, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append(v)
    return {
        g: (
            len(vs),
            _lower_median(vs),
            _lower_median([abs(v - _lower_median(vs)) for v in vs]),
        )
        for g, vs in by_g.items()
    }


@pytest.mark.spark
def test_hand_cases(spark):
    rows = [
        ("odd", 1), ("odd", 3), ("odd", 100),          # med 3, devs {2,0,97} -> mad 2
        ("even", 1), ("even", 2), ("even", 3), ("even", 4),  # lower med 2, devs {1,0,1,2} -> mad 1
        ("null", 7), ("null", None), ("null", 9),      # NULL dropped -> n 2, med 7, mad 0
        ("deg", 5), ("deg", 5), ("deg", 5), ("deg", 50),  # med 5, mad 0
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: (r.n, r.med, r.mad) for r in grouped_median_mad(df, ["g"], "v").collect()}
    assert got == {
        "odd": (3, 3, 2),
        "even": (4, 2, 1),
        "null": (2, 7, 0),
        "deg": (4, 5, 0),
    }
    # degenerate mad=0: ANY deviation is an outlier
    out = robust_outliers(df, ["g"], "v").collect()
    assert {(r.g, r.v) for r in out} >= {("deg", 50), ("null", 9)}
    assert all(r.v != r.med or r.mad > 0 for r in out)


@pytest.mark.spark
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_brute_force_parity(spark, seed):
    rng = random.Random(seed)
    rows = [
        (f"g{rng.randrange(4)}", rng.choice([None] + list(range(-50, 51))))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: (r.n, r.med, r.mad) for r in grouped_median_mad(df, ["g"], "v").collect()}
    assert got == _brute(rows)
    # outlier rule parity
    k = 4448
    want = {
        (g, v) for g, v in rows
        if v is not None and abs(v - got[g][1]) * 1000 > k * got[g][2]
    }
    have = [(r.g, r.v) for r in robust_outliers(df, ["g"], "v", k_milli=k).collect()]
    assert sorted(have) == sorted(want)  # multiset: duplicates flagged per-row


@pytest.mark.spark
def test_duckdb_twin_parity(spark):
    import duckdb

    rng = random.Random(7)
    rows = [(f"g{rng.randrange(3)}", rng.randrange(-1000, 1000)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = sorted(
        (r.g, r.n, r.med, r.mad) for r in grouped_median_mad(df, ["g"], "v").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g TEXT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = grouped_median_mad_sql("t", "g", "v")
    want = sorted(tuple(r) for r in con.execute(f"SELECT * FROM {sql} s").fetchall())
    assert got == want


def _brute_q(vals, q_milli):
    s = sorted(vals)
    rank = (q_milli * len(s) + 999) // 1000
    return s[rank - 1]


@pytest.mark.spark
def test_grouped_quantiles_hand_and_median_coherence(spark):
    from btl_bloomfilter_spark.operators.robust import grouped_quantiles

    rows = [("a", v) for v in [10, 20, 30, 40]] + [("b", v) for v in [5, 5, 7]]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r.g, r.q_milli): (r.n, r.value)
        for r in grouped_quantiles(df, ["g"], "v", q_millis=[1, 250, 500, 750, 1000]).collect()
    }
    # a (n=4): ranks ceil(q*4) -> 1,1,2,3,4 ; b (n=3): 1,1,2,3,3
    assert got == {
        ("a", 1): (4, 10), ("a", 250): (4, 10), ("a", 500): (4, 20),
        ("a", 750): (4, 30), ("a", 1000): (4, 40),
        ("b", 1): (3, 5), ("b", 250): (3, 5), ("b", 500): (3, 5),
        ("b", 750): (3, 7), ("b", 1000): (3, 7),
    }
    # q=500 IS grouped_median_mad's med
    med = {r.g: r.med for r in grouped_median_mad(df, ["g"], "v").collect()}
    assert med == {g: got[(g, 500)][1] for g in ("a", "b")}
    with pytest.raises(ValueError):
        grouped_quantiles(df, ["g"], "v", q_millis=[0])
    with pytest.raises(ValueError):
        grouped_quantiles(df, ["g"], "v", q_millis=[1001])


@pytest.mark.spark
@pytest.mark.parametrize("seed", [4, 5])
def test_grouped_quantiles_brute_and_twin(spark, seed):
    import duckdb

    from btl_bloomfilter_spark.operators.robust import (
        grouped_quantiles,
        grouped_quantiles_sql,
    )

    rng = random.Random(seed)
    rows = [(f"g{rng.randrange(3)}", rng.randrange(-100, 100)) for _ in range(300)]
    qs = [10, 333, 500, 900, 990]
    df = spark.createDataFrame(rows, "g string, v long")
    got = sorted(
        (r.g, r.q_milli, r.n, r.value)
        for r in grouped_quantiles(df, ["g"], "v", q_millis=qs).collect()
    )
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    want = sorted(
        (g, q, len(vs), _brute_q(vs, q)) for g, vs in by_g.items() for q in qs
    )
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g TEXT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = grouped_quantiles_sql("t", "g", "v", q_millis=qs)
    duck = sorted(tuple(r) for r in con.execute(f"SELECT * FROM {sql} s").fetchall())
    assert got == duck


@pytest.mark.spark
def test_outlier_plan_broadcasts_stats(spark):
    df = spark.createDataFrame([("a", i) for i in range(100)], "g string, v long")
    plan = (
        robust_outliers(df, ["g"], "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan.split(
        "BroadcastHashJoin"
    )[0]


def test_trimmed_mean_matches_brute(spark):
    import random

    from btl_bloomfilter_spark.operators.robust import (
        grouped_trimmed_mean,
        grouped_trimmed_mean_sql,
    )

    rng = random.Random(166)

    def brute(vals, tm):
        s = sorted(vals)
        n = len(s)
        k = n * tm // 1000
        core = s[k : n - k]
        lo, hi = s[k], s[n - k - 1]
        trimmed = float(sum(core)) / float(n - 2 * k)
        winsor = float(sum(core) + k * lo + k * hi) / float(n)
        return n, k, lo, hi, trimmed, winsor

    rows, truth = [], {}
    for g in range(6):
        vals = [rng.randrange(-50, 1000) for _ in range(rng.randrange(3, 200))]
        # heavy ties on purpose
        vals += [7] * rng.randrange(0, 30)
        rows += [(str(g), v) for v in vals]
        truth[str(g)] = brute(vals, 100)
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: r for r in grouped_trimmed_mean(df, ["g"], "v", trim_milli=100).collect()
    }
    for g, (n, k, lo, hi, tr, wi) in truth.items():
        r = got[g]
        assert (r.n, r.k, r.lo_clamp, r.hi_clamp) == (n, k, lo, hi)
        assert r.trimmed_mean == tr and r.winsor_mean == wi
    # trim 0 degenerates to the exact mean
    r0 = {
        r.g: r for r in grouped_trimmed_mean(df, ["g"], "v", trim_milli=0).collect()
    }
    for g in truth:
        vals = [v for gg, v in rows if gg == g]
        mean = float(sum(vals)) / float(len(vals))
        assert r0[g].trimmed_mean == mean and r0[g].winsor_mean == mean
    # robustness: one absurd outlier barely moves the trimmed mean
    clean = [float(i % 10) for i in range(100)]
    df2 = spark.createDataFrame(
        [("c", int(v)) for v in clean] + [("c", 10**9)], "g string, v long"
    )
    r = grouped_trimmed_mean(df2, ["g"], "v", trim_milli=50).collect()[0]
    assert abs(r.trimmed_mean - 4.5) < 0.5
    assert r.hi_clamp <= 9

    import pytest

    with pytest.raises(ValueError):
        grouped_trimmed_mean(df, ["g"], "v", trim_milli=500)
    with pytest.raises(ValueError):
        grouped_trimmed_mean_sql("t", "g", "v", trim_milli=-1)


def test_trimmed_mean_duckdb_twin(spark, tmp_path):
    import random

    import duckdb
    import pandas as pd

    from btl_bloomfilter_spark.operators.robust import (
        grouped_trimmed_mean,
        grouped_trimmed_mean_sql,
    )

    rng = random.Random(3)
    pdf = pd.DataFrame(
        {
            "g": [f"g{i % 5}" for i in range(400)],
            "v": [rng.randrange(-100, 10000) for _ in range(400)],
        }
    )
    p = str(tmp_path / "tm.parquet")
    pdf.to_parquet(p)
    got = (
        grouped_trimmed_mean(spark.read.parquet(p), ["g"], "v", trim_milli=50)
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        grouped_trimmed_mean_sql("t", "g", "v", trim_milli=50) + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

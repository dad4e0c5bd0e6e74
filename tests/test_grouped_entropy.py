"""Grouped Shannon entropy (operators/stats.grouped_entropy):
brute fixed-point parity, all-singletons norm_entropy == 1.0 exactly,
single-category zero / NULL-evenness laws, NULL-category drops,
partition invariance, DuckDB twin."""

import collections
import math
import random

from btl_bloomfilter_spark.operators.stats import (
    grouped_entropy,
    grouped_entropy_sql,
)


def _lnm(x):
    # round-half-away on a positive arg == the engines' HALF_UP
    return int(math.floor(math.log(x) * 1e6 + 0.5))


def _brute(cats):
    """cats: list of non-NULL category values.  Mirrors the engines'
    fixed-point identity exactly."""
    c = collections.Counter(cats)
    n = len(cats)
    k = len(c)
    s = sum(v * _lnm(v) for v in c.values())
    h = max(_lnm(n) - s // n, 0)
    norm = h / float(_lnm(k)) if k > 1 else None
    return (n, k, h, h / 1e6, norm)


def test_matches_brute(spark):
    rng = random.Random(7)
    rows = []
    for g in range(4):
        for _ in range(rng.randint(25, 140)):
            # skew varies with g: g=0 near-uniform, g=3 heavily peaked
            z = rng.random() ** (1 + g)
            rows.append((g, "cat%d" % int(z * 8)))
    df = spark.createDataFrame(rows, "g int, c string")
    got = {
        r["g"]: (r["n"], r["k"], r["entropy_micro_nats"], r["entropy"],
                 r["norm_entropy"])
        for r in grouped_entropy(df, ["g"], "c").collect()
    }
    for g in range(4):
        want = _brute([c for gg, c in rows if gg == g])
        assert got[g] == want, (g, got[g], want)
        # quantized H within 2e-6 nats of the float truth
        cnt = collections.Counter(c for gg, c in rows if gg == g)
        n = sum(cnt.values())
        truth = math.log(n) - sum(v * math.log(v) for v in cnt.values()) / n
        assert abs(got[g][3] - truth) < 2e-6


def test_all_singletons_norm_exactly_one(spark):
    # every count 1: ln_micro(1) == 0, so H_micro == ln_micro(k)
    # EXACTLY and evenness is exactly 1.0 — no tolerance needed
    rows = [(0, "c%d" % i) for i in range(17)]
    df = spark.createDataFrame(rows, "g int, c string")
    r = grouped_entropy(df, ["g"], "c").collect()[0]
    assert r["norm_entropy"] == 1.0
    assert r["entropy_micro_nats"] == _lnm(17)


def test_single_category_and_nulls(spark):
    rows = [(0, "only")] * 9 + [(0, None)] * 3
    df = spark.createDataFrame(rows, "g int, c string")
    r = grouped_entropy(df, ["g"], "c").collect()[0]
    assert r["n"] == 9 and r["k"] == 1
    assert r["entropy_micro_nats"] == 0 and r["entropy"] == 0.0
    assert r["norm_entropy"] is None
    # all-NULL group vanishes
    df2 = spark.createDataFrame([(1, None)], "g int, c string")
    assert grouped_entropy(df2, ["g"], "c").count() == 0


def test_partition_invariance(spark):
    rng = random.Random(11)
    rows = [(0, rng.choice("abcdefg")) for _ in range(400)]
    df = spark.createDataFrame(rows, "g int, c string")
    one = grouped_entropy(df, ["g"], "c").collect()[0]
    two = grouped_entropy(df.repartition(17, "c"), ["g"], "c").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(5)
    rows = []
    for g in range(5):
        for _ in range(rng.randint(30, 200)):
            rows.append((g, rng.choice("stuvwxyz"[: 2 + g])))
    pdf = pd.DataFrame(rows, columns=["g", "c"])
    p = str(tmp_path / "ent.parquet")
    pdf.to_parquet(p)
    got = grouped_entropy(spark.read.parquet(p), ["g"], "c").orderBy("g").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(grouped_entropy_sql("__t", "g", "c") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

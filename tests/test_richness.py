"""Richness/coverage estimators (operators/growth.richness_estimate):
brute parity, all-singletons / saturated-corpus endpoint laws, Chao1
lower-bound + recovery-of-true-richness sanity, NULL drops, partition
invariance, DuckDB twin."""

import collections
import random

from btl_bloomfilter_spark.operators.growth import (
    richness_estimate,
    richness_estimate_sql,
)


def _brute(items):
    c = collections.Counter(items)
    n = len(items)
    k = len(c)
    f1 = sum(1 for v in c.values() if v == 1)
    f2 = sum(1 for v in c.values() if v == 2)
    chao1 = (
        k + (f1 * f1) / (2.0 * f2) if f2 > 0 else float(k + (f1 * (f1 - 1)) // 2)
    )
    return (n, k, f1, f2, 1.0 - f1 / float(n), f1 / float(n), chao1)


def _row(r):
    return (r["n"], r["k"], r["f1"], r["f2"], r["coverage"], r["p0_unseen"],
            r["chao1"])


def test_matches_brute(spark):
    rng = random.Random(14)
    rows = []
    for g in range(4):
        for _ in range(rng.randint(40, 200)):
            # zipf-ish: many singletons, few hot items
            rows.append((g, "i%d" % int(1.0 / max(rng.random(), 1e-9)) ))
    df = spark.createDataFrame(rows, "g int, i string")
    got = {r["g"]: _row(r) for r in richness_estimate(df, ["g"], "i").collect()}
    for g in range(4):
        assert got[g] == _brute([i for gg, i in rows if gg == g]), g


def test_endpoint_laws(spark):
    # all singletons: p0 == 1.0, coverage == 0.0, f2 == 0 integer branch
    singles = spark.createDataFrame([(0, "s%d" % i) for i in range(9)], "g int, i string")
    r = richness_estimate(singles, ["g"], "i").collect()[0]
    assert r["p0_unseen"] == 1.0 and r["coverage"] == 0.0
    assert r["chao1"] == float(9 + 9 * 8 // 2)
    # saturated corpus (every item seen >= 3 times): chao1 == k exactly,
    # coverage == 1.0
    sat = spark.createDataFrame(
        [(0, c) for c in "aaabbbccc"], "g int, i string"
    )
    r2 = richness_estimate(sat, ["g"], "i").collect()[0]
    assert r2["chao1"] == 3.0 and r2["coverage"] == 1.0 and r2["p0_unseen"] == 0.0


def test_chao1_recovers_subsampled_richness(spark):
    # sample 400 draws from a 120-item uniform universe: Chao1 must be
    # a lower bound on observed k... >= k, and land well above k,
    # toward 120 (sanity, not a sharp gate)
    rng = random.Random(99)
    rows = [(0, "u%d" % rng.randint(0, 119)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g int, i string")
    r = richness_estimate(df, ["g"], "i").collect()[0]
    assert r["chao1"] >= r["k"]
    assert r["chao1"] > r["k"] + 1  # unseen tail detected
    assert abs(r["chao1"] - 120) < 25


def test_nulls_and_partition_invariance(spark):
    rng = random.Random(8)
    rows = [(0, rng.choice("abcdefgh")) for _ in range(300)]
    df = spark.createDataFrame(rows + [(0, None)] * 5, "g int, i string")
    one = richness_estimate(df, ["g"], "i").collect()[0]
    assert one["n"] == 300
    two = richness_estimate(df.repartition(13, "i"), ["g"], "i").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(25)
    rows = [
        (rng.randint(0, 4), "t%d" % int(1.0 / max(rng.random(), 1e-9)))
        for _ in range(2000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "i"])
    p = str(tmp_path / "rich.parquet")
    pdf.to_parquet(p)
    got = richness_estimate(spark.read.parquet(p), ["g"], "i").orderBy("g").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(richness_estimate_sql("__t", "g", "i") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

"""Skew report (plans/joins.skew_report): brute parity on a zipf
key, salt-hint arithmetic laws, NULL-key participation + NULLS-LAST
tie order, deterministic count ties, counts= reuse path, plan shape
(TakeOrderedAndProject, no global sort), DuckDB twin, contracts."""

import collections
import random

import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.plans.joins import skew_report, skew_report_sql


def _brute(keys, top, par):
    cnt = collections.Counter(keys)
    n = len(keys)
    items = sorted(
        cnt.items(), key=lambda kv: (-kv[1], (kv[0] is None, kv[0]))
    )[:top]
    out, cum = [], 0
    for i, (k, c) in enumerate(items, 1):
        cum += c
        out.append(
            (i, k, c, c / float(n), cum / float(n), (c * par + n - 1) // n)
        )
    return out


def test_matches_brute_zipf(spark):
    rng = random.Random(3)
    keys = [int(1.0 / max(rng.random(), 1e-9)) % 50 for _ in range(3000)]
    df = spark.createDataFrame([(k,) for k in keys], "k int")
    got = [
        (r["rank"], r["k"], r["cnt"], r["share"], r["cum_share"], r["salt_hint"])
        for r in skew_report(df, ["k"], top=10, parallelism=32)
        .orderBy("rank")
        .collect()
    ]
    assert got == _brute(keys, 10, 32)


def test_salt_hint_laws(spark):
    # one key with half the rows at parallelism 8 -> hint ceil(8/2)=4;
    # uniform keys -> hint 1
    rows = [("hot",)] * 50 + [("k%d" % i,) for i in range(50)]
    df = spark.createDataFrame(rows, "k string")
    r = {x["k"]: x for x in skew_report(df, ["k"], top=100, parallelism=8).collect()}
    assert r["hot"]["salt_hint"] == 4 and r["hot"]["rank"] == 1
    assert all(v["salt_hint"] == 1 for k, v in r.items() if k != "hot")
    # a key holding ALL rows -> hint == parallelism exactly
    one = spark.createDataFrame([("x",)] * 9, "k string")
    assert skew_report(one, ["k"], parallelism=16).collect()[0]["salt_hint"] == 16


def test_null_keys_and_ties(spark):
    rows = [(None,)] * 5 + [("a",)] * 5 + [("b",)] * 3
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, ["k"], top=3, parallelism=4).orderBy("rank").collect()
    # tie at 5: 'a' before NULL (nulls last), then 'b'
    assert [r["k"] for r in got] == ["a", None, "b"]
    assert got[1]["cnt"] == 5 and got[2]["cum_share"] == 1.0


def test_counts_reuse_path(spark):
    rows = [("a", 1)] * 4 + [("b", 2)] * 2
    df = spark.createDataFrame(rows, "k string, v int")
    pre = df.groupBy("k").count()
    a = skew_report(df, ["k"], parallelism=4).orderBy("rank").collect()
    b = skew_report(df, ["k"], parallelism=4, counts=pre).orderBy("rank").collect()
    assert a == b


def test_plan_take_ordered_not_global_sort(spark):
    df = spark.range(1000).select((F.col("id") % 37).alias("k"))
    plan = skew_report(df, ["k"], top=5, parallelism=8)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(13)
    rows = [
        (int(1.0 / max(rng.random(), 1e-9)) % 40, rng.choice("xyz"))
        for _ in range(2500)
    ]
    pdf = pd.DataFrame(rows, columns=["uid", "src"])
    p = str(tmp_path / "skew.parquet")
    pdf.to_parquet(p)
    got = (
        skew_report(spark.read.parquet(p), ["uid", "src"], top=15, parallelism=32)
        .orderBy("rank")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        skew_report_sql("__t", ["uid", "src"], top=15, parallelism=32)
        + " ORDER BY rank"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        skew_report(df, ["k"], top=0, parallelism=4)
    with pytest.raises(ValueError):
        skew_report(df, ["k"], parallelism=0)
    with pytest.raises(ValueError):
        skew_report_sql("t", ["k"], top=-1, parallelism=4)

"""Salted skew join: provable equality with the plain join, salt in
the shuffle key, deterministic under retry-style recomputation."""

import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.plans.joins import salted_join


@pytest.fixture(scope="module")
def skew_tables(spark):
    # one hot key (0) with 2000 rows, a long tail, and NULL keys
    rows = [(0, i) for i in range(2000)] + [(k, k * 10) for k in range(1, 50)]
    rows += [(None, -1), (None, -2), (999, -3)]  # 999 unmatched in dim
    big = spark.createDataFrame(rows, "k int, payload long")
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(50)] + [(None, "nullname")], "k int, name string"
    )
    return big, dim


def _rows(df):
    import collections

    return collections.Counter(tuple(r) for r in df.collect())


@pytest.mark.spark
@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_equals_plain(spark, skew_tables, how):
    big, dim = skew_tables
    got = salted_join(big, dim, ["k"], salt=8, how=how)
    want = big.join(dim, ["k"], how)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)
    # NULL keys behave like the plain join: inner drops, left keeps
    n_null = sum(1 for r in got.collect() if r.k is None)
    assert n_null == (0 if how == "inner" else 2)


@pytest.mark.spark
def test_salt_reaches_the_shuffle_key(spark, skew_tables):
    big, dim = skew_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(big, dim, ["k"], salt=8)
        out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan  # the join/exchange keys carry the salt
        assert "__salt" not in out.columns  # but the result does not
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.mark.spark
def test_salt_is_deterministic_content_hash(spark, skew_tables):
    # same input re-planned twice -> identical salted assignment (the
    # retry-safety argument: xxhash64 of row content, not rand())
    big, dim = skew_tables
    s1 = _rows(salted_join(big, dim, ["k"], salt=4))
    s2 = _rows(salted_join(big.repartition(7), dim, ["k"], salt=4))
    assert s1 == s2


def test_salted_join_invalid_args(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], salt=1)
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], salt=4, how="full")
    with pytest.raises(ValueError):
        salted_join(df, df, [], salt=4)
    bad = df.withColumn("__salt", F.lit(1))
    with pytest.raises(ValueError):
        salted_join(bad, df, ["k"], salt=4)

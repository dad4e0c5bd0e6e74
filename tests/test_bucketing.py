"""Bucketed tables: exchange-free co-located joins and aggregations.

The claim that pays at 100 TB — a join of two tables bucketed on the
same key/count carries NO Exchange on either side — is pinned on the
EXECUTED plan, not assumed."""

import tempfile

import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.sources.bucketing import read_bucketed, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _executed(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.spark
def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    tmp = tempfile.mkdtemp(prefix="bkt_")
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("va")
    )
    b = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("vb")
    )
    write_bucketed(a, "bkt_a", f"{tmp}/a", "k", 8)
    write_bucketed(b, "bkt_b", f"{tmp}/b", "k", 8)
    ta, tb = read_bucketed(spark, "bkt_a"), read_bucketed(spark, "bkt_b")

    joined = ta.join(tb, "k").select("k", "va", "vb")
    plan = _executed(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # values equal the plain (shuffled) join
    plain = a.join(b, "k").select("k", "va", "vb")
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))

    # groupBy on the bucket key: partial + final agg collapse onto the
    # bucketed scan, no exchange
    agg = ta.groupBy("k").agg(F.sum("va").alias("s"))
    assert "Exchange" not in _executed(agg)


@pytest.mark.spark
def test_validation(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        write_bucketed(df, "t", "/tmp/x", [], 4)
    with pytest.raises(ValueError):
        write_bucketed(df, "t", "/tmp/x", "nope", 4)
    with pytest.raises(ValueError):
        write_bucketed(df, "t", "/tmp/x", "k", 0)

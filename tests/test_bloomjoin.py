"""Bloom semi-join: exactness vs plain semi-join, pre-filter
selectivity, filter reuse, plan shape (pre-filter below the join
exchange)."""
import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.bloomjoin import bloom_semi_join, build_key_filter

SF = "/root/testdata/sf0.01"


@pytest.mark.spark
def test_bloom_semi_join_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").where(F.col("o_totalprice") > 150000)

    got = bloom_semi_join(li, "l_orderkey", orders, "o_orderkey", fpr=0.01)
    want = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_semi")
    assert got.count() == want.count()
    assert (
        got.select("l_orderkey", "l_linenumber")
        .exceptAll(want.select("l_orderkey", "l_linenumber"))
        .count()
        == 0
    )
    assert want.count() > 0  # non-degenerate


@pytest.mark.spark
def test_bloom_semi_join_inexact_bounded_and_reuse(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").where(F.col("o_totalprice") > 150000)

    bf = build_key_filter(orders, "o_orderkey", fpr=0.01)
    exact_n = bloom_semi_join(li, "l_orderkey", orders, "o_orderkey", bloom=bf).count()
    pre_n = bloom_semi_join(
        li, "l_orderkey", orders, "o_orderkey", bloom=bf, exact=False
    ).count()
    total = li.count()
    # no false negatives; FP excess bounded well under 5x the design fpr
    assert exact_n <= pre_n <= exact_n + max(20, int(total * 0.05))

    # reuse: .bf round-trip produces the identical pre-filter
    import tempfile, os

    from btl_bloomfilter_spark.sources import bfio

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "keys.bf")
        bfio.save_bloom(bf, p)
        bf2 = bfio.load_bloom(p)
        pre2 = bloom_semi_join(
            li, "l_orderkey", orders, "o_orderkey", bloom=bf2, exact=False
        ).count()
        assert pre2 == pre_n


@pytest.mark.spark
def test_bloom_semi_join_null_keys_and_validation(spark):
    small = spark.createDataFrame([(1,), (2,)], "k long")
    large = spark.createDataFrame([(1, "a"), (None, "b"), (3, "c")], "k long, v string")
    out = bloom_semi_join(large, "k", small, "k").select("v").toPandas()
    assert sorted(out.v.tolist()) == ["a"]

    from btl_bloomfilter_spark.operators.bloom import BloomFilter

    with pytest.raises(ValueError):
        bloom_semi_join(large, "k", small, "k", bloom=BloomFilter(1 << 10, 2, 4))


@pytest.mark.spark
def test_bloom_semi_join_plan_prefilters_before_exchange(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").where(F.col("o_totalprice") > 150000)
    out = bloom_semi_join(li, "l_orderkey", orders, "o_orderkey")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the Arrow probe (pre-filter) must sit BELOW the join's shuffle of
    # the large side: find the large-side Exchange and assert the
    # ArrowEvalPython appears after it in the printed tree (deeper =
    # later lines in Spark's top-down tree print)
    lines = plan.splitlines()
    ex = [i for i, l in enumerate(lines) if "Exchange hashpartitioning(l_orderkey" in l]
    arrow = [i for i, l in enumerate(lines) if "ArrowEvalPython" in l or "PythonUDF" in l]
    assert arrow, plan
    if ex:  # AQE may choose broadcast instead; only assert when shuffled
        assert min(arrow) > min(ex), plan

"""SQL-callable sketch aggregates: registration, bound-gated
estimates vs exact, exact-below-k theta, partition-layout
determinism."""
import math

import pytest

from btl_bloomfilter_spark.functions.udaf import register_sketch_aggs


@pytest.fixture(scope="module")
def registered(spark):
    names = register_sketch_aggs(spark)
    assert names == [
        "btl_hll_distinct",
        "btl_kll_quantile",
        "btl_tdigest_quantile",
        "btl_theta_distinct",
    ]
    return spark


@pytest.mark.spark
def test_udaf_hll_within_bound(registered):
    spark = registered
    rows = [(f"g{i % 3}", f"user{i % 997}") for i in range(5000)]
    spark.createDataFrame(rows, "g string, uid string").createOrReplaceTempView(
        "t_udaf_hll"
    )
    # Spark can't mix pandas UDAFs with built-in aggregates in ONE
    # aggregation (INVALID_PANDAS_UDF_PLACEMENT) — join two grouped
    # subqueries instead (documented in functions/udaf.py)
    out = spark.sql(
        """SELECT e.g, e.est, x.exact
           FROM (SELECT g, btl_hll_distinct(uid) AS est
                 FROM t_udaf_hll GROUP BY g) e
           JOIN (SELECT g, count(DISTINCT uid) AS exact
                 FROM t_udaf_hll GROUP BY g) x
           USING (g)"""
    ).toPandas()
    bound = 4 * 1.04 / math.sqrt(2**14)
    assert len(out) == 3
    assert ((out.est - out.exact).abs() / out.exact <= bound).all(), out


@pytest.mark.spark
def test_udaf_theta_exact_below_k(registered):
    spark = registered
    rows = [(i % 500,) for i in range(3000)]
    spark.createDataFrame(rows, "v long").createOrReplaceTempView("t_udaf_theta")
    out = spark.sql(
        "SELECT btl_theta_distinct(v) AS est FROM t_udaf_theta"
    ).toPandas()
    # 500 uniques < k=4096: KMV is still in exact mode
    assert out.est.iloc[0] == 500.0


@pytest.mark.spark
def test_udaf_quantiles_near_exact(registered):
    spark = registered
    rows = [(float(i),) for i in range(1, 10001)]
    spark.createDataFrame(rows, "x double").createOrReplaceTempView("t_udaf_q")
    out = spark.sql(
        """SELECT btl_kll_quantile(x, 0.5) AS kll_med,
                  btl_tdigest_quantile(x, 0.99) AS td_p99
           FROM t_udaf_q"""
    ).toPandas().iloc[0]
    assert abs(out.kll_med - 5000.0) / 5000.0 < 0.05
    assert abs(out.td_p99 - 9900.0) / 9900.0 < 0.02


@pytest.mark.spark
def test_udaf_partition_layout_invariant(registered):
    spark = registered
    rows = [(f"g{i % 2}", float(i % 777), f"u{i % 321}") for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, x double, u string")
    df.createOrReplaceTempView("t_udaf_det")
    df.repartition(23, "x").createOrReplaceTempView("t_udaf_det_shuf")
    q = (
        "SELECT g, btl_hll_distinct(u) AS h, btl_theta_distinct(u) AS t, "
        "btl_kll_quantile(x, 0.9) AS k, btl_tdigest_quantile(x, 0.9) AS d "
        "FROM {} GROUP BY g ORDER BY g"
    )
    a = spark.sql(q.format("t_udaf_det")).toPandas()
    b = spark.sql(q.format("t_udaf_det_shuf")).toPandas()
    # order-independent updates (Sketch protocol law) => bit-equal
    # results under any partition/arrival order
    for c in ("h", "t", "k", "d"):
        assert a[c].tolist() == b[c].tolist(), c

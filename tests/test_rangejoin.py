"""Interval join: brute-force parity, edge semantics, plan shape."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.rangejoin import interval_join, interval_join_count


def _pts(spark, vals, extra=None):
    rows = [(i, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "p_id long, x long")


def _ivs(spark, triples):
    return spark.createDataFrame(triples, "iv_id long, s long, e long")


def _brute(spark, pts, ivs, end_inclusive=False):
    """Reference result via an explicit (small-scale) theta join."""
    upper = F.col("x") <= F.col("e") if end_inclusive else F.col("x") < F.col("e")
    return (
        pts.crossJoin(ivs)
        .where((F.col("x") >= F.col("s")) & upper)
        .select("p_id", "x", "iv_id", "s", "e")
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.spark
@pytest.mark.parametrize("width", [1, 3, 7, 100])
@pytest.mark.parametrize("end_inclusive", [False, True])
def test_parity_with_brute_force(spark, width, end_inclusive):
    pts = _pts(spark, [0, 1, 5, 9, 10, 11, 15, 20, 99, 100])
    ivs = _ivs(
        spark,
        [
            (0, 0, 10),  # straddles buckets at every width
            (1, 10, 10),  # empty under closed-open, point under closed-closed
            (2, 5, 6),  # width-1
            (3, 0, 100),  # long interval, many buckets at width 1..7
            (4, 98, 120),
            (5, 11, 11),
        ],
    )
    got = interval_join(
        pts, "x", ivs, "s", "e", bucket_width=width, end_inclusive=end_inclusive,
        max_replication=200.0,
    )
    want = _brute(spark, pts, ivs, end_inclusive)
    assert _sorted_rows(got.select("p_id", "x", "iv_id", "s", "e")) == _sorted_rows(want)


@pytest.mark.spark
def test_no_duplicate_pairs(spark):
    """Each qualifying (point, interval) pair appears exactly once even
    when the interval spans many buckets."""
    pts = _pts(spark, list(range(50)))
    ivs = _ivs(spark, [(0, 0, 49)])
    out = interval_join(pts, "x", ivs, "s", "e", bucket_width=2, max_replication=100.0)
    assert out.count() == out.select("p_id", "iv_id").distinct().count() == 49


@pytest.mark.spark
def test_nulls_and_empty_intervals_never_match(spark):
    pts = spark.createDataFrame([(0, 5), (1, None)], "p_id long, x long")
    ivs = spark.createDataFrame(
        [(0, 0, 10), (1, None, 10), (2, 0, None), (3, 8, 4)], "iv_id long, s long, e long"
    )
    out = interval_join(pts, "x", ivs, "s", "e", bucket_width=5)
    rows = _sorted_rows(out.select("p_id", "iv_id"))
    assert rows == [(0, 0)]


@pytest.mark.spark
def test_equality_keys(spark):
    pts = spark.createDataFrame(
        [(0, "a", 5), (1, "b", 5), (2, "a", 50)], "p_id long, k string, x long"
    )
    ivs = spark.createDataFrame(
        [(0, "a", 0, 10), (1, "b", 0, 10), (2, "a", 40, 60)], "iv_id long, k string, s long, e long"
    )
    out = interval_join(pts, "x", ivs, "s", "e", on=["k"], bucket_width=10)
    rows = _sorted_rows(out.select("p_id", "iv_id"))
    assert rows == [(0, 0), (1, 1), (2, 2)]


@pytest.mark.spark
def test_timestamp_columns_microsecond_precision(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    us = dt.timedelta(microseconds=1)
    pts = spark.createDataFrame(
        [(0, t0), (1, t0 + us), (2, t0 - us)], "p_id long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(0, t0, t0 + us)], "iv_id long, t_start timestamp, t_end timestamp"
    )
    out = interval_join(pts, "ts", ivs, "t_start", "t_end", bucket_width=1_000_000)
    assert _sorted_rows(out.select("p_id")) == [(0,)]  # closed-open at 1us resolution
    out_inc = interval_join(
        pts, "ts", ivs, "t_start", "t_end", bucket_width=1_000_000, end_inclusive=True
    )
    assert _sorted_rows(out_inc.select("p_id")) == [(0,), (1,)]


@pytest.mark.spark
def test_auto_width_and_replication_guard(spark):
    pts = _pts(spark, list(range(0, 1000, 37)))
    ivs = _ivs(spark, [(i, i * 10, i * 10 + 20) for i in range(50)])
    auto = interval_join(pts, "x", ivs, "s", "e")  # p90 duration = 20
    explicit = interval_join(pts, "x", ivs, "s", "e", bucket_width=20)
    assert _sorted_rows(auto) == _sorted_rows(explicit)
    with pytest.raises(ValueError, match="max_replication"):
        interval_join(pts, "x", ivs, "s", "e", bucket_width=1, max_replication=4.0)
    with pytest.raises(ValueError, match="collision"):
        interval_join(pts, "x", pts.withColumnRenamed("p_id", "s2"), "x", "x")


@pytest.mark.spark
def test_count_rollup(spark):
    pts = _pts(spark, list(range(100)))
    ivs = _ivs(spark, [(0, 0, 10), (1, 50, 100), (2, 200, 300)])
    out = {r["iv_id"]: r["n_points"] for r in
           interval_join_count(pts, "x", ivs, "s", "e", "iv_id", bucket_width=25).collect()}
    assert out == {0: 10, 1: 50}  # closed-open; empty interval 2 absent


@pytest.mark.spark
def test_ntz_timestamps_session_tz_independent(spark):
    """TIMESTAMP_NTZ columns (what parquet scans yield) must join
    identically under any session timezone — the naive NTZ→LTZ cast
    shifts by the session offset."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ivs = ev.where(F.col("event_id") % 31 == 0).select(
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("t_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t_end"),
    )
    pts = ev.select(F.col("event_id").alias("p_id"), F.col("ts").alias("pt"))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    results = {}
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            out = interval_join(
                pts, "pt", ivs, "t_start", "t_end", bucket_width=3_600_000_000
            )
            results[tz] = _sorted_rows(out.select("p_id", "iv_id"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert results["UTC"] == results["America/New_York"]
    assert len(results["UTC"]) > 0


@pytest.mark.spark
def test_plan_has_no_nested_loop(spark):
    """The whole point: the physical plan must be a shuffled equi-join,
    never BroadcastNestedLoop/Cartesian."""
    pts = _pts(spark, list(range(200)))
    ivs = _ivs(spark, [(i, i, i + 5) for i in range(100)])
    out = interval_join(pts, "x", ivs, "s", "e", bucket_width=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan

@pytest.mark.spark
def test_exact_bucketing_beyond_double_precision(spark):
    """Nanosecond-epoch-scale longs (>2^53): bucket assignment must be
    exact — a double division can land one bucket low and silently
    drop qualifying pairs."""
    base = 1_700_000_000_123_456_789  # ns epoch, far beyond 2^53
    w = 3_600_000_000_000  # 1h in ns
    pt_rows = [(i, base + i * 977_777_777) for i in range(200)]
    iv_rows = [(j, base + j * w // 2, base + j * w // 2 + w) for j in range(8)]
    pts = spark.createDataFrame(pt_rows, "pid long, v long")
    ivs = spark.createDataFrame(iv_rows, "iv long, s long, e long")

    got = sorted(
        (r["pid"], r["iv"])
        for r in interval_join(pts, "v", ivs, "s", "e", bucket_width=w).collect()
    )
    want = sorted(
        (p, j) for p, v in pt_rows for j, s, e in iv_rows if s <= v < e
    )
    assert len(want) > 0
    assert got == want

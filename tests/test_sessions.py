"""Sessionization: hand-computed gap cases, tie/NULL handling,
cross-engine parity, plan shape (one exchange, reused by the stats
agg)."""
import datetime as dt

import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.sessions import (
    session_stats,
    session_stats_sql,
    sessionize,
)


def _ts(m, s=0, us=0):
    return dt.datetime(2026, 1, 1, 12, 0) + dt.timedelta(minutes=m, seconds=s, microseconds=us)


@pytest.mark.spark
def test_sessionize_planted(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap
        (1, _ts(0)), (1, _ts(10)), (1, _ts(20)),
        (1, _ts(20 + 45)), (1, _ts(20 + 50)),
        # user 2: one event
        (2, _ts(5)),
        # user 3: NULL ts dropped
        (3, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, ["user_id"], "ts", gap_seconds=30 * 60).toPandas()
    got = {
        (r.user_id, r.ts.hour * 60 + r.ts.minute): r.session_idx
        for r in out.itertuples()
    }
    m0 = 12 * 60
    assert got[(1, m0)] == got[(1, m0 + 10)] == got[(1, m0 + 20)] == 0
    assert got[(1, m0 + 65)] == got[(1, m0 + 70)] == 1
    assert got[(2, m0 + 5)] == 0
    assert 3 not in {r.user_id for r in out.itertuples()}


@pytest.mark.spark
def test_sessionize_boundary_and_ties(spark):
    # gap EXACTLY equal to the threshold does not break (> not >=);
    # one microsecond beyond does; equal timestamps share a session
    rows = [
        (1, _ts(0)), (1, _ts(10)),            # 600s gap == threshold
        (1, _ts(20, 0, 1)),                   # 600.000001s -> break
        (1, _ts(20, 0, 1)),                   # tie with the breaker
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, ["user_id"], "ts", gap_seconds=600).toPandas()
    idx = sorted(out.session_idx.tolist())
    assert idx == [0, 0, 1, 1]


@pytest.mark.spark
def test_session_stats_exact_duration(spark):
    rows = [(1, _ts(0)), (1, _ts(0, 30, 500000)), (1, _ts(1))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = session_stats(df, ["user_id"], "ts", gap_seconds=3600).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.n_events == 3
    assert r.duration_micros == 60 * 1_000_000
    assert r.duration_secs == 60.0


@pytest.mark.spark
def test_sessions_cross_engine(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(5)
    rows = []
    base = dt.datetime(2026, 1, 1)
    for uid in range(40):
        t = base + dt.timedelta(seconds=rng.randint(0, 3600))
        for _ in range(rng.randint(1, 30)):
            t += dt.timedelta(seconds=rng.randint(0, 4000), microseconds=rng.randint(0, 999999))
            rows.append((uid, t))
    # planted ties + a NULL
    rows += [(0, rows[0][1]), (0, rows[0][1]), (99, None)]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    path = str(tmp_path / "ev.parquet")
    # pandas defaults to nanosecond timestamps, which Spark's parquet
    # reader rejects; coerce to microseconds (the engine precision)
    pdf.to_parquet(path, coerce_timestamps="us")

    got = (
        session_stats(spark.read.parquet(path), ["user_id"], "ts", gap_seconds=1800)
        .toPandas().sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM '{path}'")
    want = (
        con.sql(session_stats_sql("ev", ["user_id"], "ts", gap_seconds=1800))
        .df().sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    )
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["duration_micros"].tolist() == want["duration_micros"].tolist()
    assert got["start_ts"].tolist() == want["start_ts"].tolist()
    assert got["end_ts"].tolist() == want["end_ts"].tolist()


@pytest.mark.spark
def test_session_stats_single_exchange(spark):
    # the groupBy(key, session_idx) must reuse the window's
    # hash-partitioning on key: exactly ONE Exchange in the plan
    rows = [(1, _ts(0)), (1, _ts(10)), (2, _ts(5))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = session_stats(df, ["user_id"], "ts", gap_seconds=60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1, plan

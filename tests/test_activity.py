"""Trailing-window active users (operators/activity): brute parity,
window semantics, HLL-path bound, DuckDB twin."""

import datetime as dt
import math
import random

import pytest

from btl_bloomfilter_spark.operators.activity import (
    trailing_active,
    trailing_active_hll,
    trailing_active_sql,
)

EPOCH = dt.date(2000, 1, 3)


def _brute(rows, window_periods, period_days):
    act = set()
    for u, d in rows:
        if u is None or d is None:
            continue
        day = ((d.date() if isinstance(d, dt.datetime) else d) - EPOCH).days
        act.add((u, day // period_days))
    out = {}
    for u, p in act:
        for off in range(window_periods):
            out.setdefault(p + off, set()).add(u)
    return {p: len(us) for p, us in out.items()}


def test_matches_brute(spark):
    rng = random.Random(154)
    rows = []
    for u in range(150):
        start = dt.datetime(2024, 1, 1) + dt.timedelta(days=rng.randrange(0, 40))
        for _ in range(rng.randrange(1, 8)):
            rows.append((u, start + dt.timedelta(days=rng.randrange(0, 70))))
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {r.period: r.n_active for r in trailing_active(df, "u", "ts", window_periods=4).collect()}
    assert got == _brute(rows, 4, 7)
    # window=1 degenerates to per-period distinct
    got1 = {r.period: r.n_active for r in trailing_active(df, "u", "ts", window_periods=1).collect()}
    assert got1 == _brute(rows, 1, 7)


def test_window_semantics(spark):
    d0 = dt.datetime(2024, 1, 1)  # Monday
    rows = [(1, d0), (2, d0 + dt.timedelta(days=21))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {r.period: r.n_active for r in trailing_active(df, "u", "ts", window_periods=3).collect()}
    p0 = ((d0.date() - EPOCH).days) // 7
    # user 1 covers p0..p0+2; user 2 covers p0+3..p0+5 -> never overlap
    assert got == {p0: 1, p0 + 1: 1, p0 + 2: 1, p0 + 3: 1, p0 + 4: 1, p0 + 5: 1}


def test_hll_path_within_bound(spark):
    rng = random.Random(8)
    rows = []
    for u in range(400):
        start = dt.datetime(2024, 1, 1) + dt.timedelta(days=rng.randrange(0, 30))
        rows.append((u, start))
        if rng.random() < 0.4:
            rows.append((u, start + dt.timedelta(days=rng.randrange(0, 40))))
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    exact = {r.period: r.n_active for r in trailing_active(df, "u", "ts").collect()}
    est = {r.period: r.n_active_est for r in trailing_active_hll(df, "u", "ts", precision=14).collect()}
    assert set(exact) == set(est)
    bound = 4 * 1.04 / math.sqrt(1 << 14)
    for p, n in exact.items():
        assert abs(est[p] - n) <= max(bound * n, 2.0), (p, n, est[p])


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(11)
    rows = []
    for u in range(100):
        for _ in range(rng.randrange(1, 6)):
            rows.append((u, dt.datetime(2024, 2, 1) + dt.timedelta(days=rng.randrange(0, 50))))
    pdf = pd.DataFrame(rows, columns=["u", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    p = str(tmp_path / "act.parquet")
    pdf.to_parquet(p)
    got = (
        trailing_active(spark.read.parquet(p), "u", "ts", window_periods=4, period_days=7)
        .orderBy("period")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        trailing_active_sql("t", "u", "ts", window_periods=4, period_days=7)
        + " ORDER BY period"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "u long, ts timestamp")
    with pytest.raises(ValueError):
        trailing_active(df, "u", "ts", window_periods=0)
    with pytest.raises(ValueError):
        trailing_active(df, "u", "ts", period_days=0)
    with pytest.raises(ValueError):
        trailing_active_sql("t", "u", "ts", window_periods=0)

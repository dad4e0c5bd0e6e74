"""Cohort retention matrix (operators/retention): brute parity,
age-0 law, dedup-within-period semantics, DuckDB twin."""

import datetime as dt
import random

import pytest

from btl_bloomfilter_spark.operators.retention import (
    retention_matrix,
    retention_matrix_sql,
)

EPOCH = dt.date(2000, 1, 3)


def _brute(rows, period_days):
    act = set()
    for u, d in rows:
        if u is None or d is None:
            continue
        day = (d.date() if isinstance(d, dt.datetime) else d) - EPOCH
        act.add((u, day.days // period_days))
    cohort = {}
    for u, p in act:
        cohort[u] = min(cohort.get(u, p), p)
    cells = {}
    for u, p in act:
        key = (cohort[u], p - cohort[u])
        cells[key] = cells.get(key, 0) + 1
    out = {}
    for (c, a), n in cells.items():
        nc = cells[(c, 0)]
        out[(c, a)] = (n, nc, n / nc)
    return out


def test_matches_brute_and_age0_law(spark):
    rng = random.Random(153)
    rows = []
    for u in range(120):
        start = dt.datetime(2024, 1, 1) + dt.timedelta(days=rng.randrange(0, 60))
        for _ in range(rng.randrange(1, 15)):
            rows.append((u, start + dt.timedelta(days=rng.randrange(0, 90))))
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        (r.cohort_period, r.age): r
        for r in retention_matrix(df, "u", "ts", period_days=7).collect()
    }
    want = _brute(rows, 7)
    assert set(got) == set(want)
    for key, (n, nc, ret) in want.items():
        r = got[key]
        assert (r.n_active, r.n_cohort) == (n, nc)
        assert r.retention == ret
    for (c, a), r in got.items():
        assert r.n_active <= r.n_cohort
        if a == 0:
            assert r.retention == 1.0


def test_within_period_dedup_and_nulls(spark):
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, d0), (1, d0 + dt.timedelta(hours=5)),          # same day: one activity
        (1, d0 + dt.timedelta(days=1)),                    # next day, same week? no: period_days=1
        (2, None), (None, d0),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = retention_matrix(df, "u", "ts", period_days=1).collect()
    cells = {(r.cohort_period, r.age): r.n_active for r in got}
    assert len(cells) == 2 and all(v == 1 for v in cells.values())


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(5)
    rows = []
    for u in range(80):
        start = dt.datetime(2024, 3, 1) + dt.timedelta(days=rng.randrange(0, 30))
        for _ in range(rng.randrange(1, 10)):
            rows.append((u, start + dt.timedelta(days=rng.randrange(0, 60),
                                                 seconds=rng.randrange(0, 86400))))
    pdf = pd.DataFrame(rows, columns=["u", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark can't scan TIMESTAMP(NANOS)
    p = str(tmp_path / "ret.parquet")
    pdf.to_parquet(p)
    got = (
        retention_matrix(spark.read.parquet(p), "u", "ts", period_days=14)
        .orderBy("cohort_period", "age")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        retention_matrix_sql("t", "u", "ts", period_days=14)
        + " ORDER BY cohort_period, age"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "u long, ts timestamp")
    with pytest.raises(ValueError):
        retention_matrix(df, "u", "ts", period_days=0)
    with pytest.raises(ValueError):
        retention_matrix_sql("t", "u", "ts", period_days=-1)

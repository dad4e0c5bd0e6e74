"""As-of join: hand-planted semantics, DuckDB ASOF JOIN parity on
random data, tolerance, plan shape (single exchange, no range join)."""
import pandas as pd
import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.asof import asof_join


@pytest.mark.spark
def test_asof_join_planted(spark):
    left = spark.createDataFrame(
        [(1, 10, "q1"), (1, 25, "q2"), (1, 8, "q0"), (2, 5, "q3"), (3, 7, "q4"),
         (1, 20, "qt")],
        "k long, ts long, q string",
    )
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 20, "b"), (2, 9, "c"), (1, None, "junk")],
        "k long, ts long, v string",
    )
    out = {
        (r["k"], r["ts"]): (r["v_right"], r["ts_right"])
        for r in asof_join(left, right, ["k"], "ts").collect()
    }
    assert out[(1, 10)] == ("a", 8)
    assert out[(1, 25)] == ("b", 20)
    assert out[(1, 8)] == ("a", 8)      # equal ts matches (<=)
    assert out[(1, 20)] == ("b", 20)    # equal ts matches
    assert out[(2, 5)] == (None, None)  # right is later only
    assert out[(3, 7)] == (None, None)  # no right key
    # tolerance: (1,25) gap to b is 5 — tolerance 4 nulls it, 5 keeps it
    tol = {
        (r["k"], r["ts"]): r["v_right"]
        for r in asof_join(left, right, ["k"], "ts", tolerance=4).collect()
    }
    assert tol[(1, 25)] is None and tol[(1, 10)] == "a"


@pytest.mark.spark
def test_asof_join_matches_duckdb_on_random(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(5)
    lrows = [(rng.randint(0, 9), rng.randint(0, 1000), i) for i in range(400)]
    # unique (k, ts) on the right: DuckDB ASOF tie-breaking among
    # duplicate right timestamps is unspecified, ours is documented
    seen = set()
    rrows = []
    for j in range(300):
        k, t = rng.randint(0, 9), rng.randint(0, 1000)
        if (k, t) not in seen:
            seen.add((k, t))
            rrows.append((k, t, j))
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pd.DataFrame(lrows, columns=["k", "ts", "lid"]).to_parquet(lp)
    pd.DataFrame(rrows, columns=["k", "ts", "rid"]).to_parquet(rp)

    got = (
        asof_join(spark.read.parquet(lp), spark.read.parquet(rp), ["k"], "ts")
        .select("lid", "ts_right", "rid_right")
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        f"""
        SELECT l.lid, r.ts AS ts_right, r.rid AS rid_right
        FROM '{lp}' l ASOF LEFT JOIN '{rp}' r
          ON l.k = r.k AND r.ts <= l.ts
        ORDER BY l.lid
        """
    ).df().reset_index(drop=True)
    assert got.ts_right.where(got.ts_right.notna(), -1).tolist() == \
        want.ts_right.where(want.ts_right.notna(), -1).tolist()
    assert got.rid_right.where(got.rid_right.notna(), -1).tolist() == \
        want.rid_right.where(want.rid_right.notna(), -1).tolist()


@pytest.mark.spark
def test_asof_join_plan_single_exchange(spark, tmp_path):
    lrows = [(i % 4, i * 3, i) for i in range(100)]
    rrows = [(i % 4, i * 5, i) for i in range(60)]
    lp, rp = str(tmp_path / "l2.parquet"), str(tmp_path / "r2.parquet")
    pd.DataFrame(lrows, columns=["k", "ts", "lid"]).to_parquet(lp)
    pd.DataFrame(rrows, columns=["k", "ts", "rid"]).to_parquet(rp)
    out = asof_join(spark.read.parquet(lp), spark.read.parquet(rp), ["k"], "ts")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # one hash partitioning exchange on the key (the window's)
    assert plan.count("Exchange hashpartitioning(k") == 1, plan


@pytest.mark.spark
def test_asof_join_matches_pandas_merge_asof(spark):
    """Third-engine check: pandas merge_asof(direction='backward') is
    the reference implementation of as-of semantics — 500 random left
    rows, tolerance both on and off."""
    import numpy as np

    rng = np.random.default_rng(17)
    left = pd.DataFrame({
        "k": rng.integers(0, 8, 500),
        "ts": rng.integers(0, 2000, 500),
        "lid": np.arange(500),
    })
    right = (
        pd.DataFrame({
            "k": rng.integers(0, 8, 300),
            "ts": rng.integers(0, 2000, 300),
            "rid": np.arange(300),
        })
        .drop_duplicates(["k", "ts"], keep="last")
        .reset_index(drop=True)
    )

    for tol in (None, 100):
        got = (
            asof_join(
                spark.createDataFrame(left), spark.createDataFrame(right),
                ["k"], "ts", tolerance=tol,
            )
            .select("lid", "rid_right")
            .toPandas().sort_values("lid").reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            right.sort_values("ts", kind="mergesort"),
            on="ts", by="k", direction="backward",
            **({"tolerance": tol} if tol is not None else {}),
        ).sort_values("lid").reset_index(drop=True)
        g = got.rid_right.where(got.rid_right.notna(), -1).astype(int).tolist()
        w = want.rid.where(want.rid.notna(), -1).astype(int).tolist()
        assert g == w, f"tolerance={tol}"


@pytest.mark.spark
def test_asof_join_null_keys_never_match(spark):
    """NULL join keys follow SQL equality: a NULL-key right row is
    never a match candidate, a NULL-key left row passes through
    unmatched (review finding: Window.partitionBy groups NULLs)."""
    left = spark.createDataFrame(
        [(None, 10, "lnull"), (1, 10, "l1")], "k long, ts long, q string"
    )
    right = spark.createDataFrame(
        [(None, 5, "rnull"), (1, 5, "r1")], "k long, ts long, v string"
    )
    out = {r["q"]: r["v_right"] for r in asof_join(left, right, ["k"], "ts").collect()}
    assert out == {"lnull": None, "l1": "r1"}


@pytest.mark.spark
def test_asof_join_subsecond_tolerance(spark):
    """Timestamp tolerance compares at microsecond precision (review
    finding: a cast-to-long truncated gaps to whole seconds)."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1)

    def t(ms):
        return base + dt.timedelta(milliseconds=ms)

    left = spark.createDataFrame([(1, t(10900), "q")], "k long, ts timestamp, q string")
    right = spark.createDataFrame([(1, t(10000), "v")], "k long, ts timestamp, v string")
    # true gap 0.9s: tolerance 0 must null it, 0.5 must null it, 1.0 keeps it
    for tol, want in ((0, None), (0.5, None), (1.0, "v")):
        got = asof_join(left, right, ["k"], "ts", tolerance=tol).collect()[0]["v_right"]
        assert got == want, (tol, got)

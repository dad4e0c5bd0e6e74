"""Funnel analysis (operators/funnel): greedy-subsequence brute
parity, tie/exclusion semantics, report arithmetic, DuckDB twins."""

import random

import pytest

from btl_bloomfilter_spark.operators.funnel import (
    funnel_report,
    funnel_report_sql,
    funnel_stages,
    funnel_stages_sql,
)

STEPS = ["view", "click", "purchase"]


def _brute_stage(events, steps):
    """events: list of (t, s) — greedy earliest-match subsequence."""
    evs = sorted((t, s) for t, s in events if s in steps)
    matched = []
    cur = None
    for want in steps:
        cands = [t for t, s in evs if s == want and (cur is None or t > cur)]
        if not cands:
            break
        cur = min(cands)
        matched.append(cur)
    return len(matched), matched


def test_stages_match_brute(spark):
    rng = random.Random(151)
    all_types = STEPS + ["error", "signup"]
    rows, truth = [], {}
    for k in range(80):
        evs = [
            (rng.randrange(0, 50), rng.choice(all_types))
            for _ in range(rng.randrange(1, 12))
        ]
        rows += [(k, s, t) for t, s in evs]
        truth[k] = _brute_stage(evs, STEPS)
    df = spark.createDataFrame(rows, "k long, s string, t long")
    got = {r.k: r for r in funnel_stages(df, ["k"], "s", STEPS, "t").collect()}
    for k, (stage, matched) in truth.items():
        if not any(s in STEPS for _, s in [(t, s) for kk, s, t in rows if kk == k]):
            assert k not in got
            continue
        r = got[k]
        assert r.stage_reached == stage, (k, r, matched)
        for i, m in enumerate(matched, start=1):
            assert getattr(r, f"matched_{i}") == m
        for i in range(stage + 1, len(STEPS) + 1):
            assert getattr(r, f"matched_{i}") is None


def test_tie_and_exclusion_semantics(spark):
    rows = [
        ("tie", "view", 10), ("tie", "click", 10),        # same t -> strict > blocks
        ("ok", "view", 1), ("ok", "click", 2), ("ok", "purchase", 3),
        ("zero", "click", 5),                              # relevant but no step1
        ("none", "error", 1),                              # no relevant events
        ("nullt", "view", None),                           # NULL order dropped
    ]
    df = spark.createDataFrame(rows, "k string, s string, t long")
    got = {r.k: r for r in funnel_stages(df, ["k"], "s", STEPS, "t").collect()}
    assert got["tie"].stage_reached == 1
    assert got["ok"].stage_reached == 3
    assert got["zero"].stage_reached == 0
    assert "none" not in got and "nullt" not in got


def test_report_arithmetic(spark):
    # 4 eligible keys: stages 3, 2, 1, 0
    rows = [
        ("a", "view", 1), ("a", "click", 2), ("a", "purchase", 3),
        ("b", "view", 1), ("b", "click", 2),
        ("c", "view", 1),
        ("d", "click", 1),
    ]
    df = spark.createDataFrame(rows, "k string, s string, t long")
    rep = {r.stage: r for r in funnel_report(df, ["k"], "s", STEPS, "t").collect()}
    assert (rep[1].n_reached, rep[2].n_reached, rep[3].n_reached) == (3, 2, 1)
    assert rep[1].conversion == 3 / 4    # from 4 eligible keys
    assert rep[2].conversion == 2 / 3
    assert rep[3].conversion == 1 / 2
    assert [rep[i].step for i in (1, 2, 3)] == STEPS
    # all-zero tail -> NULL conversion after a zero denominator
    df2 = spark.createDataFrame([("x", "error", 1), ("x", "view", 2)], "k string, s string, t long")
    rep2 = {r.stage: r for r in funnel_report(df2, ["k"], "s", STEPS, "t").collect()}
    assert rep2[2].n_reached == 0 and rep2[2].conversion == 0.0
    assert rep2[3].conversion is None    # 0/0


def test_duckdb_twins(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(9)
    all_types = STEPS + ["error"]
    rows = []
    for k in range(60):
        for _ in range(rng.randrange(1, 10)):
            rows.append((k, rng.choice(all_types), rng.randrange(0, 40)))
    pdf = pd.DataFrame(rows, columns=["k", "s", "t"])
    p = str(tmp_path / "fe.parquet")
    pdf.to_parquet(p)
    sdf = spark.read.parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    got = funnel_stages(sdf, ["k"], "s", STEPS, "t").orderBy("k").toPandas()
    want = con.sql(funnel_stages_sql("t", "k", "s", STEPS, "t") + " ORDER BY k").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    gr = funnel_report(sdf, ["k"], "s", STEPS, "t").orderBy("stage").toPandas()
    wr = con.sql(funnel_report_sql("t", "k", "s", STEPS, "t") + " ORDER BY stage").df()
    pd.testing.assert_frame_equal(gr, wr, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([("k", "view", 1)], "k string, s string, t long")
    with pytest.raises(ValueError):
        funnel_stages(df, ["k"], "s", ["a"], "t")
    with pytest.raises(ValueError):
        funnel_stages(df, ["k"], "s", ["a", "a"], "t")
    with pytest.raises(ValueError):
        funnel_stages(df, ["k"], "s", list("abcdefg"), "t")
    with pytest.raises(ValueError):
        funnel_stages(df, [], "s", ["a", "b"], "t")
    with pytest.raises(ValueError):
        funnel_report_sql("t", "k", "s", ["a"], "t")


def test_report_empty_universe(spark, tmp_path):
    import duckdb
    import pandas as pd

    # NO key has any funnel-step event: counts must be 0, not NULL
    df = spark.createDataFrame([("k", "error", 1)], "k string, s string, t long")
    rep = {r.stage: r for r in funnel_report(df, ["k"], "s", STEPS, "t").collect()}
    assert all(rep[i].n_reached == 0 for i in (1, 2, 3))
    assert all(rep[i].conversion is None for i in (1, 2, 3))  # 0/0 everywhere
    pdf = pd.DataFrame([("k", "error", 1)], columns=["k", "s", "t"])
    p = str(tmp_path / "empty.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    w = con.sql(funnel_report_sql("t", "k", "s", STEPS, "t") + " ORDER BY stage").df()
    assert w["n_reached"].tolist() == [0, 0, 0]

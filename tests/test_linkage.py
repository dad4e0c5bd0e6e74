"""Fellegi-Sunter blocked record linkage: hand-computed integer
scores, NULL-as-disagreement convention, blocking exclusion, the
no-blocking guard, cross-engine parity of the Spark plan vs the
DuckDB twin built from the SAME spec, and the equi-join plan shape
(no cartesian / nested-loop node)."""

import math

import pytest

from btl_bloomfilter_spark.operators.linkage import (
    Comparator,
    fellegi_sunter_link,
    fellegi_sunter_sql,
    fs_weights,
)


def test_fs_weights_values_and_guard():
    wa, wd = fs_weights(0.9, 0.1)
    assert wa == int(math.floor(math.log2(9.0) * 1000)) == 3169
    assert wd == int(math.floor(math.log2(0.1 / 0.9) * 1000)) == -3170
    for m, u in [(0.5, 0.5), (0.1, 0.9), (1.0, 0.5), (0.5, 0.0)]:
        with pytest.raises(ValueError):
            fs_weights(m, u)


def _spec():
    # (agree, disagree) milli-bit weights fixed by hand so scores are
    # checkable mentally: name ±2000, phone +4000/-1000, bal ±3000.
    return [
        Comparator("name", "{t}name", "{t}name", 2000, -2000, kind="lev", max_dist=1),
        Comparator("phone", "{t}phone", "{t}phone", 4000, -1000, kind="exact"),
        Comparator("bal", "{t}bal", "{t}bal", 3000, -3000, kind="exact"),
    ]


_SCHEMA = "id long, blk string, name string, phone string, bal long"

_ROWS_A = [
    (1, "x", "alice", "555", 100),
    (2, "x", "bob", "666", 200),
    (3, "y", "carol", "777", 300),
    (4, "y", None, "888", 400),
]
_ROWS_B = [
    (11, "x", "alicx", "555", 100),   # name lev 1 -> agree; all agree: 2000+4000+3000
    (12, "x", "robert", "000", 200),  # only bal agrees: -2000-1000+3000
    (13, "z", "carol", "777", 300),   # blk mismatch -> never a candidate
    (14, "y", None, "888", None),     # NULL vs NULL name, NULL bal -> all treated as disagreement except phone
]


@pytest.mark.spark
def test_scores_nulls_and_blocking(spark):
    dfa = spark.createDataFrame(_ROWS_A, _SCHEMA)
    dfb = spark.createDataFrame(_ROWS_B, _SCHEMA)
    out = fellegi_sunter_link(
        dfa, dfb, id_a="id", id_b="id",
        block=[("{t}blk", "{t}blk")], comparators=_spec(), threshold_milli=5000,
    )
    got = {(r.id_a, r.id_b): r for r in out.collect()}
    # blocks: x -> {1,2} x {11,12}; y -> {3,4} x {14}; 13 (blk z) joins nothing
    assert set(got) == {(1, 11), (1, 12), (2, 11), (2, 12), (3, 14), (4, 14)}
    r = got[(1, 11)]
    assert (r.name_agree, r.phone_agree, r.bal_agree) == (True, True, True)
    assert r.score_milli == 9000 and r.is_match
    r = got[(2, 12)]
    assert (r.name_agree, r.phone_agree, r.bal_agree) == (False, False, True)
    assert r.score_milli == 0 and not r.is_match
    # NULL on either side of a comparator = disagreement, even NULL vs NULL
    r = got[(4, 14)]
    assert (r.name_agree, r.phone_agree, r.bal_agree) == (False, True, False)
    assert r.score_milli == -1000 and not r.is_match
    r = got[(3, 14)]  # one-sided NULL name, NULL bal
    assert (r.name_agree, r.phone_agree, r.bal_agree) == (False, False, False)
    assert r.score_milli == -6000


def test_unblocked_raises():
    with pytest.raises(ValueError):
        fellegi_sunter_link(None, None, id_a="id", id_b="id", block=[],
                            comparators=_spec(), threshold_milli=0)


@pytest.mark.spark
def test_cross_engine_parity(spark):
    import duckdb

    dfa = spark.createDataFrame(_ROWS_A, _SCHEMA)
    dfb = spark.createDataFrame(_ROWS_B, _SCHEMA)
    out = fellegi_sunter_link(
        dfa, dfb, id_a="id", id_b="id",
        block=[("{t}blk", "{t}blk")], comparators=_spec(), threshold_milli=5000,
    )
    spark_rows = sorted(tuple(r) for r in out.collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE ta (id BIGINT, blk TEXT, name TEXT, phone TEXT, bal BIGINT)")
    con.execute("CREATE TABLE tb (id BIGINT, blk TEXT, name TEXT, phone TEXT, bal BIGINT)")
    con.executemany("INSERT INTO ta VALUES (?,?,?,?,?)", _ROWS_A)
    con.executemany("INSERT INTO tb VALUES (?,?,?,?,?)", _ROWS_B)
    sql = fellegi_sunter_sql(
        "ta", "tb", id_a="id", id_b="id",
        block=[("{t}blk", "{t}blk")], comparators=_spec(), threshold_milli=5000,
    )
    duck_rows = sorted(tuple(r) for r in con.execute(f"SELECT * FROM {sql} t").fetchall())
    assert spark_rows == duck_rows


@pytest.mark.spark
def test_q112_planted_truth(spark, sf_dir):
    """Board-level gate: every noisy re-ingest row (id_b = id_a +
    500000 by construction) is called a match, and nothing else is —
    the threshold separates the true-pair band from the strongest
    in-block non-match (adjacent-key lev-1 name collisions)."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q112_record_linkage"](spark, sf_dir).collect()
    true_pairs = {(r.id_a, r.id_b) for r in rows if r.id_b - 500000 == r.id_a}
    called = {(r.id_a, r.id_b) for r in rows if r.is_match}
    assert true_pairs and called == true_pairs
    # lev tolerance is doing real work: some true pairs disagree bitwise
    assert any(not r.phone_agree for r in rows if (r.id_a, r.id_b) in true_pairs)


@pytest.mark.spark
def test_plan_is_equi_join(spark):
    dfa = spark.createDataFrame(_ROWS_A, _SCHEMA)
    dfb = spark.createDataFrame(_ROWS_B, _SCHEMA)
    out = fellegi_sunter_link(
        dfa, dfb, id_a="id", id_b="id",
        block=[("{t}blk", "{t}blk")], comparators=_spec(), threshold_milli=5000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

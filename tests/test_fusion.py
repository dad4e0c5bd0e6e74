"""rrf_fuse: exact integer fixed-point semantics, missing-item
handling, determinism, guards, and the Spark/DuckDB twin parity on a
synthetic pair of ranked lists."""

import pytest
from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.fusion import rrf_fuse, rrf_fuse_sql

GRID = 10**9


def _nano(k, *ranks):
    return sum(GRID // (k + r) for r in ranks if r is not None)


@pytest.mark.spark
def test_exact_contributions_and_missing_items(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, score_rank long")
    b = spark.createDataFrame([(3, 1), (4, 2)], "id long, score_rank long")
    out = {r.id: r for r in rrf_fuse([("a", a), ("b", b)], "id", k=60).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[3].rrf_nano == _nano(60, 3, 1)  # in both systems
    assert out[1].rrf_nano == _nano(60, 1)     # only in a
    assert out[4].rrf_nano == _nano(60, 2)     # only in b
    assert out[1].rank_b is None and out[4].rank_a is None
    # fused order: 3 (61+63 recips) > 1; ids 2 and 4 tie exactly
    # (both contribute grid//62) -> id ascending decides
    ranks = {r.id: r.fused_rank for r in out.values()}
    assert sorted(ranks, key=lambda i: ranks[i]) == [3, 1, 2, 4]
    # float column is derived from the long by one division
    assert out[3].rrf == out[3].rrf_nano / float(GRID)


@pytest.mark.spark
def test_equal_sum_tie_breaks_by_id(spark):
    # (r_a, r_b) = (1, 2) and (2, 1) sum identically -> id decides
    a = spark.createDataFrame([(10, 1), (7, 2)], "id long, score_rank long")
    b = spark.createDataFrame([(10, 2), (7, 1)], "id long, score_rank long")
    rows = rrf_fuse([("a", a), ("b", b)], "id").orderBy("fused_rank").collect()
    assert [r.id for r in rows] == [7, 10]
    assert rows[0].rrf_nano == rows[1].rrf_nano


@pytest.mark.spark
def test_guards(spark):
    a = spark.createDataFrame([(1, 1)], "id long, score_rank long")
    with pytest.raises(ValueError):
        rrf_fuse([], "id")
    with pytest.raises(ValueError):
        rrf_fuse([("x", a), ("x", a)], "id")
    with pytest.raises(ValueError):
        rrf_fuse([("bad name", a)], "id")
    with pytest.raises(ValueError):
        rrf_fuse([("a", a)], "id", k=-1)
    with pytest.raises(ValueError):
        rrf_fuse_sql([("1bad", "SELECT 1")], "id")


@pytest.mark.spark
def test_sql_twin_parity(spark):
    """The DuckDB twin must reproduce ranks, rrf_nano, rrf and
    fused_rank exactly on overlapping lists with missing items."""
    import duckdb

    a_rows = [(i, r) for r, i in enumerate([5, 3, 9, 1, 7], start=1)]
    b_rows = [(i, r) for r, i in enumerate([9, 5, 2, 8], start=1)]
    a = spark.createDataFrame(a_rows, "id long, score_rank long")
    b = spark.createDataFrame(b_rows, "id long, score_rank long")
    got = {
        (r.id, r.rank_a, r.rank_b, r.rrf_nano, r.rrf, r.fused_rank)
        for r in rrf_fuse([("a", a), ("b", b)], "id", k=60).collect()
    }
    con = duckdb.connect()

    def vals(rows):
        return " UNION ALL ".join(
            f"SELECT {i} AS id, {r} AS score_rank" for i, r in rows
        )

    sql = rrf_fuse_sql([("a", vals(a_rows)), ("b", vals(b_rows))], "id", k=60)
    want = {tuple(t) for t in con.sql(sql).fetchall()}
    assert got == want

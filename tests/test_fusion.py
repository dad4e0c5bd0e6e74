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


# ---------------------------------------------------------------------------
# top-k ranking overlap
# ---------------------------------------------------------------------------

import random as _random

from btl_bloomfilter_spark.operators.fusion import topk_overlap, topk_overlap_sql


def _brute_topk(rows, k):
    """rows: (g, id, sa, sb) — deterministic (score desc, id asc) top-k."""
    out = {}
    for g in {r[0] for r in rows}:
        items = [r for r in rows if r[0] == g and r[1] is not None
                 and (r[2] is not None or r[3] is not None)]
        def top(idx):
            key = lambda r: (-(r[idx] if r[idx] is not None else float("-inf")), r[1])
            return {r[1] for r in sorted(items, key=key)[:k]}
        n = len(items)
        keff = min(k, n)
        ov = len(top(2) & top(3))
        out[g] = (n, keff, ov, ov / (2 * keff - ov), ov / keff)
    return out


def test_topk_overlap_matches_brute(spark):
    rng = _random.Random(157)
    rows = []
    for g in ("agree", "anti"):
        for i in range(60):
            sa = rng.random()
            sb = sa + rng.gauss(0, 0.05) if g == "agree" else -sa
            rows.append((g, i, sa, sb))
    df = spark.createDataFrame(rows, "g string, id long, sa double, sb double")
    got = {r.g: r for r in topk_overlap(df, ["g"], "id", "sa", "sb", k=10).collect()}
    want = _brute_topk(rows, 10)
    for g, (n, keff, ov, jac, agr) in want.items():
        r = got[g]
        assert (r.n, r.k_eff, r.overlap) == (n, keff, ov)
        assert r.jaccard_k == jac and r.agreement_k == agr
    assert got["agree"].agreement_k > 0.6 > got["anti"].agreement_k


def test_topk_overlap_edges(spark):
    # identical scores -> full agreement; small group -> k_eff = n;
    # ties broken by id identically on both sides
    rows = [("s", i, 1.0, 1.0) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, id long, sa double, sb double")
    r = topk_overlap(df, ["g"], "id", "sa", "sb", k=10).collect()[0]
    assert (r.k_eff, r.overlap, r.jaccard_k, r.agreement_k) == (4, 4, 1.0, 1.0)
    # disjoint rankings with k < n and ZERO overlap -> left-join coalesce
    rows2 = [("d", i, float(i), float(-i)) for i in range(30)]
    df2 = spark.createDataFrame(rows2, "g string, id long, sa double, sb double")
    r2 = topk_overlap(df2, ["g"], "id", "sa", "sb", k=5).collect()[0]
    assert r2.overlap == 0 and r2.jaccard_k == 0.0


def test_topk_overlap_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = _random.Random(3)
    rows = [(g, i, rng.random(), rng.random())
            for g in ("x", "y", "z") for i in range(40)]
    pdf = pd.DataFrame(rows, columns=["g", "id", "sa", "sb"])
    p = str(tmp_path / "tk.parquet")
    pdf.to_parquet(p)
    got = (
        topk_overlap(spark.read.parquet(p), ["g"], "id", "sa", "sb", k=7)
        .orderBy("g").toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(topk_overlap_sql("t", "g", "id", "sa", "sb", k=7) + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError):
        topk_overlap(spark.read.parquet(p), ["g"], "id", "sa", "sb", k=0)


def test_topk_overlap_duplicate_ids_canonicalized(spark):
    # un-deduped (group, id) rows: max-score canonicalization keeps
    # agreement within [0, 1] (the join would otherwise fan out)
    rows = [("g", i, float(i), float(i)) for i in range(10)] * 10
    rows += [("g", 99, 100.0, 100.0)]
    df = spark.createDataFrame(rows, "g string, id long, sa double, sb double")
    r = topk_overlap(df, ["g"], "id", "sa", "sb", k=10).collect()[0]
    assert r.n == 11 and r.overlap == 10 and r.agreement_k == 1.0
    assert 0.0 <= r.jaccard_k <= 1.0

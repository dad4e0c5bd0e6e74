"""Ranking eval metrics (operators/ranking): brute parity (MRR /
hit@k / fixed-point NDCG), perfect/inverted ranking laws, NULL
semantics, summary fixed-point MRR + micro-NDCG, DuckDB twins."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.ranking import (
    _discounts,
    ranking_metrics,
    ranking_metrics_sql,
    ranking_summary,
    ranking_summary_sql,
)


def _brute(rows, k):
    """rows: (id, score, rel).  Mirrors the engines' shapes."""
    rows = [
        (i, s, int(r or 0)) for i, s, r in rows if i is not None and s == s and s is not None
    ]
    disc = _discounts(k)
    by_score = sorted(rows, key=lambda t: (-t[1], t[0]))
    by_rel = sorted(rows, key=lambda t: (-t[2], t[0]))
    n = len(rows)
    n_rel = sum(1 for *_, r in rows if r > 0)
    frr = next((i for i, t in enumerate(by_score, 1) if t[2] > 0), None)
    rr = 1.0 / float(frr) if frr else 0.0
    hit = int(any(t[2] > 0 for t in by_score[:k]))
    dcg = sum(t[2] * disc[i] for i, t in enumerate(by_score[:k]))
    idcg = sum(t[2] * disc[i] for i, t in enumerate(by_rel[:k]))
    ndcg = float(dcg) / float(idcg) if idcg > 0 else None
    return n, n_rel, frr, rr, hit, dcg, idcg, ndcg


def test_matches_brute(spark):
    rng = random.Random(162)
    rows, truth = [], {}
    for q in range(12):
        qrows = []
        for i in range(rng.randrange(3, 25)):
            rel = rng.choice([0, 0, 0, 1, 1, 2, 3])
            qrows.append((i, round(rng.random() * 10, 1), rel))
        # force score ties so the (score desc, id asc) break matters
        if len(qrows) > 4:
            qrows[1] = (qrows[1][0], qrows[0][1], qrows[1][2])
        rows += [(q, *t) for t in qrows]
        truth[q] = _brute(qrows, 5)
    df = spark.createDataFrame(rows, "q long, id long, score double, rel long")
    got = {r.q: r for r in ranking_metrics(df, ["q"], "id", "score", "rel", k=5).collect()}
    assert set(got) == set(truth)
    for q, (n, n_rel, frr, rr, hit, dcg, idcg, ndcg) in truth.items():
        r = got[q]
        assert (r.n, r.n_rel, r.first_rel_rank, r.hit_k) == (n, n_rel, frr, hit)
        assert r.rr == rr
        assert (int(r.dcg), int(r.idcg)) == (dcg, idcg)
        assert r.ndcg == ndcg


def test_ranking_laws(spark):
    # perfect ranking: score == rel order -> ndcg = 1; inverted < 1
    rows = [("perf", i, 10.0 - i, 3 - min(i, 3)) for i in range(8)]
    rows += [("inv", i, float(i), 3 - min(i, 3)) for i in range(8)]
    rows += [("none", i, float(i), 0) for i in range(4)]
    df = spark.createDataFrame(rows, "q string, id long, score double, rel long")
    got = {r.q: r for r in ranking_metrics(df, ["q"], "id", "score", "rel", k=8).collect()}
    assert got["perf"].ndcg == 1.0 and got["perf"].rr == 1.0 and got["perf"].hit_k == 1
    assert got["inv"].ndcg < 1.0 and got["inv"].first_rel_rank > 1
    assert got["none"].ndcg is None and got["none"].rr == 0.0 and got["none"].hit_k == 0
    # NULL rel is grade 0; NULL score row dropped
    rows = [("q", 1, 5.0, None), ("q", 2, None, 3), ("q", 3, 1.0, 1)]
    df2 = spark.createDataFrame(rows, "q string, id long, score double, rel long")
    r = ranking_metrics(df2, ["q"], "id", "score", "rel", k=3).collect()[0]
    assert r.n == 2 and r.n_rel == 1 and r.first_rel_rank == 2


def test_summary_fixed_point(spark):
    rows = []
    # seg a: two queries, ranks 1 and 2 -> mrr = (1 + 0.5)/2 = 0.75 exactly
    rows += [("a", 0, 1, 2.0, 1), ("a", 0, 2, 1.0, 0)]
    rows += [("a", 1, 1, 2.0, 0), ("a", 1, 2, 1.0, 1)]
    # seg b: one query, no relevant -> mrr 0, micro_ndcg NULL
    rows += [("b", 2, 1, 2.0, 0), ("b", 2, 2, 1.0, 0)]
    df = spark.createDataFrame(rows, "seg string, q long, id long, score double, rel long")
    got = {
        r.seg: r
        for r in ranking_summary(
            df, ["seg"], ["seg", "q"], "id", "score", "rel", k=2
        ).collect()
    }
    assert got["a"].queries == 2 and got["a"].hits == 2 and got["a"].hit_rate == 1.0
    assert got["a"].mrr == 0.75  # (10^18 + 5*10^17) / (2*10^18), exact
    disc = _discounts(2)
    assert got["a"].micro_ndcg == float(disc[0] + disc[1]) / float(2 * disc[0])
    assert got["b"].mrr == 0.0 and got["b"].micro_ndcg is None
    with pytest.raises(ValueError):
        ranking_summary(df, ["other"], ["seg", "q"], "id", "score", "rel")


def test_duckdb_twins(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(9)
    rows = []
    for q in range(30):
        for i in range(rng.randrange(2, 15)):
            rows.append((q, i, round(rng.random() * 5, 2), rng.choice([0, 0, 1, 2])))
    pdf = pd.DataFrame(rows, columns=["q", "id", "score", "rel"])
    p = str(tmp_path / "rk.parquet")
    pdf.to_parquet(p)
    sdf = spark.read.parquet(p)
    got = ranking_metrics(sdf, ["q"], "id", "score", "rel", k=5).orderBy("q").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(ranking_metrics_sql("t", "q", "id", "score", "rel", k=5) + " ORDER BY q").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    import pyspark.sql.functions as F

    got2 = (
        ranking_summary(
            sdf.withColumn("seg", F.col("q") % 3),
            ["seg"], ["seg", "q"], "id", "score", "rel", k=5,
        )
        .orderBy("seg")
        .toPandas()
    )
    want2 = con.sql(
        ranking_summary_sql("t", "q % 3", "seg", "q", "id", "score", "rel", k=5)
        + " ORDER BY seg"
    ).df()
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([("q", 1, 1.0, 1)], "q string, id long, score double, rel long")
    for bad in (0, 101):
        with pytest.raises(ValueError):
            ranking_metrics(df, ["q"], "id", "score", "rel", k=bad)
        with pytest.raises(ValueError):
            ranking_metrics_sql("t", "q", "id", "score", "rel", k=bad)


def test_discount_table_exactness():
    d = _discounts(10)
    assert d[0] == 10**15  # log2(2) = 1 exactly
    assert d == sorted(d, reverse=True)  # strictly decreasing discounts
    for r, v in enumerate(d, 1):
        assert v == math.floor(10**15 / math.log2(r + 1))


def test_duplicate_ids_canonicalized(spark):
    # un-deduped (query, id) rows: max-score/max-rel canonicalization
    # keeps the order total and counts each doc once (review finding)
    rows = [("q", 7, 1.0, 2), ("q", 7, 1.0, 0), ("q", 8, 0.5, 1), ("q", 8, 0.4, 1)]
    df = spark.createDataFrame(rows, "q string, id long, score double, rel long")
    r = ranking_metrics(df, ["q"], "id", "score", "rel", k=2).collect()[0]
    assert r.n == 2 and r.n_rel == 2  # two docs, not four rows
    assert r.first_rel_rank == 1  # id 7 keeps rel=2 (highest judgment)
    disc = _discounts(2)
    assert int(r.dcg) == 2 * disc[0] + 1 * disc[1]
    assert r.ndcg == 1.0  # ideal order == actual order after dedup
    # partition invariance with the tied-score duplicates present
    again = ranking_metrics(df.repartition(5), ["q"], "id", "score", "rel", k=2).collect()[0]
    assert tuple(again) == tuple(r)

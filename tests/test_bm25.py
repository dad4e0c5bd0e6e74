"""BM25 scoring: hand-computed oracle, brute-force Python oracle,
cross-engine parity, and plan shape."""

from __future__ import annotations

import math

import duckdb
import pytest

from btl_bloomfilter_spark.operators.bm25 import bm25_scores, bm25_scores_sql

pytestmark = pytest.mark.spark

DOCS = [
    (1, "spark shuffle join spark spark"),
    (2, "bloom filter bloom"),
    (3, "spark bloom hash"),
    (4, "the quick brown fox"),
    (5, ""),
    (6, None),
    (7, "SPARK Spark spark"),  # case folding
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: (t or "").lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfreq = {
        t: sum(1 for w in toks.values() if t in w) for t in terms
    }
    out = {}
    for i, w in toks.items():
        s = 0.0
        m = 0
        for t in terms:
            tf = w.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            m += 1
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if m:
            out[i] = (m, round(s, 6))
    return out


def test_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["bm25"])
        for r in bm25_scores(df, "text", "doc_id", ["spark", "bloom"]).collect()
    }
    assert got == _py_bm25(DOCS, ["spark", "bloom"])


def test_ranking_and_topn_deterministic(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    full = bm25_scores(df, "text", "doc_id", ["spark", "bloom"]).collect()
    ranks = sorted((r["score_rank"], r["doc_id"]) for r in full)
    assert [r[0] for r in ranks] == list(range(1, len(full) + 1))
    top2 = bm25_scores(df, "text", "doc_id", ["spark", "bloom"], top_n=2).collect()
    assert sorted(r["score_rank"] for r in top2) == [1, 2]
    # ties broken by id: identical docs rank adjacent, smaller id first
    dup = spark.createDataFrame(
        [(10, "spark spark"), (11, "spark spark"), (12, "other")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score_rank"] for r in bm25_scores(dup, "text", "doc_id", ["spark"]).collect()}
    assert got[10] == 1 and got[11] == 2


def test_absent_term_contributes_nothing(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = bm25_scores(df, "text", "doc_id", ["spark"]).collect()
    b = bm25_scores(df, "text", "doc_id", ["spark", "zzz_not_there"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cross_engine_parity(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.write.parquet(p)
    got = sorted(
        map(tuple, bm25_scores(df, "text", "doc_id", ["spark", "bloom", "fox"]).collect())
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = sorted(
        map(tuple, con.sql(
            bm25_scores_sql("docs", "text", "doc_id", ["spark", "bloom", "fox"])
        ).fetchall())
    )
    assert got == want and len(got) > 0


def test_plan_single_scan_and_topn_pushdown(spark):
    """Scale shape: ONE explode pass over the corpus (doc frequency
    comes from a window over the tiny tf table, not a second scan),
    the query-term filter below the first Exchange, and top_n served
    by TakeOrderedAndProject (per-partition top-k, no single-partition
    shuffle of the scored set)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = bm25_scores(df, "text", "doc_id", ["spark"], top_n=3)
    out.collect()
    # AQE toString appends "== Initial Plan ==" after the final plan;
    # count nodes in the final tree only
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert plan.count("Generate explode") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    lines = plan.splitlines()
    i_gen = next(i for i, ln in enumerate(lines) if "Generate explode" in ln)
    # the term filter is the explode's immediate parent: it runs in the
    # same map stage, before any Exchange
    assert "Filter" in lines[i_gen - 1] and "term" in lines[i_gen - 1], plan


def test_empty_query_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, "text", "doc_id", [])

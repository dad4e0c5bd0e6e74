"""TF-IDF top terms: hand-computed planted case, cross-engine parity,
plan shape (broadcast df join + WindowGroupLimit top-k)."""
import math

import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.tfidf import top_terms_tfidf, top_terms_tfidf_sql


@pytest.mark.spark
def test_tfidf_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana cherry"),
            (2, "banana banana banana cherry"),
            (3, "cherry date"),
        ],
        "doc_id long, text string",
    )
    out = top_terms_tfidf(docs, "text", "doc_id", k=2).toPandas()
    got = {
        (r.doc_id, r.term_rank): (r.term, r.tf, r.doc_freq, r.tfidf)
        for r in out.itertuples()
    }
    # doc 1: apple tf=2 (df=1) then cherry/banana tie tf=1 → rarer?
    # banana df=2, cherry df=3 → banana second
    assert got[(1, 1)][0] == "apple" and got[(1, 1)][1] == 2
    assert got[(1, 2)][0] == "banana"
    # doc 2: banana tf=3 first; cherry second
    assert got[(2, 1)][0] == "banana" and got[(2, 1)][1] == 3
    assert got[(2, 2)][0] == "cherry"
    # doc 3: date (tf=1, df=1) beats cherry (tf=1, df=3)
    assert got[(3, 1)][0] == "date" and got[(3, 2)][0] == "cherry"
    # smooth-idf formula spot check: apple in doc1
    want = round(2 * (math.log(4 / 2) + 1), 6)
    assert got[(1, 1)][3] == pytest.approx(want)


@pytest.mark.spark
def test_tfidf_cross_engine(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(3)
    vocab = ["Alpha", "beta", "GAMMA", "delta", "eps", "zeta'"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(80)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = str(tmp_path / "tf.parquet")
    pdf.to_parquet(path)

    got = (
        top_terms_tfidf(spark.read.parquet(path), "text", "doc_id", k=3)
        .toPandas().sort_values(["doc_id", "term_rank"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM '{path}'")
    want = (
        con.sql(top_terms_tfidf_sql("docs", "text", "doc_id", k=3))
        .df().sort_values(["doc_id", "term_rank"]).reset_index(drop=True)
    )
    for c in ("doc_id", "term", "tf", "doc_freq", "term_rank"):
        assert got[c].tolist() == want[c].tolist(), c
    assert got.tfidf.tolist() == pytest.approx(want.tfidf.tolist())


@pytest.mark.spark
def test_tfidf_plan_shape(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = top_terms_tfidf(docs, "text", "doc_id", k=3)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.spark
def test_tfidf_query_scores_semantics_and_twin(spark):
    """Hand-computed scores on a 4-doc corpus plus cross-engine parity
    of the SQL twin (the q107 fusion feeds on both)."""
    import math

    import duckdb

    from btl_bloomfilter_spark.operators.tfidf import (
        tfidf_query_scores,
        tfidf_query_scores_sql,
    )

    rows = [
        (1, "spark hash spark"),   # tf(spark)=2, tf(hash)=1
        (2, "hash scan"),
        (3, "nothing relevant"),
        (4, "SPARK"),              # lowercased match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           tfidf_query_scores(df, "text", "doc_id", ["spark", "hash", "scan"]).collect()}
    assert set(out) == {1, 2, 4}  # doc 3 matches nothing
    n = 4
    # fixed-point policy: per-term contributions quantized ONCE to
    # micro-longs, then summed exactly
    micro = lambda tf, dfq: math.floor(tf * (math.log((n + 1) / (dfq + 1)) + 1) * 1e6)  # noqa: E731
    # df: spark in docs {1,4} -> 2; hash in {1,2} -> 2; scan in {2} -> 1
    assert out[1].tfidf_micro == micro(2, 2) + micro(1, 2)
    assert out[2].tfidf_micro == micro(1, 2) + micro(1, 1)
    assert out[4].tfidf_micro == micro(1, 2)
    assert out[1].tfidf == out[1].tfidf_micro / 1e6
    assert out[1].n_terms_matched == 2 and out[4].n_terms_matched == 1
    assert [out[i].score_rank for i in (1, 2, 4)] == [1, 2, 3]

    con = duckdb.connect()
    vals = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows
    )
    con.sql(f"CREATE VIEW qdocs AS {vals}")
    want = con.sql(
        tfidf_query_scores_sql("qdocs", "text", "doc_id", ["spark", "hash", "scan"])
    ).fetchall()
    got = {(r.doc_id, r.n_terms_matched, r.tfidf_micro, r.tfidf, r.score_rank)
           for r in out.values()}
    assert got == {tuple(t) for t in want}

"""Corpus-level duplicated-line removal: planted boilerplate,
within-doc repeats, normalization, cross-engine parity."""

from __future__ import annotations

import duckdb
import pytest

from btl_bloomfilter_spark.operators.linededup import dedup_lines, dedup_lines_sql

pytestmark = pytest.mark.spark

BOILER = "accept all cookies to continue"
DOCS = [
    (1, f"unique alpha line\n{BOILER}\nunique beta line"),
    (2, f"{BOILER}\nsomething else entirely"),
    (3, f"ACCEPT ALL COOKIES TO CONTINUE  \nreal content here"),  # normalized dup
    (4, "only original text\nno boilerplate at all"),
    (5, BOILER),  # document that is pure boilerplate
    (6, ""),
    (7, None),
]


def _run(spark, max_count=1, normalize=True):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_lines"], r["n_kept_lines"], r["clean_text"])
        for r in dedup_lines(
            df, "text", "doc_id", max_count=max_count, normalize=normalize
        ).collect()
    }


def test_boilerplate_removed_content_kept(spark):
    got = _run(spark)
    assert got[1] == (3, 2, "unique alpha line\nunique beta line")
    assert got[2] == (2, 1, "something else entirely")
    # normalized match removes the SHOUTED variant but keeps original bytes of survivors
    assert got[3] == (2, 1, "real content here")
    assert got[4] == (2, 2, "only original text\nno boilerplate at all")
    assert got[5] == (1, 0, "")  # pure boilerplate -> empty


def test_empty_and_null_docs(spark):
    got = _run(spark)
    # '' splits to one empty line; it appears twice corpus-wide (docs 6, 7)
    # so it is itself boilerplate and removed
    assert got[6] == (1, 0, "")
    assert got[7] == (1, 0, "")


def test_max_count_threshold(spark):
    # BOILER appears 4x (docs 1,2,3-normalized,5); max_count=4 keeps it
    got = _run(spark, max_count=4)
    assert got[1][1] == 3 and BOILER in got[1][2]


def test_within_doc_repeats_count(spark):
    """A line repeated max_count+1 times inside ONE document is
    corpus-hot and removed (occurrence count, not doc frequency)."""
    df = spark.createDataFrame(
        [(1, "x\nx\nother"), (2, "unrelated")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_kept_lines"], r["clean_text"])
        for r in dedup_lines(df, "text", "doc_id", max_count=1).collect()
    }
    assert got[1] == (1, "other")


def test_no_normalize(spark):
    got = _run(spark, normalize=False)
    # exact-byte counting: doc 3's shouted variant no longer matches
    assert got[3][1] == 2


def test_order_preserved_many_lines(spark):
    text = "\n".join(f"line {i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, text), (2, "nothing shared")], "doc_id long, text string"
    ).repartition(8)
    got = dedup_lines(df, "text", "doc_id").where("doc_id = 1").collect()[0]
    assert got["clean_text"] == text


def test_cross_engine_parity(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.write.parquet(p)
    got = sorted(map(tuple, dedup_lines(df, "text", "doc_id").collect()))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = sorted(map(tuple, con.sql(dedup_lines_sql("docs", "text", "doc_id")).fetchall()))
    assert got == want and len(got) == len(DOCS)


def test_broadcast_hot_plan(spark):
    """The hot set joins broadcast (pure map on the corpus side); no
    sort-merge join of corpus-cardinality tables anywhere."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = dedup_lines(df, "text", "doc_id")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan
    assert "SortMergeJoin" not in plan, plan

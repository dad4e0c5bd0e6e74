"""Positional inverted index: brute-force phrase parity on real docs,
overlap/duplicate-term/single-term laws, case folding, plan shape."""

import re

import pytest
from pyspark.sql import functions as F

from btl_bloomfilter_spark.functions.textstats import _WS
from btl_bloomfilter_spark.operators.postings import build_postings, phrase_search


def _brute_tokens(text):
    s = re.sub(rf"^[{_WS}]+|[{_WS}]+$", "", (text or "").lower())
    return s.split() if s else []


def _brute_phrase(texts, terms):
    out = {}
    for doc, text in texts.items():
        ws = _brute_tokens(text)
        hits = [
            i
            for i in range(len(ws) - len(terms) + 1)
            if ws[i : i + len(terms)] == terms
        ]
        if hits:
            out[doc] = (len(hits), hits[0])
    return out


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").cache()


@pytest.fixture(scope="module")
def index(docs):
    return build_postings(docs, "text", "doc_id").cache()


def test_phrase_matches_brute_force_on_real_docs(spark, docs, index):
    texts = {r.doc_id: r.text for r in docs.collect()}
    for terms in (["table", "value"], ["row", "scan"], ["the"], ["never", "appears", "zz"]):
        got = {r.doc: (r.n_matches, r.first_pos) for r in phrase_search(index, terms).collect()}
        assert got == _brute_phrase(texts, terms), terms


def test_overlapping_matches_counted(spark):
    df = spark.createDataFrame([(1, "a a a a"), (2, "a b a")], "doc_id long, text string")
    idx = build_postings(df, "text", "doc_id")
    got = {r.doc: (r.n_matches, r.first_pos) for r in phrase_search(idx, ["a", "a"]).collect()}
    assert got == {1: (3, 0)}


def test_duplicate_term_phrase(spark):
    df = spark.createDataFrame(
        [(1, "the cat the dog"), (2, "the cat sat"), (3, "cat the cat the cat")],
        "doc_id long, text string",
    )
    idx = build_postings(df, "text", "doc_id")
    got = {r.doc: (r.n_matches, r.first_pos) for r in phrase_search(idx, ["the", "cat", "the"]).collect()}
    assert got == {1: (1, 0), 3: (1, 1)}
    assert got == _brute_phrase(
        {1: "the cat the dog", 2: "the cat sat", 3: "cat the cat the cat"},
        ["the", "cat", "the"],
    )


def test_case_folding_and_whitespace(spark):
    df = spark.createDataFrame([(1, "  Foo\tBAR  baz\n")], "doc_id long, text string")
    idx = build_postings(df, "text", "doc_id")
    assert phrase_search(idx, ["foo", "Bar"]).collect()[0].first_pos == 0
    assert phrase_search(idx, ["foo", "baz"]).count() == 0


def test_postings_shape(spark):
    df = spark.createDataFrame([(7, "x y x")], "doc_id long, text string")
    rows = {r.term: (list(r.positions), r.tf) for r in build_postings(df, "text", "doc_id").collect()}
    assert rows == {"x": ([0, 2], 2), "y": ([1], 1)}


def test_empty_phrase_raises(spark, index):
    with pytest.raises(ValueError, match="at least one term"):
        phrase_search(index, [])


def test_search_broadcasts_phrase_table(spark, index):
    plan = phrase_search(index, ["table", "value"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan

"""Prefix-filtering set-similarity join: exact parity with a
brute-force all-pairs Python oracle (the prefix-filter theorem made a
test), boundary thresholds, hot-token robustness, tokens_col path."""

import itertools
import random
import re

import pytest

from btl_bloomfilter_spark.operators.setjoin import prefix_similarity_join

_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")


def _tokset(text):
    if text is None:
        return set()
    t = text.strip(" \t\n\x0B\f\r")
    return set(_WS_RE.split(t)) - {""} if t else set()


def _brute(docs, t):
    out = set()
    for (ia, xa), (ib, xb) in itertools.combinations(sorted(docs.items()), 2):
        sa, sb = _tokset(xa), _tokset(xb)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if float(inter) >= t * float(union):  # same IEEE comparison as the operator
            out.add((ia, ib, inter, union))
    return out


def _run(spark, docs, t, **kw):
    df = spark.createDataFrame(list(docs.items()), "id long, text string")
    got = prefix_similarity_join(df, "text", "id", threshold=t, **kw)
    return {(r.id_a, r.id_b, r.inter_n, r.union_n) for r in got.collect()}


@pytest.mark.spark
@pytest.mark.parametrize("seed,t", [(1, 0.5), (2, 0.3), (3, 0.8), (4, 0.6), (5, 1.0)])
def test_parity_random_corpora(spark, seed, t):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]  # tiny vocab forces overlap
    docs = {
        i: " ".join(rng.choices(vocab, k=rng.randint(1, 20))) for i in range(60)
    }
    assert _run(spark, docs, t) == _brute(docs, t)


@pytest.mark.spark
def test_exact_boundary_and_identical(spark):
    docs = {
        1: "a b c d",     # vs 2: inter 2 (a b), union 4 -> exactly 0.5
        2: "a b",
        3: "x y z",
        4: "x y z",       # identical -> jaccard 1.0
        5: None,
        6: "   ",
    }
    got = _run(spark, docs, 0.5)
    assert got == _brute(docs, 0.5)
    assert (1, 2, 2, 4) in got and (3, 4, 3, 3) in got


@pytest.mark.spark
def test_hot_token_everywhere_still_exact(spark):
    # a stopword in EVERY doc — the case q06's df-cap changes the
    # universe for; prefix filtering must stay exact (the hot token
    # sorts last and leaves most prefixes)
    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(40)]
    docs = {
        i: "the " + " ".join(rng.choices(vocab, k=rng.randint(2, 12))) for i in range(50)
    }
    assert _run(spark, docs, 0.5) == _brute(docs, 0.5)


@pytest.mark.spark
def test_tokens_col_path(spark):
    rows = [(1, ["p", "q", "r"]), (2, ["p", "q", "r", "s"]), (3, ["z"]), (4, [])]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    got = prefix_similarity_join(df, "ignored", "id", threshold=0.7, tokens_col="toks")
    assert {(r.id_a, r.id_b, r.inter_n, r.union_n) for r in got.collect()} == {(1, 2, 3, 4)}


@pytest.mark.spark
def test_single_token_docs(spark):
    docs = {1: "solo", 2: "solo", 3: "other"}
    assert _run(spark, docs, 1.0) == {(1, 2, 1, 1)}


@pytest.mark.spark
@pytest.mark.parametrize("block", [1, 2, 7])
def test_chunk_blocking_exact(spark, block):
    # tiny blocks force heavy cross-chunk traffic through the
    # triangular blocking path; output must not change
    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(20)]
    docs = {i: " ".join(rng.choices(vocab, k=rng.randint(1, 18))) for i in range(50)}
    assert _run(spark, docs, 0.5, block=block) == _brute(docs, 0.5)


@pytest.mark.spark
def test_token_sets_persist_path_identical(spark):
    from btl_bloomfilter_spark.operators.setjoin import ordered_token_sets

    rng = random.Random(21)
    vocab = [f"w{i}" for i in range(25)]
    docs = {i: " ".join(rng.choices(vocab, k=rng.randint(1, 15))) for i in range(40)}
    df = spark.createDataFrame(list(docs.items()), "id long, text string")
    sets = ordered_token_sets(df, "text", "id").persist()
    try:
        via_sets = prefix_similarity_join(df, "text", "id", threshold=0.5, token_sets=sets)
        plain = prefix_similarity_join(df, "text", "id", threshold=0.5)
        key = lambda r: (r.id_a, r.id_b, r.inter_n, r.union_n)  # noqa: E731
        assert sorted(map(key, via_sets.collect())) == sorted(map(key, plain.collect()))
        # persisted single-scan path: the final plan reads the cache,
        # not the source, for every consumer
        plan = via_sets._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        sets.unpersist()


def test_threshold_validation():
    with pytest.raises(ValueError):
        prefix_similarity_join(None, "c", "id", threshold=0.0)
    with pytest.raises(ValueError):
        prefix_similarity_join(None, "c", "id", threshold=1.5)

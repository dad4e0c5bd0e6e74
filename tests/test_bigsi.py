"""BIGSI bit-sliced index: no-false-negative law vs brute containment,
theta threshold integer semantics, dense-id validation, block packing
(bit 63), sparse contract, and the broadcast probe plan."""

import pytest
from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.bigsi import (
    assign_doc_columns,
    bigsi_search,
    build_bigsi,
)

CORPUS = [
    (0, "alpha beta gamma"),
    (1, "alpha delta"),
    (2, "epsilon zeta eta"),
    (3, "beta gamma delta"),
    (4, "alpha beta gamma delta epsilon"),
    (63, "omega alpha"),          # bit 63 of block 0
    (64, "beta omega"),           # first bit of block 1
]
# fill ids to be dense 0..69
DENSE = CORPUS + [(i, f"filler{i} pad") for i in range(70) if i not in {c[0] for c in CORPUS}]


def _df(spark):
    return spark.createDataFrame(DENSE, "doc_id long, text string")


def _brute_hits(terms):
    toks = {d: set(t.split()) for d, t in DENSE}
    return {d: sum(t in s for t in terms) for d, s in toks.items()}


@pytest.fixture(scope="module")
def index(spark):
    return build_bigsi(_df(spark), "text", "doc_id", m=4096, h=3, seed=5).cache()


def test_no_false_negatives_and_theta(spark, index):
    terms = ["alpha", "beta", "gamma"]
    out = bigsi_search(index, terms, m=4096, h=3, seed=5, theta_milli=1000).toPandas()
    got = dict(zip(out.doc, out.hits))
    truth = _brute_hits(terms)
    # one-sidedness: reported hits >= true hits for every doc
    for d, t in truth.items():
        if t:
            assert got.get(d, 0) >= t, (d, t, got.get(d))
    # theta=1.0: docs 0 and 4 contain all three
    matches = set(out[out.is_match].doc)
    assert {0, 4} <= matches
    # and score arithmetic
    r0 = out[out.doc == 0].iloc[0]
    assert r0.hits == 3 and r0.n_terms == 3 and r0.score == 1.0


def test_theta_integer_boundary(spark, index):
    terms = ["alpha", "beta", "zeta"]
    # doc 0 has alpha+beta = 2/3 = 666.67 milli
    out = bigsi_search(index, terms, m=4096, h=3, seed=5, theta_milli=666).toPandas()
    assert bool(out[out.doc == 0].is_match.iloc[0])
    out = bigsi_search(index, terms, m=4096, h=3, seed=5, theta_milli=667)
    r = out.where("doc = 0").collect()[0]
    assert not r.is_match  # 2*1000 < 667*3 = 2001


def test_block_packing_bit63_and_block1(spark, index):
    out = bigsi_search(index, ["omega"], m=4096, h=3, seed=5).toPandas()
    assert {63, 64} <= set(out[out.is_match].doc)


def test_absent_term_sparse_contract(spark, index):
    out = bigsi_search(index, ["neverneverseen_zzz"], m=4096, h=3, seed=5)
    # may return FP docs, but with m=4096 over this tiny vocab the
    # expected FP count is ~0; the sparse count==h guard means no crash
    assert out.count() <= 2


def test_duplicate_and_empty_terms(spark, index):
    with pytest.raises(ValueError):
        bigsi_search(index, ["", ""], m=4096, h=3, seed=5)
    out = bigsi_search(index, ["alpha", "alpha", ""], m=4096, h=3, seed=5).toPandas()
    assert (out.n_terms == 1).all()  # dedup to the distinct term set


def test_dense_id_validation(spark):
    bad = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dense"):
        assign_doc_columns(bad, "doc_id")
    with pytest.raises(ValueError, match="m >= 64"):
        build_bigsi(_df(spark), "text", "doc_id", m=32, h=1)


def test_probe_is_broadcast_no_cartesian(spark, index):
    out = bigsi_search(index, ["alpha", "beta"], m=4096, h=3, seed=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_index_rows_bounded_by_m_times_blocks(spark, index):
    rows = index.count()
    assert rows <= 4096 * 2  # m * nblocks(=2)
    # every word is nonzero (sparse contract)
    assert index.where("word = 0").count() == 0

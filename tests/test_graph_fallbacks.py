"""r6 scale-hint fallback parity: every broadcast_*/materialize flag
added in the optimization round changes only the physical plan — the
non-default path must produce IDENTICAL rows (not just counts), on a
random graph dense enough to exercise every branch (multi-round peel,
hub ties, wedge closure).  This is the committed form of the round's
"fallback paths verified value-identical" claim."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.kcore import k_core
from btl_bloomfilter_spark.operators.labelprop import label_propagation
from btl_bloomfilter_spark.operators.linkpred import link_prediction_scores
from btl_bloomfilter_spark.operators.pagerank import pagerank_int
from btl_bloomfilter_spark.operators.triangles import canonical_edges, triangle_counts
from btl_bloomfilter_spark.operators.wminhash import weighted_signatures


@pytest.fixture(scope="module")
def rnd_edges(spark):
    rng = np.random.RandomState(77)
    n = 60
    pairs = {tuple(sorted(p)) for p in rng.randint(0, n, size=(420, 2)) if p[0] != p[1]}
    df = spark.createDataFrame([(int(a), int(b)) for a, b in sorted(pairs)], "s long, d long")
    return canonical_edges(df, "s", "d").persist()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pagerank_broadcast_ranks_parity(spark, rnd_edges):
    a = pagerank_int(rnd_edges.selectExpr("u as src", "v as dst"), iters=4)
    b = pagerank_int(
        rnd_edges.selectExpr("u as src", "v as dst"), iters=4, broadcast_ranks=False
    )
    ra, rb = _rows(a), _rows(b)
    a.unpersist()
    b.unpersist()
    assert ra == rb


def test_labelprop_broadcast_labels_parity(spark, rnd_edges):
    assert _rows(label_propagation(rnd_edges, rounds=3)) == _rows(
        label_propagation(rnd_edges, rounds=3, broadcast_labels=False)
    )


def test_kcore_broadcast_survivors_parity(spark, rnd_edges):
    a = k_core(rnd_edges, k=5)
    b = k_core(rnd_edges, k=5, broadcast_survivors=False)
    ra, rb = _rows(a), _rows(b)
    a.unpersist()
    b.unpersist()
    assert ra == rb
    assert ra  # k=5 keeps a core on this graph — both branches exercised


def test_linkpred_flags_parity(spark, rnd_edges):
    base = _rows(link_prediction_scores(rnd_edges))
    assert base == _rows(link_prediction_scores(rnd_edges, broadcast_deg=False))
    assert base == _rows(
        link_prediction_scores(rnd_edges, materialize=False, broadcast_deg=False)
    )


def test_triangles_materialize_parity(spark, rnd_edges):
    assert _rows(triangle_counts(rnd_edges)) == _rows(
        triangle_counts(rnd_edges, materialize=False)
    )


def test_wminhash_broadcast_vocab_parity(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} tok{i % 3} shared fin{i}") for i in range(40)],
        "doc_id long, text string",
    )
    a = _rows(weighted_signatures(docs, "text", "doc_id", num_perm=8, cap=3, seed=5))
    b = _rows(
        weighted_signatures(
            docs, "text", "doc_id", num_perm=8, cap=3, seed=5, broadcast_vocab=False
        )
    )
    assert a == b

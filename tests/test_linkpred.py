"""Link-prediction scores: brute parity (CN / Jaccard / nano-AA) on
random graphs, adjacency exclusion, hub-cap semantics, min_support
co-occurrence pruning, contract errors."""

import collections
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.linkpred import link_prediction_scores
from btl_bloomfilter_spark.operators.triangles import (
    canonical_edges,
    cooccurrence_edges,
)


def _brute(edges, max_center_degree=None):
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    eset = {(min(u, v), max(u, v)) for u, v in edges}
    scores = {}
    for w, nbrs in adj.items():
        if len(nbrs) < 2:
            continue
        if max_center_degree is not None and len(nbrs) > max_center_degree:
            continue
        aa = math.floor(1e9 / math.log(len(nbrs)))
        ns = sorted(nbrs)
        for i, a in enumerate(ns):
            for b in ns[i + 1:]:
                if (a, b) in eset:
                    continue
                cn, aan = scores.get((a, b), (0, 0))
                scores[(a, b)] = (cn + 1, aan + aa)
    return {
        (a, b): (cn, len(adj[a]), len(adj[b]), aan, cn / (len(adj[a]) + len(adj[b]) - cn))
        for (a, b), (cn, aan) in scores.items()
    }


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "s long, d long")
    out = link_prediction_scores(canonical_edges(df, "s", "d"), **kw).collect()
    return {
        (r.a, r.b): (r.cn, r.deg_a, r.deg_b, int(r.aa_nano), r.jaccard) for r in out
    }


def test_brute_parity_random(spark):
    rng = np.random.default_rng(139)
    edges = list(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, 60, size=(200, 2))
            if a != b
        }
    )
    got = _run(spark, edges)
    want = _brute(edges)
    assert got == want
    assert len(got) > 50  # the random graph actually exercises the path


def test_adjacent_pairs_excluded_and_wedge_only(spark):
    # triangle 1-2-3 plus pendant 4-1: (2,3) adjacent -> excluded;
    # (2,4) and (3,4) share center 1 -> scored; (u, far) no common -> absent
    edges = [(1, 2), (1, 3), (2, 3), (1, 4), (5, 6)]
    got = _run(spark, edges)
    want = _brute(edges)
    assert got == want
    assert (2, 3) not in got
    assert (2, 4) in got and (3, 4) in got
    assert all((5, x) not in got and (x, 6) not in got for x in range(1, 5))


def test_hub_cap_drops_center_but_keeps_degree(spark):
    # star center 0 with leaves 1..5, plus edge 1-2's wedge via 0 only
    edges = [(0, i) for i in range(1, 6)]
    capped = _run(spark, edges, max_center_degree=4)
    assert capped == {}  # the only center (deg 5) is capped away
    full = _run(spark, edges)
    assert full == _brute(edges)
    # degrees in the uncapped run reflect the full graph
    assert full[(1, 2)][1:3] == (1, 1)


def test_cooccurrence_min_support(spark):
    rows = [
        ("g1", 1), ("g1", 2), ("g1", 3),
        ("g2", 1), ("g2", 2),
        ("g3", 1), ("g3", 2), ("g3", 4),
    ]
    df = spark.createDataFrame(rows, "g string, item long")
    all_pairs = {
        (r.u, r.v) for r in cooccurrence_edges(df, "g", "item").collect()
    }
    assert all_pairs == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}
    sup2 = {
        (r.u, r.v)
        for r in cooccurrence_edges(df, "g", "item", min_support=2).collect()
    }
    assert sup2 == {(1, 2)}  # only pair 1-2 co-occurs in >= 2 groups
    with pytest.raises(ValueError, match="min_support"):
        cooccurrence_edges(df, "g", "item", min_support=0)


def test_linkpred_contract_errors(spark):
    df = spark.createDataFrame([(1, 2)], "s long, d long")
    with pytest.raises(ValueError, match="max_center_degree"):
        link_prediction_scores(canonical_edges(df, "s", "d"), max_center_degree=1)

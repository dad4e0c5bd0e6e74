"""k-core peeling: hand graphs, cascade depth, brute-force parity on
random graphs, empty-core and degenerate-k behavior."""

import collections
import itertools

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.kcore import k_core
from btl_bloomfilter_spark.operators.triangles import canonical_edges


def _brute(edges, k):
    adj = collections.defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    while True:
        weak = [n for n, s in adj.items() if len(s) < k]
        if not weak:
            break
        for n in weak:
            for m in adj[n]:
                if m in adj:
                    adj[m].discard(n)
            del adj[n]
    return {n: len(s) for n, s in adj.items()}


def _run(spark, edges, k):
    df = spark.createDataFrame(edges, "s long, d long")
    out = k_core(canonical_edges(df, "s", "d"), k)
    got = {r.node: r.core_deg for r in out.collect()}
    out.unpersist()
    return got


def test_k5_with_pendant_chain(spark):
    # K5 survives k=3 intact; the chain hanging off node 0 peels away
    k5 = list(itertools.combinations(range(5), 2))
    chain = [(0, 10), (10, 11), (11, 12)]
    got = _run(spark, k5 + chain, 3)
    assert got == {n: 4 for n in range(5)}


def test_path_graph_multi_round_cascade(spark):
    # a path at k=2 peels strictly from both ends, one layer per
    # round — exercises many-round convergence + lineage truncation
    path = [(i, i + 1) for i in range(12)]
    assert _run(spark, path, 2) == {}
    # closing the cycle makes every node degree-2: all survive
    got = _run(spark, path + [(12, 0)], 2)
    assert got == {n: 2 for n in range(13)}


def test_inner_core_after_cascade(spark):
    # two K4s joined through a degree-2 relay node: at k=3 the relay
    # peels (deg 2 < 3) and both K4 cores survive with their internal
    # degrees; a DIRECT bridge (0, 10) stays — both endpoints then
    # hold degree 4 >= k, so the core keeps it
    a = list(itertools.combinations(range(4), 2))
    b = list(itertools.combinations(range(10, 14), 2))
    got = _run(spark, a + b + [(0, 20), (20, 10)], 3)
    assert got == {**{n: 3 for n in range(4)}, **{n: 3 for n in range(10, 14)}}
    got2 = _run(spark, a + b + [(0, 10)], 3)
    assert got2 == {0: 4, 10: 4, **{n: 3 for n in (1, 2, 3, 11, 12, 13)}}


def test_empty_when_k_exceeds_degeneracy(spark):
    k5 = list(itertools.combinations(range(5), 2))
    assert _run(spark, k5, 5) == {}


def test_k1_keeps_every_non_isolated_node(spark):
    got = _run(spark, [(1, 2), (3, 4)], 1)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_invalid_k_raises(spark):
    df = spark.createDataFrame([(1, 2)], "s long, d long")
    with pytest.raises(ValueError):
        k_core(canonical_edges(df, "s", "d"), 0)


def test_max_rounds_guard(spark):
    path = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(path, "s long, d long")
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(canonical_edges(df, "s", "d"), 2, max_rounds=2)


@pytest.mark.parametrize("seed,k", [(3, 3), (7, 4), (21, 5)])
def test_random_graph_parity(spark, seed, k):
    rng = np.random.default_rng(seed)
    edges = [
        tuple(int(x) for x in sorted(rng.choice(35, 2, replace=False)))
        for _ in range(220)
    ]
    assert _run(spark, edges, k) == _brute(edges, k)


def test_max_rounds_failure_releases_round_cache(spark):
    # non-convergence must not leak the last round's persisted degree
    # table into the session (review finding).  localCheckpoint RDDs
    # are reaped asynchronously by the ContextCleaner, so the exact
    # count can't be pinned — but deg's unpersist is SYNCHRONOUS, so
    # the growth must be at most the 3 checkpoints (initial alive + 2
    # rounds at max_rounds=2); a leaked deg would make it 4.
    path = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(path, "s long, d long")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(canonical_edges(df, "s", "d"), 2, max_rounds=2)
    assert jsc.getPersistentRDDs().size() - before <= 3

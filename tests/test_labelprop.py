"""Synchronous LPA: brute-force parity on random graphs, hand graphs
(barbell keeps two communities), determinism under repartitioning,
round-0 identity, contract errors."""

import collections

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.labelprop import label_propagation
from btl_bloomfilter_spark.operators.triangles import canonical_edges


def _brute(edges, rounds):
    adj = collections.defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            counts = collections.Counter(labels[m] for m in nbrs)
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    return labels


def _run(spark, edges, rounds, parts=None):
    df = spark.createDataFrame(edges, "s long, d long")
    e = canonical_edges(df, "s", "d")
    if parts is not None:
        e = e.repartition(parts)
    return {r.node: r.label for r in label_propagation(e, rounds).collect()}


def test_barbell_two_communities(spark):
    # two 4-cliques joined by one bridge edge: LPA must NOT merge them
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = c1 + c2 + [(3, 10)]
    got = _run(spark, edges, rounds=3)
    assert got == _brute(edges, 3)
    left = {got[n] for n in range(4)}
    right = {got[n] for n in range(10, 14)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_round_zero_identity(spark):
    edges = [(1, 2), (2, 3)]
    assert _run(spark, edges, 0) == {1: 1, 2: 2, 3: 3}


@pytest.mark.parametrize("rounds", [1, 2, 4])
def test_brute_parity_random(spark, rounds):
    rng = np.random.default_rng(136 + rounds)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 40, size=(160, 2))
        if a != b
    ]
    assert _run(spark, edges, rounds) == _brute(edges, rounds)


def test_partitioning_invariant(spark):
    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 30, size=(120, 2))
        if a != b
    ]
    assert _run(spark, edges, 3, parts=1) == _run(spark, edges, 3, parts=13)


def test_negative_rounds_raises(spark):
    df = spark.createDataFrame([(1, 2)], "s long, d long")
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(canonical_edges(df, "s", "d"), -1)

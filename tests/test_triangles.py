"""Triangle counting: hand graphs, brute-force parity on random
graphs, orientation exactness (each triangle once), skew (star) and
edge-case behavior."""

import itertools

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.triangles import (
    canonical_edges,
    cooccurrence_edges,
    triangle_counts,
)


def _brute(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _run(spark, edges):
    df = spark.createDataFrame(edges, "s long, d long")
    out = triangle_counts(canonical_edges(df, "s", "d"))
    return {r.node: r.triangles for r in out.collect()}


def test_single_triangle(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_k4_and_duplicates_and_loops(spark):
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (0, 1)]  # dups/reversed/loop
    got = _run(spark, noisy)
    # K4: each node is in C(3,2)=3 triangles
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_star_has_no_triangles(spark):
    got = _run(spark, [(0, i) for i in range(1, 30)])
    assert got == {}


def test_star_plus_rim_skew(spark):
    # hub 0 connected to all; rim cycle edges create exactly one
    # triangle per rim edge
    rim = [(i, i + 1) for i in range(1, 10)]
    got = _run(spark, [(0, i) for i in range(1, 11)] + rim)
    brute = _brute([(0, i) for i in range(1, 11)] + rim)
    assert got == brute
    assert got[0] == len(rim)


def test_random_graph_parity(spark):
    rng = np.random.default_rng(5)
    edges = [tuple(sorted(rng.choice(40, 2, replace=False))) for _ in range(300)]
    got = _run(spark, [(int(a), int(b)) for a, b in edges])
    assert got == _brute(edges)


def test_broadcast_adj_parity(spark):
    # broadcast_adj changes only the physical plan, never the counts
    rng = np.random.default_rng(11)
    edges = [tuple(int(x) for x in sorted(rng.choice(30, 2, replace=False))) for _ in range(200)]
    df = spark.createDataFrame(edges, "s long, d long")
    ce = canonical_edges(df, "s", "d")
    plain = {r.node: r.triangles for r in triangle_counts(ce).collect()}
    bcast = {r.node: r.triangles for r in triangle_counts(ce, broadcast_adj=True).collect()}
    assert plain == bcast == _brute(edges)


def test_cooccurrence_edges_matches_selfjoin(spark):
    # (group, item) memberships incl. duplicates within a group; the
    # in-array expansion must equal the textbook distinct self-join
    rng = np.random.default_rng(13)
    rows = [(int(rng.integers(0, 25)), int(rng.integers(0, 40))) for _ in range(400)]
    df = spark.createDataFrame(rows, "g long, it long")
    got = {(r.u, r.v) for r in cooccurrence_edges(df, "g", "it").collect()}
    want = set()
    groups = {}
    for g, it in rows:
        groups.setdefault(g, set()).add(it)
    for items in groups.values():
        want |= {tuple(sorted(p)) for p in itertools.combinations(items, 2)}
    assert got == want


def test_cooccurrence_max_group_size_cap(spark):
    rows = [(0, i) for i in range(10)] + [(1, 0), (1, 1), (1, 2)]
    df = spark.createDataFrame(rows, "g long, it long")
    got = {(r.u, r.v) for r in cooccurrence_edges(df, "g", "it", max_group_size=5).collect()}
    assert got == {(0, 1), (0, 2), (1, 2)}  # hub group 0 dropped


def test_global_count_law(spark):
    rng = np.random.default_rng(9)
    edges = [tuple(int(x) for x in sorted(rng.choice(25, 2, replace=False))) for _ in range(150)]
    got = _run(spark, edges)
    brute = _brute(edges)
    assert sum(got.values()) == sum(brute.values())
    assert sum(got.values()) % 3 == 0

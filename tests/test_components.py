"""connected_components: parity with a brute-force union-find on
random graphs, structured worst cases (chains force many label hops —
the case naive propagation handles in O(diameter)), and the
cluster_assign / cluster_representatives policies."""

import random

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.components import (
    cluster_assign,
    cluster_representatives,
    connected_components,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_components(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    rows = connected_components(df).collect()
    got = {r["node"]: r["component"] for r in rows}
    assert len(rows) == len(got), "duplicate node rows"
    return got


def test_chain_star_clique(spark):
    # chain 0-1-2-...-9 (worst case for naive propagation), star, clique,
    # plus an isolated pair and a self-loop (ignored)
    edges = (
        [(i, i + 1) for i in range(9)]
        + [(100, x) for x in (101, 102, 103)]
        + [(a, b) for a in (200, 201, 202) for b in (200, 201, 202) if a < b]
        + [(300, 301), (400, 400)]
    )
    got = _spark_components(spark, edges)
    assert {got[i] for i in range(10)} == {0}
    assert {got[x] for x in (100, 101, 102, 103)} == {100}
    assert {got[x] for x in (200, 201, 202)} == {200}
    assert got[300] == got[301] == 300
    assert 400 not in got  # self-loop only → no edges → absent


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(20, 120)
        m = rng.randint(10, 3 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]]
        want = _uf_components(edges)
        got = _spark_components(spark, edges)
        assert got == want, f"trial {trial}: mismatch"


def test_reversed_and_duplicated_edges_same_result(spark):
    edges = [(1, 2), (3, 2), (5, 4), (7, 6), (6, 5)]
    fwd = _spark_components(spark, edges)
    rev = _spark_components(spark, [(b, a) for a, b in edges] + edges + edges)
    assert fwd == rev == _uf_components(edges)


def test_cluster_assign_and_representatives(spark):
    df = spark.createDataFrame(
        [(i, float(q)) for i, q in [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (9, 0.7)]],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    assigned = cluster_assign(df, pairs, "doc_id")
    comp = {r["doc_id"]: r["component"] for r in assigned.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 4, 9: 9}  # singletons keep own id

    # min-id policy
    reps = {
        r["component"]: (r["rep_id"], r["cluster_size"])
        for r in cluster_representatives(assigned, "doc_id").collect()
    }
    assert reps == {1: (1, 3), 4: (4, 1), 9: (9, 1)}

    # quality policy: 2 and 3 tie at 0.9 → smaller id wins
    reps_q = {
        r["component"]: r["rep_id"]
        for r in cluster_representatives(assigned, "doc_id", quality_col="quality").collect()
    }
    assert reps_q == {1: 2, 4: 4, 9: 9}


def test_string_ids_quality_policy(spark):
    """Quality-based representatives must work with STRING ids
    (conv_id / doc hashes): the tie-break negates the numeric quality,
    never the id — negating a string id throws under ANSI mode."""
    df = spark.createDataFrame(
        [("a", 0.5), ("b", 0.9), ("c", 0.9), ("z", 0.1)],
        "doc_id string, quality double",
    )
    pairs = spark.createDataFrame([("a", "b"), ("b", "c")], "id_a string, id_b string")
    assigned = cluster_assign(df, pairs, "doc_id")
    reps = {
        r["component"]: r["rep_id"]
        for r in cluster_representatives(assigned, "doc_id", quality_col="quality").collect()
    }
    # b and c tie at 0.9 -> smaller id wins; z is a singleton
    assert reps == {"a": "b", "z": "z"}


def test_recluster_existing_component_column(spark):
    """cluster_assign over a frame that already carries a 'component'
    column (re-clustering a prior assignment) must not hit an
    ambiguous-reference error and must overwrite with the new labels."""
    df = spark.createDataFrame(
        [(1, 99), (2, 99), (3, 99)], "doc_id long, component long"
    )
    pairs = spark.createDataFrame([(2, 3)], "id_a long, id_b long")
    got = {r["doc_id"]: r["component"] for r in cluster_assign(df, pairs, "doc_id").collect()}
    assert got == {1: 1, 2: 2, 3: 2}


def test_null_keys_dropped(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "id_a long, id_b long"
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1}

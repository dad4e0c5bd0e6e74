"""Deterministic random walks over a canonical edge set.

Random-walk sampling is the standard context generator for graph
embeddings (DeepWalk, Perozzi et al. KDD'14; node2vec, Grover &
Leskovec KDD'16) and a cheap neighborhood summarizer for co-occurrence
graphs.  A seeded PRNG walk is partition- and schedule-dependent in a
distributed engine; this variant replaces the PRNG with the library's
content hash: from walk w at node u on step t, the next node is

    argmin over neighbors v of  (hash60(seed|w|t|v), v)

— a pure function of (walk, step, candidate), so the walk is
deterministic under any partitioning, replayable in SQL (q132's
oracle unrolls the steps), and still hash-uniform over the
neighborhood (each step re-keys on t, so walks don't freeze into
fixed per-node successors; two walks meeting at the same node at
different steps diverge).

100-TB shape: one step = one equi-join of the frontier against the
adjacency list plus a per-walk WindowGroupLimit argmin — the frontier
is (walks) rows, never graph-sized, and the join is broadcast when
the frontier is small.  Lineage is truncated per step (the iterative
DataFrame trap, same discipline as kcore/components/pagerank).  Dead
ends simply end the walk (the inner join drops it) — with a
symmetric adjacency every edge endpoint has degree >= 1, so walks on
co-occurrence graphs never die.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.splits import _hash60

__all__ = ["deterministic_walks", "walk_context_pairs"]


def deterministic_walks(
    edges: DataFrame, n_walks: int, steps: int, *, seed: int | str = 0
) -> DataFrame:
    """(walk, step, node) — ``n_walks`` walks of up to ``steps`` steps
    over a canonical (u, v) edge set (see triangles.canonical_edges /
    cooccurrence_edges).  Walk ids are the start node ids; starts are
    the ``n_walks`` nodes with the smallest (hash60(seed|node), node)
    — content-keyed like the k-means init, so starts are deterministic
    and spread."""
    if steps < 0:
        raise ValueError(f"steps must be >= 0, got {steps}")
    if n_walks < 1:
        raise ValueError(f"n_walks must be >= 1, got {n_walks}")
    from pyspark.sql import Window

    # Materialize the adjacency as per-node neighbor LISTS, once: the
    # per-step join then scans one row per NODE instead of one row per
    # directed edge (r6 — the former per-step broadcast join probed a
    # 32-entry hash table against the full 2|E|-row cached adjacency,
    # every step).  collect_list order is partition-dependent, but
    # every consumer reduces over the neighbor SET (hash argmin), so
    # values are order-invariant.  The eager checkpoint doubles as the
    # lineage cut the old persist provided.  Scale caveat: unlike
    # triangles' adjacency arrays (orientation-bounded at O(sqrt|E|)
    # elements), the SYMMETRIC list of a hub node is its full degree
    # in one row — fine for the co-occurrence graphs this serves
    # (group-size-capped upstream), but a graph with multi-million-
    # degree hubs should cap degree (cooccurrence_edges
    # max_group_size=) or revert to the row-per-edge join shape.
    from .triangles import symmetric_adjacency

    adjl = (
        symmetric_adjacency(edges)
        .groupBy("u")
        .agg(F.collect_list("v").alias("__nbrs"))
        .localCheckpoint(eager=True)
    )
    nodes = adjl.select(F.col("u").alias("node"))  # one row per node already
    starts = (
        nodes.withColumn("__h", _hash60(["node"], seed))
        .orderBy("__h", "node")
        .limit(n_walks)
        .select(F.col("node").alias("walk"), "node")
    )
    cur = starts.withColumn("step", F.lit(0)).localCheckpoint(eager=True)
    out = [cur]
    for t in range(1, steps + 1):
        cand = (
            F.broadcast(cur.select("walk", "node"))  # frontier is walk-count-sized
            .join(adjl, cur["node"] == adjl["u"])
            .select("walk", F.explode("__nbrs").alias("node"))
        )
        h = _hash60(["walk", "__t", "node"], seed)
        w = Window.partitionBy("walk").orderBy("__hh", "node")
        nxt = (
            cand.withColumn("__t", F.lit(t))
            .withColumn("__hh", h)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("walk", "node", F.lit(t).alias("step"))
            .localCheckpoint(eager=True)
        )
        out.append(nxt)
        cur = nxt
    acc = out[0]
    for df in out[1:]:
        acc = acc.unionAll(df)
    return acc.select("walk", "step", "node")


def walk_context_pairs(walks: DataFrame, window: int) -> DataFrame:
    """(a, b, cnt) — skip-gram co-occurrence pairs from a (walk, step,
    node) table: every unordered node pair appearing within ``window``
    steps on the same walk, canonicalized a < b, counted with
    multiplicity.  This is DeepWalk/node2vec's corpus-generation step
    (the pairs feed any embedding trainer); self-pairs from a walk
    revisiting a node inside the window are dropped (a != b).

    Plan: a self-equi-join on walk with a bounded step-range predicate
    — walk tables are (n_walks × steps) rows, frontier-scale, so this
    is a small-table join regardless of graph size; the count groupBy
    map-side combines."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    a, b = walks.alias("a"), walks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.walk") == F.col("b.walk"))
            & (F.col("b.step") > F.col("a.step"))
            & (F.col("b.step") <= F.col("a.step") + window),
        )
        .select(
            F.least("a.node", "b.node").alias("a"),
            F.greatest("a.node", "b.node").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
    )

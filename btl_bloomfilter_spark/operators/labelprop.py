"""Synchronous label propagation communities over a canonical edge set.

Label propagation (Raghavan et al., Phys. Rev. E 2007) is the cheap
community detector for co-occurrence graphs — near-linear per round,
no objective function, no parameters beyond the round count — and the
standard precursor to corpus-level community screens (topical duplicate
groups, spam rings, tool-usage cliques) where modularity solvers are
too expensive.  Complements the existing graph suite: `components`
(connectivity), `kcore` (cohesion), `triangles` (local density),
`pagerank` (centrality), `walks` (embedding corpus).

The textbook algorithm is sequentially order-dependent (labels update
in a random node order); a distributed engine cannot honour a node
order without serializing.  This variant is the SYNCHRONOUS schedule
with a deterministic tie-break, the same determinism contract as
`walks.deterministic_walks`:

  * every node starts labeled with its own id;
  * each round, every node simultaneously adopts the most frequent
    label among its NEIGHBORS' current labels, ties broken toward the
    smallest label — a pure function of the previous round's labels,
    so the result is partitioning- and schedule-independent and
    replays exactly in SQL (q136's oracle unrolls the rounds);
  * the round count is FIXED (a parameter), not run to convergence:
    synchronous LPA can oscillate on bipartite-ish structures (the
    known 2-cycle failure mode), so "converged" is not well-defined —
    a fixed round budget is the honest deterministic contract, and in
    practice 3-5 rounds settle the label landscape on heavy-tailed
    co-occurrence graphs.

100-TB shape per round: ONE vote expansion (edge-sized equi-join of
the symmetric adjacency against the current label table, on the node
key), ONE map-side-combined (node, label) count aggregation, and ONE
per-node WindowGroupLimit argmax (row_number over count desc, label
asc — Spark rewrites the rn=1 filter to a group-limit, no full sort
materialization).  Nothing is ever neighbor-LIST shaped, so a hot hub
costs a skewed aggregate, not an exploded array.  Lineage is
truncated every round with eager ``localCheckpoint`` (the iterative
DataFrame trap; same discipline as components/kcore/pagerank/walks),
and the symmetric adjacency is persisted for the loop and released in
a ``finally`` (every round's join AND checkpoint would otherwise
re-execute the upstream edge construction — for a co-occurrence graph
that is the quadratic pair expansion).

Reference relation: btl_bloomfilter stops at membership sketches;
this serves SURVEY's LLM-pipeline graph axis (community screens over
near-dup / co-occurrence graphs built from its fingerprints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["label_propagation"]


def label_propagation(edges: DataFrame, rounds: int) -> DataFrame:
    """(node, label) — community labels after ``rounds`` synchronous
    label-propagation rounds over a canonical (u, v) edge set (see
    `triangles.canonical_edges` / `cooccurrence_edges`).

    Labels are node ids (long); a community's label is therefore one
    of its members' ids.  ``rounds=0`` returns the identity labeling
    of every node appearing in an edge.  Isolated nodes (absent from
    the edge set) are absent from the output — same node-universe
    contract as the rest of the graph suite.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    from pyspark.sql import Window

    from .triangles import symmetric_adjacency

    adj = symmetric_adjacency(edges).persist()
    try:
        labels = (
            adj.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=True)
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
        for _ in range(rounds):
            votes = (
                adj.join(
                    labels.withColumnRenamed("node", "v"), "v"
                )  # neighbor v's current label, counted at u
                .select(F.col("u").alias("node"), "label")
            )
            labels = (
                votes.groupBy("node", "label")
                .agg(F.count("*").alias("c"))
                .withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .select("node", "label")
                .localCheckpoint(eager=True)
            )
    finally:
        adj.unpersist()
    return labels

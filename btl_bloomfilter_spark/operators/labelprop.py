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

100-TB shape per round: ONE vote expansion (edge-sized BROADCAST
equi-join of the symmetric adjacency against the node-sized current
label table — the adjacency itself never crosses an exchange), ONE
map-side-combined (node, label) count aggregation, and ONE per-node
argmax expressed as min(struct(-count, label)) — a second two-level
aggregation with map-side partial combine (count desc, label asc ==
(-c, label) asc; replaces the former row_number window, which cost an
extra exchange plus a per-node sort).  Nothing is ever neighbor-LIST
shaped, so a hot hub
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


def label_propagation(
    edges: DataFrame, rounds: int, *, broadcast_labels: bool = True
) -> DataFrame:
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
    from .triangles import symmetric_adjacency

    # hash-partition the adjacency by u ONCE: the per-round vote join
    # broadcasts the label side (streamed-side partitioning survives),
    # and HashPartitioning(u=node) satisfies the clustering of BOTH
    # downstream aggregates — groupBy(node, label) and groupBy(node) —
    # so every round runs exchange-free (one setup shuffle buys
    # 2·rounds exchanges of the edge-sized vote stream; r6 plan audit)
    adj = symmetric_adjacency(edges).repartition("u").persist()
    try:
        labels = (
            adj.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=True)
        )
        maybe_b = F.broadcast if broadcast_labels else (lambda d: d)
        for _ in range(rounds):
            votes = (
                # the label table is node-sized (one row per node) while
                # adj is edge-sized: broadcast the small side so the
                # per-round join never exchanges the adjacency (r6: the
                # vote join was a per-round sort-merge of the full
                # adjacency before this hint).  broadcast_labels=False
                # for graphs whose node table exceeds executor memory.
                adj.join(
                    maybe_b(labels.withColumnRenamed("node", "v")), "v"
                )  # neighbor v's current label, counted at u
                .select(F.col("u").alias("node"), "label")
            )
            # argmax(count desc, label asc) == min over (-c, label):
            # both levels take map-side partial aggregation, replacing
            # the former row_number window (an extra exchange + full
            # per-node sort) with a plain min; the (-c, label) struct
            # is unique per (node, label) row, so the pick is exactly
            # the window's rn=1 row — values identical, pinned by the
            # q136 oracle and the brute tests
            labels = (
                votes.groupBy("node", "label")
                .agg(F.count("*").alias("c"))
                .groupBy("node")
                .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("label"))).alias("__m"))
                .select("node", F.col("__m.label").alias("label"))
                .localCheckpoint(eager=True)
            )
    finally:
        adj.unpersist()
    return labels

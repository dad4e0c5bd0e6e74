"""k-core decomposition (fixed k) by iterative peeling.

The k-core is the maximal subgraph in which every node has degree
>= k — the standard pre-clustering cleanup for co-occurrence graphs
(drop weakly-attached leaves/spam/bot tendrils so community passes and
triangle screens run on the cohesive interior; Seidman 1983, Batagelj-
Zaversnik 2003).  Complements the existing graph suite: `components`
(connectivity), `pagerank` (centrality), `triangles` (local density).

Algorithm: peel to fixpoint — drop every node with degree < k,
recompute degrees over the surviving edges, repeat until no node is
weak.  The fixpoint is ORDER-INDEPENDENT (peeling is confluent: a node
weak now stays weak under further deletions), so the distributed
round-synchronous schedule and any sequential schedule produce the
same core; q124's oracle exploits this with an unrolled round-by-round
CTE in DuckDB.

100-TB shape per round: ONE degree aggregation (union of the two edge
endpoints, map-side combined) over the once-materialized edge table
filtered by TWO broadcast semi-joins against the latest survivor set.
Lineage is truncated every round with eager ``localCheckpoint`` of
the NODE-sized survivor set only (the iterative-DataFrame trap; same
discipline as `components`/`pagerank`) — r5 checkpointed a fresh
|E|-row edge table per round, which dominated the entry; the
monotone-survivor filter derives the same peeled subgraph from the
static edge table for a |V|-sized checkpoint instead.  For graphs
whose survivor set exceeds executor broadcast memory, drop the
broadcast hint (the semi-joins plan as exchanges; same rows).  Rounds are data-dependent but bounded by
the peel depth, which for heavy-tailed co-occurrence graphs is small
(5 at k=80 on the sf0.01 part graph); ``max_rounds`` turns a
pathological chain into a loud error instead of a silent half-peel.

Reference relation: btl_bloomfilter stops at membership; this serves
SURVEY's LLM-pipeline graph-cleanup axis alongside
`triangles.triangle_counts`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["k_core"]


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 200,
    *,
    broadcast_survivors: bool = True,
) -> DataFrame:
    """(node, core_deg) — nodes of the k-core of a canonical (u, v)
    edge set (see `triangles.canonical_edges` / `cooccurrence_edges`),
    with each node's degree INSIDE the core subgraph (>= k by the
    fixpoint; empty DataFrame when the whole graph peels away).

    ``broadcast_survivors`` (default True) broadcasts the node-sized
    survivor set into the per-round semi-joins so the static edge
    table never crosses an exchange; set False for graphs whose
    survivor set exceeds executor broadcast memory (the semi-joins
    fall back to planner-chosen exchanges — same rows, same fixpoint;
    the escape hatch every broadcast-hinted graph operator here
    carries: pagerank ``broadcast_ranks``, labelprop
    ``broadcast_labels``, linkpred ``broadcast_deg``).

    The returned DataFrame is persisted (it is the final round's
    degree table, already materialized by the convergence check);
    caller should ``.unpersist()`` it when done.  All intermediate
    round state is released internally.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # The edge set is materialized ONCE; each round's surviving
    # subgraph is re-derived from it by filtering on the (node-sized,
    # monotonically shrinking) survivor set instead of checkpointing a
    # new |E|-row table per round (the r5 shape — the per-round edge
    # materialization dominated the entry).  Equivalence: survivors
    # shrink monotonically, so "both endpoints in the latest survivor
    # set" IS the peeled edge set of the synchronous schedule — the
    # same fixpoint row for row.  The survivor checkpoint is |V|-sized
    # (cheap); the semi-joins broadcast it so the edge table never
    # crosses an exchange.
    from .triangles import symmetric_adjacency

    # Both orientations, hash-partitioned by u, materialized ONCE: the
    # per-u row count of the symmetric view IS the degree, and
    # HashPartitioning(u) satisfies the degree aggregation's
    # clustering, so every round runs EXCHANGE-FREE — two broadcast
    # semi-joins (filters preserve partitioning) + one in-partition
    # count (r6; the r5 shape checkpointed a fresh |E|-row edge table
    # per round and shuffled a degree union).
    adj = symmetric_adjacency(edges.select("u", "v")).repartition("u").persist()
    alive = adj
    deg = None
    for _ in range(max_rounds):
        prev_deg = deg
        deg = (
            alive.groupBy(F.col("u").alias("node"))
            .agg(F.count("*").alias("core_deg"))
            .persist()
        )
        weak = deg.where(F.col("core_deg") < k).select("node")
        n_weak = weak.count()  # materializes deg; convergence check
        if prev_deg is not None:
            prev_deg.unpersist()
        if n_weak == 0:
            adj.unpersist()
            return deg
        survivors = (
            deg.where(F.col("core_deg") >= k).select("node").localCheckpoint(eager=True)
        )
        maybe_b = F.broadcast if broadcast_survivors else (lambda d: d)
        alive = adj.join(
            maybe_b(survivors.withColumnRenamed("node", "u")), "u", "left_semi"
        ).join(
            maybe_b(survivors.withColumnRenamed("node", "v")), "v", "left_semi"
        )
    adj.unpersist()
    if deg is not None:
        deg.unpersist()  # non-convergence must not leak the round table
    raise RuntimeError(
        f"k_core(k={k}) did not converge within max_rounds={max_rounds} "
        "peel rounds; raise max_rounds for pathologically deep graphs "
        "(a length-n path at k=2 peels in ~n/2 rounds)"
    )

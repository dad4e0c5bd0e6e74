"""Deterministic integer PageRank over an edge list.

Float PageRank cannot be hash-oracled (per-iteration double sums
re-associate under partitioning), so this is the library's fixed-point
treatment of an ITERATIVE algorithm: ranks live as int64 micro-units,
every contribution is ``floor(d_num * r / (d_den * out_deg))`` —
integer division, exact in both engines — and each iteration's
per-node update is an exact integer sum.  The whole trajectory is
therefore partition-invariant, retry-stable, and equal to an unrolled
SQL evaluation of the same recurrence (q104 hash-oracles 6 iterations
against a generated DuckDB CTE chain; the tests go to 8).

Variant semantics (documented, matched exactly by the twin):
- unnormalized: every node starts at ``scale``; the damping base is
  ``floor((d_den - d_num) * scale / d_den)`` added every iteration;
- dangling mass is NOT redistributed (rank leaking through sinks is
  accepted) — the classic simplification; rankings are what matter
  for curation (hot-domain weighting), not the exact eigenvector;
- quantization: each hop floors, so integer ranks sit slightly below
  the float recurrence — bounded by out_deg per node per iteration.

Scale shape: per iteration ONE join of edges with the (node, rank)
table on src — broadcast the rank table if nodes << edges, else a
shuffle co-partitioned on src — and ONE groupBy(dst) sum whose
map-side partial combine collapses each partition to its distinct
dst set.  Ranks materialize per iteration (persist + count) so the
lineage stays one-iteration deep instead of exponentially re-running.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check(iters: int, scale: int, d_num: int, d_den: int) -> None:
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if scale <= 0:
        raise ValueError("scale must be positive")
    if not 0 < d_num < d_den:
        raise ValueError("need 0 < damping_num < damping_den")


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 8,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """(node, rank) after ``iters`` exact integer iterations.  Edges
    should be pre-deduplicated (each row is one edge; parallel edges
    count multiply, matching the twin).

    ``broadcast_ranks`` (default True) broadcasts the node-sized rank
    and contribution tables into the per-iteration joins, so the
    persisted edge table never crosses an exchange; set False for
    graphs whose node table exceeds executor memory (the joins fall
    back to planner-chosen exchanges — same values).

    The returned DataFrame IS the final persisted iteration (already
    materialized — reading it costs no recompute); call
    ``.unpersist()`` on it when done.  All intermediate iterations and
    the node table are unpersisted internally."""
    _check(iters, scale, damping_num, damping_den)
    # the edge projection feeds FIVE setup branches (degrees, both
    # node-set endpoints, the static edge-degree table, the
    # no-inbound set); materialize it once so an expensive upstream
    # (the bench feeds an uncached distinct) is not re-run per branch
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    nodes.count()
    base = ((damping_den - damping_num) * scale) // damping_den
    # (src, dst, deg) is static across iterations — persist it or every
    # iteration re-scans the source and re-runs the degree shuffle
    ed = e.join(deg, "src").persist()
    ed.count()
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long")).persist()
    ranks.count()
    # Nodes with NO inbound edge get exactly `base` every iteration;
    # the set is static, so compute it once and UNION it in per
    # iteration instead of left-joining contribs against the full node
    # table (r6: one fewer per-iteration join; same rows — a node
    # either appears in contribs, contributing base + in_mass, or in
    # this static remainder, contributing base + 0, exactly the
    # coalesce(in_mass, 0) the join computed).
    no_in = (
        nodes.join(
            e.select(F.col("dst").alias("node")).distinct(), "node", "left_anti"
        )
        .select("node", F.lit(base).cast("long").alias("rank"))
        .persist()
    )
    no_in.count()
    maybe_b = F.broadcast if broadcast_ranks else (lambda d: d)
    try:
        for _ in range(iters):
            contribs = (
                # the rank table is node-sized while ed is edge-sized:
                # broadcast ranks so the persisted edge table never
                # crosses a per-iteration exchange (r6: this join was
                # a per-iteration shuffle of the full edge table);
                # nodes << edges is the precondition for the broadcast
                # variant — see docstring
                ed.join(maybe_b(ranks), ed.src == ranks.node)
                .select(
                    "dst",
                    F.expr(f"({damping_num} * rank) div ({damping_den} * deg)").alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("in_mass"))
            )
            new = (
                contribs.select(
                    F.col("dst").alias("node"),
                    (F.lit(base) + F.col("in_mass")).cast("long").alias("rank"),
                )
                .unionAll(no_in)
                .persist()
            )
            new.count()
            ranks.unpersist()
            ranks = new
        return ranks
    finally:
        nodes.unpersist()
        ed.unpersist()
        no_in.unpersist()


def pagerank_int_sql(
    edges_sql: str,
    *,
    iters: int = 8,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """DuckDB twin: the same recurrence unrolled as a CTE chain.
    ``edges_sql`` must select columns ``src, dst``.  Test-scale tool —
    the Spark operator is the corpus path."""
    _check(iters, scale, damping_num, damping_den)
    base = ((damping_den - damping_num) * scale) // damping_den
    parts = [
        f"e AS ({edges_sql})",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        parts.append(
            f"r{i} AS (SELECT n.node, CAST({base} + coalesce(m.in_mass, 0) AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst, sum(({damping_num} * r.rank) // ({damping_den} * d.deg)) AS in_mass "
            f"FROM e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src "
            f"GROUP BY e.dst) m ON n.node = m.dst)"
        )
    return "WITH " + ", ".join(parts) + f" SELECT node, rank FROM r{iters}"

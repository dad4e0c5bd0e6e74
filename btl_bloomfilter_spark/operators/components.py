"""Connected components over a pair/edge DataFrame — the last stage
of the near-dup pipeline: candidate PAIRS (MinHash LSH, SimHash,
n-gram Jaccard, embedding near-dup) become duplicate CLUSTERS with a
deterministic canonical representative.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the same
scheme GraphFrames uses.  Converges in O(log² n) rounds on any graph
(vs O(diameter) for naive label propagation, which degenerates on
chain-shaped duplicate runs), and every round is expressible as
groupBy(min) + join — no collect_set materialization of neighbor
lists, so a hot node (one doc near-duplicated a million times) costs
a skewed AGGREGATE (partial-combined map-side) rather than an
exploded neighbor array.

100-TB shape per round: two hash aggregations + two shuffled joins,
all on the node-id key; lineage is truncated every round with
``localCheckpoint`` so the plan does not grow exponentially with
iterations (the classic iterative-DataFrame trap).  The edge set
shrinks monotonically toward a star forest, so later rounds are
cheaper than earlier ones.

Reference relation: btl_bloomfilter has no graph stage (it stops at
membership); this operator serves SURVEY's LLM-pipeline dedup axis —
cluster resolution after ``minhash_lsh_candidates`` /
``ngram_jaccard_pairs`` / ``cosine_near_dup_lsh``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round over a SYMMETRIC edge list (u, v).

    For each node u with m = min(N(u) ∪ {u}): connect every strictly
    larger neighbor v > u to m.
    """
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.where(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round.  Orient each edge large→small, group by
    the large end hi over its smaller neighbors N⁻(hi):
    m = min(N⁻(hi)); emit (lo, m) for every lo ≠ m plus (hi, m).
    """
    oriented = edges.select(
        F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
    ).where(F.col("hi") != F.col("lo"))
    m = oriented.groupBy("hi").agg(F.min("lo").alias("m"))
    lo_edges = (
        oriented.join(m, "hi")
        .where(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("u"), F.col("m").alias("v"))
    )
    hi_edges = m.select(F.col("hi").alias("u"), F.col("m").alias("v"))
    return lo_edges.union(hi_edges).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iters: int = 50,
) -> DataFrame:
    """Resolve an undirected pair list into components.

    Returns ``(node, component)`` — one row per node that appears in
    any pair, where ``component`` is the MINIMUM node id of its
    component (deterministic canonical label).  Nodes with no edges
    don't appear (join/coalesce them back, see ``cluster_assign``).

    Self-loops are ignored.  Convergence is detected EXACTLY: a
    small-star fixed point (same distinct edge set two rounds in a
    row) is a star forest pointing at component minima — checked with
    count + empty-difference, never a hash heuristic.  Raises if
    ``max_iters`` rounds don't converge (large-star/small-star is
    proven to converge in O(log² n); 50 covers any real graph).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    prev_cnt = edges.count()
    for _ in range(max_iters):
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        nxt = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        cnt = nxt.count()
        if cnt == prev_cnt and nxt.exceptAll(edges).isEmpty():
            edges = nxt
            break
        edges, prev_cnt = nxt, cnt
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")
    # converged star forest: every edge is (child, root). Roots appear
    # only on the v side — add their self-assignment.
    children = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return children.union(roots).distinct()


def cluster_assign(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Attach a ``component`` column to every row of ``df``: the
    duplicate-cluster label from ``pairs``, or the row's own id for
    singletons (every row gets exactly one cluster).

    The components table is tiny relative to the corpus (only docs
    that matched ANY candidate pair), so the join broadcasts.
    """
    comp = connected_components(pairs, src, dst).withColumnRenamed(
        "component", "__cc_component"
    )
    return (
        df.join(
            F.broadcast(comp.withColumnRenamed("node", id_col)),
            id_col,
            "left",
        )
        # temp name avoids AMBIGUOUS_REFERENCE when df already carries
        # a 'component' column (e.g. re-clustering a prior assignment)
        .withColumn("component", F.coalesce("__cc_component", F.col(id_col)))
        .drop("__cc_component")
    )


def cluster_representatives(
    assigned: DataFrame,
    id_col: str,
    *,
    quality_col: str | None = None,
) -> DataFrame:
    """One row per component: the canonical representative.

    Default policy: minimum id (matches the component label, so the
    representative is stable under re-clustering).  With
    ``quality_col`` (numeric): highest quality wins, ties broken by
    smallest id — ``min_by(id, struct(-quality, id))``, a
    partial-combining aggregate (no window sort, no shuffle beyond
    the groupBy).  The negation sits on the NUMERIC quality, never on
    the id, so string ids (conv_id, doc hashes) work — negating the
    id would throw under ANSI mode / NULL out otherwise.
    """
    if quality_col is None:
        keep = F.min(id_col).alias("rep_id")
    else:
        keep = F.min_by(
            id_col,
            F.struct((-F.col(quality_col)).alias("nq"), F.col(id_col).alias("i")),
        ).alias("rep_id")
    return assigned.groupBy("component").agg(
        keep, F.count(F.lit(1)).alias("cluster_size")
    )

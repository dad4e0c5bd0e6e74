"""Neighborhood link-prediction scores over a canonical edge set.

The classic local link predictors (Liben-Nowell & Kleinberg CIKM'03;
Adamic & Adar 2003) score a NON-adjacent node pair by the structure
around it: common-neighbor count, Jaccard overlap of neighborhoods,
and Adamic-Adar (common neighbors weighted 1/ln(degree) so rare
shared neighbors count more).  In a curation pipeline these rank the
MISSING edges of a co-occurrence or near-dup graph — which products
will be co-bought, which docs are probably duplicates the pair stage
missed — before an expensive verification pass.

Exactness/oracle policy: all three scores are derived from integer
counts.  Common neighbors and degrees are exact longs; Jaccard is a
single division of two exactly-integer-valued doubles (engine-
identical); Adamic-Adar applies the library's fixed-point policy —
the 1/ln(deg) weight is quantized ONCE per CENTER node to the nano
grid (``floor(1e9 / ln(deg))``, ln evaluated once per node, never per
pair — the only transcendental, with the policy's ~1e-9 grid-boundary
risk) and pair scores are exact integer SUMS of those weights.

Plan shape (wedge expansion, same kernel family as
`triangles.cooccurrence_edges`): ONE groupBy collects each center's
sorted neighbor array, pairs expand inside the array via nested
``transform``/``slice`` entirely in codegen, ONE map-side-combined
(a, b) aggregate, one anti-join against the existing edges, two
degree joins (node-count-sized, broadcast when small).  A center of
degree d emits d(d-1)/2 wedge rows — the standard quadratic hazard;
``max_center_degree`` drops hub CENTERS above the cap (documented
semantics change: wedges through dropped hubs don't score, the same
opt-in hub-robustness contract as ``cooccurrence_edges``'s
``max_group_size``).  Feed a support-pruned graph
(``cooccurrence_edges(min_support=2)``) to keep the wedge stage
sparse by construction.

Reference relation: btl_bloomfilter stops at membership; this serves
SURVEY's LLM-pipeline graph axis (densifying near-dup graphs built
from its fingerprints).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

__all__ = ["link_prediction_scores"]

_D = "decimal(38,0)"


def link_prediction_scores(
    edges: DataFrame,
    *,
    max_center_degree: Optional[int] = None,
    materialize: bool = True,
    broadcast_deg: bool = True,
) -> DataFrame:
    """(a, b, cn, deg_a, deg_b, aa_nano, jaccard) — link-prediction
    scores for every NON-adjacent pair (a < b) with at least one
    common neighbor in a canonical (u, v) edge set.

    ``cn`` = common-neighbor count (long, exact);
    ``deg_a``/``deg_b`` = full degrees (never center-capped — degree
    is a node property);
    ``aa_nano`` = Adamic-Adar in nano units, Σ_w floor(1e9/ln(deg_w))
    over common neighbors w (string, digit-exact);
    ``jaccard`` = cn / (deg_a + deg_b − cn) (double, single division).

    ``materialize`` (default True) eagerly checkpoints the edge set
    (three plan branches — see inline comment) and the node-sized
    degree table (two consumers); ``broadcast_deg`` (default True)
    broadcasts the degree table into the two final joins — disable it
    for billion-node graphs whose degree table exceeds executor
    memory (the joins fall back to AQE-planned exchanges; values are
    identical either way).
    """
    if max_center_degree is not None and max_center_degree < 2:
        raise ValueError(
            f"max_center_degree must be >= 2, got {max_center_degree}"
        )
    from .triangles import degrees, pair_expansion_expr, symmetric_adjacency

    # The input feeds THREE plan branches (degree counts, wedge
    # centers, the non-adjacency anti-join) and Catalyst does not
    # share uncached subtrees — for a co-occurrence input the r6 plan
    # audit showed the quadratic pair expansion re-running per branch.
    # One eager localCheckpoint computes it exactly once.
    if materialize:
        edges = edges.select("u", "v").localCheckpoint(eager=True)
    adj = symmetric_adjacency(edges)
    # degrees from a plain count — NOT from the array aggregate, so
    # the collect_set/array_sort merge runs exactly once (on the
    # wedge path) instead of once per consumer
    deg = degrees(adj)
    # sorted neighbor array per center, built only for wedge centers
    ctr = adj.groupBy(F.col("u").alias("w")).agg(
        F.array_sort(F.collect_set("v")).alias("ps")
    )
    wedge_src = ctr.where(F.size("ps") >= 2)
    if max_center_degree is not None:
        wedge_src = wedge_src.where(F.size("ps") <= int(max_center_degree))
    aa_w = F.floor(F.lit(1e9) / F.log(F.size("ps").cast("double"))).cast("long")
    pairs = wedge_src.select(
        F.explode(F.expr(pair_expansion_expr("a", "b"))).alias("e"),
        aa_w.alias("__aa"),
    ).select("e.a", "e.b", "__aa")
    g = pairs.groupBy("a", "b").agg(
        F.count("*").alias("cn"),
        F.sum(F.col("__aa").cast(_D)).alias("__aan"),
    )
    nonadj = g.join(
        edges.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    maybe_b = F.broadcast if broadcast_deg else (lambda d: d)
    if materialize:
        # node-sized; two consumers below — one degree aggregation
        deg = deg.localCheckpoint(eager=True)
    da = maybe_b(deg.select(F.col("w").alias("a"), F.col("deg").alias("deg_a")))
    db = maybe_b(deg.select(F.col("w").alias("b"), F.col("deg").alias("deg_b")))
    out = nonadj.join(da, "a").join(db, "b")
    return out.select(
        "a",
        "b",
        F.col("cn").cast("long").alias("cn"),
        F.col("deg_a").cast("long").alias("deg_a"),
        F.col("deg_b").cast("long").alias("deg_b"),
        F.col("__aan").cast("string").alias("aa_nano"),
        (
            F.col("cn").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("cn")).cast("double")
        ).alias("jaccard"),
    )

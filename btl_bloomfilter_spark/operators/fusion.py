"""Reciprocal-rank fusion (RRF) of ranked retrieval lists
(Cormack, Clarke & Buettcher, SIGIR'09).

The standard way to combine retrieval systems without score
calibration — lexical + lexical (q107: BM25 + TF-IDF), lexical +
vector, any mix: each system contributes ``1 / (k + rank)`` for every
item it ranked, items missing from a system contribute nothing, and
the fused order is by the summed contribution.  ``k`` (default 60, the
paper's value) damps the head so one system's #1 cannot dominate.

Fixed-point policy (the repo's oracle convention): contributions are
computed in INTEGER nano-units — ``grid div (k + rank)`` with
``grid = 10^9`` — and summed as longs, so the fused score is exact,
partition-invariant, and hash-oracle-able; the float ``rrf`` column is
derived from the long by ONE division (identical longs → identical
doubles in both engines).  Integer floor quantization preserves the
true RRF order whenever ``k + rank < sqrt(grid)`` (≈ 31,623 — far
beyond any real fused list); beyond that, adjacent ranks may tie and
the id tie-break decides, deterministically.

100-TB shape: retrieval lists are top-n bounded by construction, so
fusion is report-sized — the id-universe union plus one LEFT JOIN per
system, then one rank window.  The expensive part of hybrid retrieval
is the systems themselves (bm25_scores' corpus scan, similarity's ANN
index), not the fusion.  For millions of concurrent queries, carry a
query id through the rank tables and fuse per query: every join and
window here keys on the id column(s) verbatim, so passing
``id_col=["query_id", "doc_id"]``-style composite keys via a struct
column works unchanged.
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rrf_fuse", "rrf_fuse_sql"]

_NAME = re.compile(r"^[A-Za-z][A-Za-z0-9_]*$")
_GRID = 10**9


def _check_names(names: list[str]) -> None:
    if not names:
        raise ValueError("at least one system is required")
    if len(set(names)) != len(names):
        raise ValueError("system names must be distinct")
    for n in names:
        if not _NAME.match(n):
            raise ValueError(f"system name {n!r} must match [A-Za-z][A-Za-z0-9_]*")


def rrf_fuse(
    systems: list[tuple[str, DataFrame]],
    id_col: str,
    rank_col: str = "score_rank",
    *,
    k: int = 60,
) -> DataFrame:
    """Fuse named ranked lists into
    ``(id_col, rank_<name>..., rrf_nano, rrf, fused_rank)``.

    Each system DataFrame must carry ``id_col`` and an integer
    ``rank_col`` (1-based; ``bm25_scores`` / ``tfidf_query_scores``
    emit ``score_rank`` directly).  ``rank_<name>`` is NULL for items
    a system did not rank; those contribute 0.  ``fused_rank`` is
    ``row_number`` over (rrf_nano DESC, id ASC) — fully deterministic.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    names = [n for n, _ in systems]
    _check_names(names)
    ids = systems[0][1].select(F.col(id_col))
    for _, df in systems[1:]:
        ids = ids.unionByName(df.select(F.col(id_col)))
    out = ids.distinct()
    for name, df in systems:
        out = out.join(
            df.select(F.col(id_col), F.col(rank_col).cast("long").alias(f"rank_{name}")),
            id_col,
            "left",
        )
    contrib = [
        F.coalesce(
            F.expr(f"{_GRID} div ({k} + rank_{name})"), F.lit(0).cast("long")
        )
        for name in names
    ]
    nano = contrib[0]
    for c in contrib[1:]:
        nano = nano + c
    out = out.withColumn("rrf_nano", nano.cast("long"))
    out = out.withColumn("rrf", F.col("rrf_nano") / F.lit(float(_GRID)))
    w = Window.orderBy(F.col("rrf_nano").desc(), F.col(id_col).asc())
    return out.withColumn("fused_rank", F.row_number().over(w))


def rrf_fuse_sql(
    systems: list[tuple[str, str]],
    id_col: str,
    rank_col: str = "score_rank",
    *,
    k: int = 60,
) -> str:
    """DuckDB twin: ``systems`` pairs (name, SELECT producing at least
    ``id_col`` and ``rank_col``).  Identical integer arithmetic
    (``//`` is DuckDB's floor division; ranks are positive so floor =
    trunc = Spark's ``div``)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    names = [n for n, _ in systems]
    _check_names(names)
    ctes = ",\n".join(f"sys_{n} AS ({sql})" for n, sql in systems)
    id_union = "\nUNION\n".join(f"SELECT {id_col} FROM sys_{n}" for n in names)
    joins = "\n".join(f"LEFT JOIN sys_{n} USING ({id_col})" for n in names)
    ranks = ", ".join(f"sys_{n}.{rank_col} AS rank_{n}" for n in names)
    nano = " + ".join(f"coalesce({_GRID} // ({k} + rank_{n}), 0)" for n in names)
    return f"""
        WITH {ctes},
        rrf_ids AS ({id_union}),
        rrf_joined AS (
            SELECT rrf_ids.{id_col}, {ranks}
            FROM rrf_ids
            {joins}
        ),
        rrf_scored AS (
            SELECT *, CAST({nano} AS BIGINT) AS rrf_nano FROM rrf_joined
        )
        SELECT *, rrf_nano / {float(_GRID)} AS rrf,
               row_number() OVER (ORDER BY rrf_nano DESC, {id_col} ASC) AS fused_rank
        FROM rrf_scored
    """


def topk_overlap(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    score_a,
    score_b,
    *,
    k: int = 10,
) -> DataFrame:
    """Top-k agreement between two ranking signals — the retrieval-
    eval companion to :func:`rrf_fuse` (which COMBINES systems, this
    MEASURES how much they agree): per group, how many of system A's
    top-k items are also in system B's top-k?

    Deterministic and exact: each side ranks by (score DESC, id ASC)
    — the id tie-break makes the top-k SET well-defined under ties in
    both engines — then

        overlap     = |topA ∩ topB|                (exact integer)
        jaccard_k   = overlap / (2·k_eff − overlap)  (one division)
        agreement_k = overlap / k_eff                (one division)

    with k_eff = min(k, group size) so small groups aren't penalized
    for not having k items.  Rows with NULL id or NULL in BOTH scores
    are dropped; a NULL single score ranks LAST (nulls_last),
    identically in both engines.  Duplicate (group, id) rows are
    canonicalized to their MAX score per side before ranking (the
    deterministic choice; un-deduped input would otherwise fan out
    the intersection join).  Fully hash-oracle-able.

    Scale shape: two per-group row_number windows — Spark prunes them
    to WindowGroupLimit (only ~k rows per group survive the window
    exchange) — then a (group, id) equi-join of two k-sized sets and
    a group-sized aggregate.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sa = F.col(score_a) if isinstance(score_a, str) else score_a
    sb = F.col(score_b) if isinstance(score_b, str) else score_b
    # canonicalize duplicate (group, id) rows to their MAX score per
    # side (deterministic in both engines) — un-deduped input would
    # otherwise fan out the intersection join and push agreement_k
    # past 1 / jaccard_k negative (review finding, pinned)
    base = (
        df.where(F.col(id_col).isNotNull() & (sa.isNotNull() | sb.isNotNull()))
        .groupBy(*group_cols, F.col(id_col).alias("__id"))
        .agg(F.max(sa).alias("__sa"), F.max(sb).alias("__sb"))
    )

    def side(score_name: str, alias: str):
        w = Window.partitionBy(*group_cols).orderBy(
            F.col(score_name).desc_nulls_last(), F.col("__id").asc()
        )
        return (
            base.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= k)
            .select(*group_cols, F.col("__id").alias(alias))
        )

    ta = side("__sa", "__ida")
    tb = side("__sb", "__idb")
    inter = (
        ta.join(tb, group_cols, "inner")
        .where(F.col("__ida") == F.col("__idb"))
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__ov"))
    )
    sizes = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    out = sizes.join(inter, group_cols, "left").withColumn(
        "__ov", F.coalesce(F.col("__ov"), F.lit(0))
    )
    keff = F.least(F.lit(k), F.col("__n"))
    return out.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        keff.cast("int").alias("k_eff"),
        F.col("__ov").cast("long").alias("overlap"),
        (
            F.col("__ov").cast("double")
            / (F.lit(2) * keff - F.col("__ov")).cast("double")
        ).alias("jaccard_k"),
        (F.col("__ov").cast("double") / keff.cast("double")).alias("agreement_k"),
    )


def topk_overlap_sql(
    table: str, group: str, id_col: str, score_a: str, score_b: str, *, k: int = 10
) -> str:
    """DuckDB twin of :func:`topk_overlap`."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return f"""
        WITH base AS (
            SELECT {group} AS g, {id_col} AS id,
                   max({score_a}) AS sa, max({score_b}) AS sb
            FROM {table}
            WHERE {id_col} IS NOT NULL
              AND (({score_a}) IS NOT NULL OR ({score_b}) IS NOT NULL)
            GROUP BY 1, 2
        ),
        ta AS (
            SELECT g, id FROM (
                SELECT g, id, row_number() OVER (
                    PARTITION BY g ORDER BY sa DESC NULLS LAST, id ASC) AS r
                FROM base) WHERE r <= {k}
        ),
        tb AS (
            SELECT g, id FROM (
                SELECT g, id, row_number() OVER (
                    PARTITION BY g ORDER BY sb DESC NULLS LAST, id ASC) AS r
                FROM base) WHERE r <= {k}
        ),
        inter AS (
            SELECT ta.g, count(*)::bigint AS ov
            FROM ta JOIN tb ON ta.g = tb.g AND ta.id = tb.id
            GROUP BY ta.g
        ),
        sizes AS (SELECT g, count(*)::bigint AS n FROM base GROUP BY g)
        SELECT sizes.g AS {group}, n,
               CAST(least({k}, n) AS INT) AS k_eff,
               coalesce(ov, 0) AS overlap,
               CAST(coalesce(ov, 0) AS DOUBLE)
                 / CAST(2 * least({k}, n) - coalesce(ov, 0) AS DOUBLE) AS jaccard_k,
               CAST(coalesce(ov, 0) AS DOUBLE)
                 / CAST(least({k}, n) AS DOUBLE) AS agreement_k
        FROM sizes LEFT JOIN inter ON sizes.g = inter.g
    """

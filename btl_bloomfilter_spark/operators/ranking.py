"""Exact ranking / retrieval evaluation: MRR, hit@k, NDCG@k.

The retrieval kit so far RANKS (cosine/LSH/IVF top-k, BM25, RRF
fusion) and COMPARES rankings (topk_overlap q157); this scores a
ranking against graded relevance labels — the metrics every
retrieval / reranker eval needs — computed EXACTLY so both the
per-query table and the corpus summary hash-oracle.

The usual float hazards are removed the library's standard way:

* ranks come from a deterministic total order (score DESC, id ASC —
  the q157 tie-break), so "rank" is well-defined under ties in both
  engines;
* reciprocal rank 1/r is ONE int-double division per query;
* DCG@k's discounts 1/log2(r+1) are irrational — so they are
  FIXED-POINT INTEGERS D[r] = floor(10^15/log2(r+1)), computed ONCE
  driver-side and injected as the same literals into both engines;
  DCG@k = Σ rel_r·D[r] is then an EXACT integer, IDCG@k the same sum
  over the ideal (rel DESC) order, and ndcg = DCG/IDCG is ONE
  division.  The discount table is part of the metric definition
  (error vs the real-valued DCG < 10^-15 relative, far below any
  ranking decision);
* the summary's mean-of-ratios are re-based on integers: MRR
  aggregates rr_fp = 10^18 div first_rel_rank (exact bigint floor
  division, 0 for queries with no relevant result — the standard
  all-queries MRR), so mrr = Σrr_fp/(queries·10^18) is ONE division
  with quantization error ≤ 10^-18 per query; NDCG is summarized as
  the MICRO average Σdcg/Σidcg (one division of exact integers) —
  the mean of per-query ratios would be float-accumulation-order
  dependent and is deliberately NOT offered.

Row semantics: NULL ids and NULL/NaN scores are dropped (a result
that can't be ranked isn't a result); NULL relevance is 0 (unjudged
= non-relevant, the TREC convention).  Duplicate (query, id) rows
are canonicalized to their MAX score and MAX relevance (highest
judgment wins — the TREC qrels convention) BEFORE ranking: without
the dedup the (score DESC, id ASC) order is not total and a
tied-score duplicate would make dcg/first_rel_rank partitioning-
and engine-dependent (the topk_overlap hazard, same fix).
Relevance must be a non-negative integer grade (documented
contract — gains are non-negative by definition).

Scale shape: two per-query row_number windows (actual + ideal
order) over one shuffle on the query key, then a query-sized
aggregate; the summary is a group-sized reduce of the query table.
Nothing row-shaped survives past the window stage.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

_D = "decimal(38,0)"
_RR_SCALE = 10**18
_DISC_SCALE = 10**15


def _discounts(k: int) -> list[int]:
    """D[r] = floor(10^15 / log2(r+1)) for r = 1..k — the shared
    fixed-point DCG discount table (D[1] = 10^15 exactly)."""
    return [math.floor(_DISC_SCALE / math.log2(r + 1)) for r in range(1, k + 1)]


def _check(k: int) -> None:
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k > 100:
        raise ValueError(f"k must be <= 100 (discount table is inlined), got {k}")


def ranking_metrics(
    df: DataFrame,
    query_cols: list[str],
    id_col: str,
    score_col,
    rel_col,
    *,
    k: int = 10,
) -> DataFrame:
    """(query…, n, n_rel, first_rel_rank, rr, hit_k, dcg, idcg, ndcg)
    — exact per-query ranking metrics.  ``first_rel_rank``/``rr``
    scan the FULL result list (standard MRR); ``hit_k``/``dcg``/
    ``idcg``/``ndcg`` are @k.  ``dcg``/``idcg`` are the exact
    fixed-point integers (strings); ``ndcg`` is NULL when the query
    has no relevant result (idcg = 0)."""
    _check(k)
    disc = _discounts(k)
    s = (F.col(score_col) if isinstance(score_col, str) else score_col).cast("double")
    rel = (
        F.coalesce(
            (F.col(rel_col) if isinstance(rel_col, str) else rel_col).cast("long"),
            F.lit(0),
        )
    )
    base = (
        df.where(F.col(id_col).isNotNull() & s.isNotNull() & ~F.isnan(s))
        .groupBy(*query_cols, F.col(id_col).alias("__id"))
        .agg(F.max(s).alias("__s"), F.max(rel).alias("__rel"))
    )
    wq = Window.partitionBy(*query_cols)
    ranked = base.withColumn(
        "__r", F.row_number().over(wq.orderBy(F.col("__s").desc(), F.col("__id").asc()))
    ).withColumn(
        "__ir",
        F.row_number().over(wq.orderBy(F.col("__rel").desc(), F.col("__id").asc())),
    )

    def disc_at(rank_col: str):
        # flat CASE chain; NULL past k, but every use is guarded by
        # rank <= k.  Decimal BEFORE the product: rel·10^15 would
        # overflow long at grades > ~9000
        e = F.when(F.col(rank_col) == 1, F.lit(disc[0]).cast(_D))
        for r in range(2, k + 1):
            e = e.when(F.col(rank_col) == r, F.lit(disc[r - 1]).cast(_D))
        return e

    z = F.lit(0).cast(_D)
    relevant = F.col("__rel") > 0
    out = ranked.groupBy(*query_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(relevant, 1).otherwise(0)).alias("__nrel"),
        F.min(F.when(relevant, F.col("__r"))).alias("__frr"),
        F.max(F.when(relevant & (F.col("__r") <= k), 1).otherwise(0)).alias("__hit"),
        F.sum(
            F.when(
                F.col("__r") <= k, F.col("__rel").cast(_D) * disc_at("__r")
            ).otherwise(z)
        ).alias("__dcg"),
        F.sum(
            F.when(
                F.col("__ir") <= k, F.col("__rel").cast(_D) * disc_at("__ir")
            ).otherwise(z)
        ).alias("__idcg"),
    )
    return out.select(
        *query_cols,
        F.col("__n").alias("n"),
        F.col("__nrel").alias("n_rel"),
        F.col("__frr").cast("long").alias("first_rel_rank"),
        F.when(
            F.col("__frr").isNotNull(),
            F.lit(1.0) / F.col("__frr").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rr"),
        F.col("__hit").alias("hit_k"),
        F.col("__dcg").cast("string").alias("dcg"),
        F.col("__idcg").cast("string").alias("idcg"),
        F.when(
            F.col("__idcg") > z,
            F.col("__dcg").cast("double") / F.col("__idcg").cast("double"),
        ).alias("ndcg"),
    )


def ranking_summary(
    df: DataFrame,
    group_cols: list[str],
    query_cols: list[str],
    id_col: str,
    score_col,
    rel_col,
    *,
    k: int = 10,
) -> DataFrame:
    """(group…, queries, hits, hit_rate, mrr, micro_ndcg) — the
    corpus rollup of :func:`ranking_metrics`.  ``group_cols`` must be
    a prefix-subset of ``query_cols`` (constant per query).  ``mrr``
    sums exact 10^18-fixed-point reciprocal ranks (0 for
    no-relevant queries) and divides ONCE; ``micro_ndcg`` =
    Σdcg/Σidcg over exact integers (NULL when Σidcg = 0)."""
    _check(k)
    missing = [g for g in group_cols if g not in query_cols]
    if missing:
        raise ValueError(f"group_cols must be within query_cols, missing {missing}")
    m = ranking_metrics(df, query_cols, id_col, score_col, rel_col, k=k)
    return summarize_metrics(m, group_cols)


def summarize_metrics(metrics: DataFrame, group_cols: list[str]) -> DataFrame:
    """The aggregation half of :func:`ranking_summary`, over an
    already-materialized :func:`ranking_metrics` table (e.g. one the
    caller just wrote to parquet — avoids re-running the window
    lineage).  ``group_cols`` must be columns of the metrics table
    that are constant per query."""
    rr_fp = F.when(
        F.col("first_rel_rank").isNotNull(),
        F.expr(f"{_RR_SCALE}L div first_rel_rank"),
    ).otherwise(F.lit(0))
    agg = metrics.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_D).alias("__q"),
        F.sum("hit_k").cast(_D).alias("__h"),
        F.sum(rr_fp.cast(_D)).alias("__rr"),
        F.sum(F.col("dcg").cast(_D)).alias("__dcg"),
        F.sum(F.col("idcg").cast(_D)).alias("__idcg"),
    )
    z = F.lit(0).cast(_D)
    return agg.select(
        *group_cols,
        F.col("__q").cast("long").alias("queries"),
        F.col("__h").cast("long").alias("hits"),
        (F.col("__h").cast("double") / F.col("__q").cast("double")).alias("hit_rate"),
        (
            F.col("__rr").cast("double")
            / (F.col("__q") * F.lit(_RR_SCALE).cast(_D)).cast("double")
        ).alias("mrr"),
        F.when(
            F.col("__idcg") > z,
            F.col("__dcg").cast("double") / F.col("__idcg").cast("double"),
        ).alias("micro_ndcg"),
    )


def _disc_case_sql(rank: str, k: int) -> str:
    disc = _discounts(k)
    whens = " ".join(
        f"WHEN {rank} = {r} THEN {disc[r - 1]}::hugeint" for r in range(1, k + 1)
    )
    return f"CASE {whens} END"


def _metrics_cte_sql(
    table: str,
    query: str,
    id_col: str,
    score: str,
    rel: str,
    k: int,
    group_expr: str | None = None,
) -> str:
    """Shared CTE body producing per-query exact metrics (DuckDB).
    ``group_expr`` (an expression over the source columns, constant
    per query) is carried through as ``g`` for the summary twin."""
    # base now aggregates per (q, id); group_expr is constant per
    # query by contract, so any_value is exact
    g_sel = f", any_value({group_expr}) AS g" if group_expr else ""
    g_carry = ", g" if group_expr else ""
    g_any = ", any_value(g) AS g" if group_expr else ""
    return f"""
        base AS (
            SELECT {query} AS q, {id_col} AS id,
                   max(CAST({score} AS DOUBLE)) AS s,
                   max(coalesce(CAST({rel} AS BIGINT), 0)) AS rel{g_sel}
            FROM {table}
            WHERE {id_col} IS NOT NULL AND ({score}) IS NOT NULL
              AND NOT isnan(CAST({score} AS DOUBLE))
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT q, rel{g_carry},
                   row_number() OVER (PARTITION BY q ORDER BY s DESC, id ASC) AS r,
                   row_number() OVER (PARTITION BY q ORDER BY rel DESC, id ASC) AS ir
            FROM base
        ),
        m AS (
            SELECT q, count(*) AS n,
                   sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS nrel,
                   min(CASE WHEN rel > 0 THEN r END) AS frr,
                   max(CASE WHEN rel > 0 AND r <= {k} THEN 1 ELSE 0 END) AS hit,
                   sum(CASE WHEN r <= {k}
                            THEN rel::hugeint * {_disc_case_sql("r", k)}
                            ELSE 0::hugeint END) AS dcg,
                   sum(CASE WHEN ir <= {k}
                            THEN rel::hugeint * {_disc_case_sql("ir", k)}
                            ELSE 0::hugeint END) AS idcg{g_any}
            FROM ranked GROUP BY q
        )
    """


def ranking_metrics_sql(
    table: str,
    query: str,
    id_col: str,
    score: str,
    rel: str,
    *,
    k: int = 10,
) -> str:
    """DuckDB twin of :func:`ranking_metrics` (identical tie-break,
    discount table and expression shapes)."""
    _check(k)
    return f"""
        WITH {_metrics_cte_sql(table, query, id_col, score, rel, k)}
        SELECT q AS {query}, CAST(n AS BIGINT) AS n, CAST(nrel AS BIGINT) AS n_rel,
               CAST(frr AS BIGINT) AS first_rel_rank,
               CASE WHEN frr IS NOT NULL THEN 1.0 / CAST(frr AS DOUBLE)
                    ELSE 0.0 END AS rr,
               CAST(hit AS INT) AS hit_k,
               dcg::varchar AS dcg, idcg::varchar AS idcg,
               CASE WHEN idcg > 0 THEN CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)
                    END AS ndcg
        FROM m
    """


def ranking_summary_sql(
    table: str,
    group_expr: str,
    group_alias: str,
    query: str,
    id_col: str,
    score: str,
    rel: str,
    *,
    k: int = 10,
) -> str:
    """DuckDB twin of :func:`ranking_summary`.  ``group_expr`` is an
    expression over the SOURCE columns that is constant per query
    (the prefix-subset contract's SQL form), emitted as
    ``group_alias``."""
    _check(k)
    return f"""
        WITH {_metrics_cte_sql(table, query, id_col, score, rel, k, group_expr=group_expr)}
        SELECT g AS {group_alias},
               CAST(count(*) AS BIGINT) AS queries,
               CAST(sum(hit) AS BIGINT) AS hits,
               CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS hit_rate,
               CAST(sum(coalesce({_RR_SCALE} // frr, 0)::hugeint) AS DOUBLE)
                 / CAST(count(*)::hugeint * {_RR_SCALE}::hugeint AS DOUBLE) AS mrr,
               CASE WHEN sum(idcg) > 0
                    THEN CAST(sum(dcg) AS DOUBLE) / CAST(sum(idcg) AS DOUBLE)
                    END AS micro_ndcg
        FROM m
        GROUP BY 1
    """

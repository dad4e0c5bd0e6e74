"""Distribution drift between corpus snapshots (PSI report).

Every production data pipeline monitors feature drift between a
reference corpus (last release, training set) and the current one
(new crawl, candidate set).  The standard measure is the Population
Stability Index over a bucketed histogram:

    PSI = sum over buckets of (p_k - q_k) * ln(p_k / q_k)

with Laplace smoothing so empty buckets are defined:
p_k = (ref_count_k + 1) / (N_ref + K), q_k likewise for current,
K = number of distinct buckets observed across both sides.
(Common reading: PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25
action needed.)

Bucketing is deterministic and engine-portable:

- numeric: explicit ``edges`` [e1 < e2 < ...] -> bucket = number of
  edges strictly below-or-equal (sum of ``x > e`` indicators, exact
  double compares on identical literals); NULL -> bucket -1;
- categorical: the value itself (NULL -> NUL-byte sentinel, same
  encoding as ``functions.splits``).

Determinism policy (same family as lmscore/dsir): each bucket's PSI
contribution is quantized ONCE to nano-units —
``round((p-q) * ln(p/q) * 1e9)`` as a long — and the total is an
exact long sum, so the whole report is hash-oracle-able.  p and q
are IEEE-exact given identical counts; only ln carries a <=1-ulp
engine difference, absorbed by the nano grid.

Plan shape (the 100-TB one): one scan per side collapsing to <= K+1
histogram rows map-side, a K-row full outer join, scalar totals via
a window over the tiny joined table.  Nothing corpus-sized ever
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NANO = 1_000_000_000
NULL_SENTINEL = "\x00"


def _check_edges(edges: list[float]) -> None:
    if not edges:
        raise ValueError("edges must be non-empty")
    if sorted(edges) != list(edges) or len(set(edges)) != len(edges):
        raise ValueError("edges must be strictly increasing")


def _bucket_num(col: str, edges: list[float]) -> F.Column:
    _check_edges(edges)
    b = None
    for e in edges:
        ind = (F.col(col) > F.lit(float(e))).cast("long")
        b = ind if b is None else b + ind
    return F.when(F.col(col).isNull(), F.lit(-1)).otherwise(b).cast("string")


def _bucket_num_sql(col: str, edges: list[float]) -> str:
    _check_edges(edges)
    s = " + ".join(f"(({col} > {float(e)!r})::bigint)" for e in edges)
    return f"(CASE WHEN {col} IS NULL THEN '-1' ELSE ({s})::varchar END)"


def _bucket_cat(col: str) -> F.Column:
    return F.coalesce(F.col(col).cast("string"), F.lit(NULL_SENTINEL))


def _hist(df: DataFrame, bucket: F.Column, name: str) -> DataFrame:
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(name))
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    *,
    edges: list[float] | None = None,
) -> DataFrame:
    """Per-bucket drift report: (bucket, ref_count, cur_count, p, q,
    psi_nano, psi_total) — psi_total repeated on every row (exact
    long window sum of the per-bucket quantized contributions,
    divided back to units, round-6).  Pass ``edges`` for numeric
    columns; omit for categorical."""
    bucket = _bucket_cat(col) if edges is None else _bucket_num(col, edges)
    h = _hist(ref, bucket, "ref_count").join(
        _hist(cur, bucket, "cur_count"), "bucket", "full"
    ).select(
        "bucket",
        F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
        F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    n_ref = F.sum("ref_count").over(wall)
    n_cur = F.sum("cur_count").over(wall)
    k = F.count(F.lit(1)).over(wall)
    p = (F.col("ref_count") + 1).cast("double") / (n_ref + k).cast("double")
    q = (F.col("cur_count") + 1).cast("double") / (n_cur + k).cast("double")
    contrib = F.round((p - q) * F.log(p / q) * NANO, 0).cast("long")
    return (
        h.select(
            "bucket",
            "ref_count",
            "cur_count",
            F.round(p, 9).alias("p"),
            F.round(q, 9).alias("q"),
            contrib.alias("psi_nano"),
        )
        .withColumn(
            "psi_total",
            F.round(
                F.sum("psi_nano").over(Window.partitionBy()).cast("double") / NANO, 6
            ),
        )
    )


def psi_report_sql(
    ref_table: str,
    cur_table: str,
    col: str,
    *,
    edges: list[float] | None = None,
) -> str:
    """DuckDB twin of :func:`psi_report` — identical bucketing,
    smoothing, and nano-quantized contributions."""
    if edges is None:
        bucket = f"coalesce({col}::varchar, chr(0))"
    else:
        bucket = _bucket_num_sql(col, edges)
    return f"""
WITH rh AS (
  SELECT {bucket} AS bucket, count(*) AS ref_count FROM {ref_table} GROUP BY 1
),
ch AS (
  SELECT {bucket} AS bucket, count(*) AS cur_count FROM {cur_table} GROUP BY 1
),
h AS (
  SELECT coalesce(rh.bucket, ch.bucket) AS bucket,
         coalesce(ref_count, 0)::bigint AS ref_count,
         coalesce(cur_count, 0)::bigint AS cur_count
  FROM rh FULL JOIN ch ON rh.bucket = ch.bucket
),
tot AS (
  SELECT sum(ref_count)::bigint AS n_ref, sum(cur_count)::bigint AS n_cur,
         count(*)::bigint AS k
  FROM h
),
scored AS (
  SELECT bucket, ref_count, cur_count,
         round((ref_count + 1)::double / (n_ref + k)::double, 9) AS p,
         round((cur_count + 1)::double / (n_cur + k)::double, 9) AS q,
         round(((ref_count + 1)::double / (n_ref + k)::double
                - (cur_count + 1)::double / (n_cur + k)::double)
               * ln(((ref_count + 1)::double / (n_ref + k)::double)
                    / ((cur_count + 1)::double / (n_cur + k)::double))
               * 1000000000.0)::bigint AS psi_nano
  FROM h, tot
)
SELECT bucket, ref_count, cur_count, p, q, psi_nano,
       round((sum(psi_nano) OVER ())::double / 1000000000.0, 6) AS psi_total
FROM scored
""".strip()

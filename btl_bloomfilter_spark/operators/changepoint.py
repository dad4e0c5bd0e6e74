"""Exact CUSUM changepoint localization.

The drift kit (operators/drift PSI, stats.grouped_ks) answers "DID
the distribution shift"; this answers "WHERE": for each group's
value series ordered by time, the single best split point under the
classic CUSUM / binary-segmentation criterion — the i maximizing
|mean(x_1..i) − mean(x_i+1..n)| weighted by segment sizes, which is
exactly argmax_i |D_i| with

    D_i = n·P_i − i·T        (P_i = prefix sum, T = total)

(the unnormalized CUSUM statistic; Page 1954, binary segmentation's
first split).  With the library's quantize-once policy every D_i is
an EXACT integer in decimal(38,0)/hugeint, the argmax is decided on
integers with a deterministic min-position tie-break, and the
reported statistic max|D|/(n²·scale) — the mean-shift magnitude in
value units scaled by the split balance — is ONE division of
exactly-integer-valued doubles.  Fully hash-oracle-able.

Ordering must be total for prefix sums to be well-defined: rows are
ordered by (order_col, quantized value); rows tied on BOTH leave
every P_i unchanged under any permutation, so the result is
deterministic in both engines.  NULL values/orders are dropped;
groups with n < 2, or with max|D| = 0 (constant series — no split
evidence), are excluded.

Scale shape: per-group ROW-SCALE windows (row_number + prefix sum +
group max), the same documented cost contract as grouped_spearman's
rank windows — one shuffle on the group key, everything else
window-local.  The argmax row (and its order witness) is recovered
by ONE min-over-struct(i, order) aggregate over the few max-tied
rows — i is unique per group, so the lexicographic min is the
deterministic min-position tie-break.

Overflow contract: |D_i| ≤ n·|T| ≈ n²·scale·max|x| must stay below
1e38 (documented, loud under ANSI) — n to ~3e14 at scale=1e6,
|x| ≤ 1e3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_D = "decimal(38,0)"


def changepoint(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    order_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """(group…, n, cp_index, cp_order, d_max, shift) — the best
    CUSUM split per group: ``cp_index`` is the 1-based position i
    (prefix x_1..i vs suffix), ``cp_order`` the order-column value at
    that row, ``d_max`` the exact integer |D| (string), ``shift`` =
    d_max/(n²·scale)."""
    from pyspark.sql import Window

    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast("double")
    base = df.where(
        v.isNotNull() & ~F.isnan(v) & F.col(order_col).isNotNull()
    ).select(
        *group_cols,
        F.col(order_col).alias("__o"),
        F.floor(v * scale).cast("long").cast(_D).alias("__xq"),
    )
    w = Window.partitionBy(*group_cols).orderBy("__o", "__xq")
    wa = Window.partitionBy(*group_cols)
    c = (
        base.withColumn("__i", F.row_number().over(w).cast(_D))
        .withColumn(
            "__p",
            F.sum("__xq").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("__n", F.count(F.lit(1)).over(wa).cast(_D))
        .withColumn("__t", F.sum("__xq").over(wa))
    )
    c = c.withColumn(
        "__d", F.abs(F.col("__n") * F.col("__p") - F.col("__i") * F.col("__t"))
    ).where(F.col("__i") < F.col("__n"))
    c = c.withColumn("__dmax", F.max("__d").over(wa))
    # min over struct(__i, __o) = lexicographic, and __i is unique per
    # group, so ONE aggregate yields both the argmax index and its
    # order witness — the earlier self-join re-evaluated the whole
    # row-scale window subtree twice (review finding)
    best = (
        c.where(F.col("__d") == F.col("__dmax"))
        .groupBy(*group_cols)
        .agg(
            F.min(F.struct(F.col("__i"), F.col("__o"))).alias("__best"),
            F.first("__n").alias("__n"),
            F.first("__dmax").alias("__dm"),
        )
    )
    return best.where((F.col("__n") >= 2) & (F.col("__dm") > 0)).select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        F.col("__best.__i").cast("long").alias("cp_index"),
        F.col("__best.__o").alias("cp_order"),
        F.col("__dm").cast("string").alias("d_max"),
        (
            F.col("__dm").cast("double")
            / (F.col("__n") * F.col("__n") * F.lit(scale).cast(_D)).cast("double")
        ).alias("shift"),
    )


def changepoint_sql(
    table: str,
    group: str,
    value: str,
    order: str,
    *,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`changepoint` (hugeint arithmetic,
    identical ordering and tie-break)."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    return f"""
        WITH base AS (
            SELECT {group} AS g, {order} AS o,
                   CAST(floor(CAST({value} AS DOUBLE) * {scale}) AS BIGINT)::hugeint AS xq
            FROM {table}
            WHERE ({value}) IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE))
              AND ({order}) IS NOT NULL
        ),
        c AS (
            SELECT g, o, xq,
                   row_number() OVER (PARTITION BY g ORDER BY o, xq) AS i,
                   sum(xq) OVER (PARTITION BY g ORDER BY o, xq
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
                   count(*) OVER (PARTITION BY g) AS n,
                   sum(xq) OVER (PARTITION BY g) AS t
            FROM base
        ),
        d AS (
            SELECT g, o, i, n,
                   abs(n::hugeint * p - i::hugeint * t) AS dd
            FROM c WHERE i < n
        ),
        m AS (
            SELECT g, max(dd) AS dm, any_value(n) AS n FROM d GROUP BY g
        ),
        best AS (
            SELECT d.g, min(i) AS cp, arg_min(o, i) AS cpo,
                   any_value(m.dm) AS dm, any_value(m.n) AS n
            FROM d JOIN m ON d.g = m.g AND d.dd = m.dm
            GROUP BY d.g
        )
        SELECT g AS {group}, CAST(n AS BIGINT) AS n,
               CAST(cp AS BIGINT) AS cp_index,
               cpo AS cp_order,
               dm::varchar AS d_max,
               CAST(dm AS DOUBLE)
                 / CAST(n::hugeint * n::hugeint * {scale}::hugeint AS DOUBLE) AS shift
        FROM best
        WHERE n >= 2 AND dm > 0
    """

"""Exact grouped robust statistics: lower median, MAD, and
median/MAD outlier flagging — the robust companion to the KLL
quantile sketch (operators/kll, q23) when the answer must be exact
and hash-oracle-able.

Why "lower median": interpolating medians (Spark ``median``, DuckDB
``median``) average the two middle elements on even counts, producing
a float that leaves the fixed-point domain (fixed-point-oracle-policy
memory).  This module defines median(xs) = the element of rank
ceil(n/2) under ascending order — always a real element, always a
LONG, identical in both engines because BOTH use this explicit
construction (the oracle twins below never call the engines' builtin
``median``).  MAD is the same lower median of ``abs(x - med)``.

Outlier rule: ``|x - med| * 1000 > k_milli * mad`` — pure int64
arithmetic.  ``k_milli = 4448`` is the milli-quantized
3·1.4826 ≈ 4.4478 (the normal-consistency constant: MAD·1.4826
estimates sigma, so this is the robust 3-sigma rule, Hampel 1974 /
Leys et al. JESP 2013).  A degenerate group (mad = 0) flags ANY
deviation — the correct robust behavior when >half the group is one
value.  Overflow contract: requires |v|·1000 < 2^63 (|v| < 9.2e15),
documented not enforced, like the rest of the fixed-point family.

100-TB shape (the reason this isn't a window over raw rows): exact
per-group order statistics need per-group ordering, but NOT over
rows.  The data is first compressed to a per-group VALUE HISTOGRAM
(``groupBy(g, v).count()`` — map-side partial combine, one shuffle
whose size is bounded by distinct values, not rows; cents-quantized
prices at 100 TB are millions of distinct values, not trillions of
rows), the cumulative-count window then runs over the histogram, the
per-group (n, med, mad) table is tiny (one row per group) and is
BROADCAST back for the outlier filter — a pure map over the source.
Group skew is bounded by the value-domain size, never by the hottest
group's row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "grouped_median_mad",
    "robust_outliers",
    "grouped_median_mad_sql",
    "grouped_quantiles",
    "grouped_quantiles_sql",
    "grouped_trimmed_mean",
    "grouped_trimmed_mean_sql",
]

# rank of the lower median: ceil(n/2) == floor((n+1)/2).  INTEGER
# division on both engines — a float `/` would lose exactness past
# 2^53 rows per group (the operators/rangejoin._fdiv lesson applied
# preemptively); Spark spells it DIV, DuckDB //.
_RANK_SPARK = "CAST((n + 1) DIV 2 AS BIGINT)"
_RANK_DUCK = "CAST((n + 1) // 2 AS BIGINT)"


def _cum_counts(hist: DataFrame, group_cols: list[str], v: str) -> DataFrame:
    """hist = (group..., v, cnt) -> + (cum, n): the shared
    cumulative-count scaffold every order-statistic operator here
    rides (median/MAD, quantiles, trimmed mean)."""
    w_cum = Window.partitionBy(*group_cols).orderBy(v).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(*group_cols)
    return hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )


def _weighted_lower_median(hist: DataFrame, group_cols: list[str], v: str) -> DataFrame:
    """hist = (group..., v, cnt) -> (group..., med, n): smallest v
    whose cumulative count reaches rank ceil(n/2).  cum is monotone in
    v, so min(v | cum >= rank) is the crossing element."""
    h = _cum_counts(hist, group_cols, v)
    return (
        h.where(F.col("cum") >= F.expr(_RANK_SPARK))
        .groupBy(*group_cols)
        .agg(F.min(v).alias("med"), F.first("n").alias("n"))
    )


def grouped_median_mad(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """(group..., n, med, mad) — all LONG.  ``value_col`` must already
    be integer-quantized (cast cents/micros yourself: quantize ONCE at
    the edge).  NULL values are dropped (a missing measurement is not
    a zero)."""
    src = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(value_col).cast("long").alias("v")
    )
    hist = src.groupBy(*group_cols, "v").agg(F.count("*").alias("cnt"))
    med = _weighted_lower_median(hist, group_cols, "v")
    dev_hist = (
        hist.join(F.broadcast(med), group_cols)
        .select(*group_cols, F.abs(F.col("v") - F.col("med")).alias("d"), "cnt")
        .groupBy(*group_cols, "d")
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = _weighted_lower_median(dev_hist, group_cols, "d").select(
        *group_cols, F.col("med").alias("mad")
    )
    return med.join(mad, group_cols).select(
        *group_cols, F.col("n").cast("long").alias("n"), "med", "mad"
    )


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k_milli: int = 4448,
) -> DataFrame:
    """Source rows whose value is a median/MAD outlier within their
    group, with the group's (n, med, mad) attached.  The stats table
    (one row per group) is broadcast — the flagging pass is a pure
    map over the source, no second shuffle of data rows."""
    stats = grouped_median_mad(df, group_cols, value_col)
    v = F.col(value_col).cast("long")
    return (
        df.where(F.col(value_col).isNotNull())
        .join(F.broadcast(stats), group_cols)
        .where(F.abs(v - F.col("med")) * F.lit(1000) > F.lit(int(k_milli)) * F.col("mad"))
    )


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    q_millis: list[int],
) -> DataFrame:
    """Exact lower q-quantiles per group: for each q (in milli-units,
    e.g. 500 = median — grouped_median_mad's med IS the q=500 row),
    the element of rank ceil(q·n/1000).  The rank is pure integer
    arithmetic — ``(q_milli·n + 999) div 1000`` — so no float ever
    enters the selection and both engines pick the same element.

    Returns (group..., q_milli, n, value), one row per group × q.
    Same scale shape as grouped_median_mad: ONE histogram shuffle,
    one cumulative window over distinct values, then a broadcast
    hash join of the tiny (group, q, rank) table against the
    histogram with a residual rank-interval filter — each (group, q)
    matches exactly one histogram row (the one whose cumulative
    interval (cum-cnt, cum] covers the rank)."""
    qs = sorted(set(int(q) for q in q_millis))
    if not qs or qs[0] < 1 or qs[-1] > 1000:
        raise ValueError("q_millis must be within [1, 1000]")
    src = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(value_col).cast("long").alias("v")
    )
    hist = src.groupBy(*group_cols, "v").agg(F.count("*").alias("cnt"))
    h = _cum_counts(hist, group_cols, "v")
    ranks = (
        h.groupBy(*group_cols)
        .agg(F.first("n").alias("n"))
        .crossJoin(
            F.broadcast(
                h.sparkSession.createDataFrame(
                    [(q,) for q in qs], "q_milli long"
                )
            )
        )
        .withColumn("rank", F.expr("CAST((q_milli * n + 999) DIV 1000 AS BIGINT)"))
    )
    return (
        h.join(F.broadcast(ranks.drop("n")), group_cols)
        .where(
            (F.col("rank") > F.col("cum") - F.col("cnt"))
            & (F.col("rank") <= F.col("cum"))
        )
        .select(
            *group_cols,
            "q_milli",
            F.col("n").cast("long").alias("n"),
            F.col("v").alias("value"),
        )
    )


def grouped_quantiles_sql(
    table: str, group: str, value_expr: str, *, q_millis: list[int]
) -> str:
    """DuckDB/ANSI twin of :func:`grouped_quantiles` — same histogram,
    same integer rank, same interval selection."""
    qs = sorted(set(int(q) for q in q_millis))
    vals = ", ".join(f"({q})" for q in qs)
    return f"""(
        WITH hist AS (
            SELECT {group}, {value_expr} AS v, count(*) AS cnt
            FROM {table} WHERE {value_expr} IS NOT NULL
            GROUP BY {group}, {value_expr}
        ),
        h AS (
            SELECT {group}, v, cnt,
                   sum(cnt) OVER (PARTITION BY {group} ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   sum(cnt) OVER (PARTITION BY {group}) AS n
            FROM hist
        ),
        qs(q_milli) AS (VALUES {vals})
        SELECT {group}, CAST(q_milli AS BIGINT) AS q_milli,
               CAST(n AS BIGINT) AS n, v AS value
        FROM h CROSS JOIN qs
        WHERE (q_milli * n + 999) // 1000 > cum - cnt
          AND (q_milli * n + 999) // 1000 <= cum
    )"""


def _median_sql(src: str, group: str, v: str) -> str:
    """Weighted-lower-median SQL over a histogram CTE ``src`` with
    columns (group, v, cnt) — the exact construction
    _weighted_lower_median runs, in dialect-neutral SQL."""
    return f"""(
        SELECT {group}, min({v}) AS med, min(n) AS n
        FROM (
            SELECT {group}, {v}, n,
                   sum(cnt) OVER (PARTITION BY {group} ORDER BY {v}
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM (SELECT {group}, {v}, cnt,
                         sum(cnt) OVER (PARTITION BY {group}) AS n
                  FROM {src}) h0
        ) h WHERE cum >= {_RANK_DUCK}
        GROUP BY {group}
    )"""


def grouped_median_mad_sql(table: str, group: str, value_expr: str) -> str:
    """DuckDB/ANSI twin of :func:`grouped_median_mad` — same
    histogram-compressed lower-median construction, never the builtin
    interpolating ``median``.  ``value_expr`` must produce the SAME
    integer quantization used on the Spark side."""
    return f"""(
        WITH hist AS (
            SELECT {group}, {value_expr} AS v, count(*) AS cnt
            FROM {table} WHERE {value_expr} IS NOT NULL
            GROUP BY {group}, {value_expr}
        ),
        med AS (SELECT * FROM {_median_sql('hist', group, 'v')} m),
        dev_hist AS (
            SELECT hist.{group}, abs(v - med.med) AS d, sum(cnt) AS cnt
            FROM hist JOIN med ON hist.{group} = med.{group}
            GROUP BY hist.{group}, abs(v - med.med)
        ),
        mad AS (SELECT {group}, med AS mad FROM {_median_sql('dev_hist', group, 'd')} m)
        SELECT med.{group}, CAST(med.n AS BIGINT) AS n,
               CAST(med.med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad
        FROM med JOIN mad ON med.{group} = mad.{group}
    )"""


def grouped_trimmed_mean(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    trim_milli: int = 50,
) -> DataFrame:
    """Exact per-group trimmed AND winsorized mean — the robust
    location estimators between the mean (efficient, fragile) and the
    median (robust, throws away 50%): drop (trimmed) or clamp
    (winsorized) the lowest/highest k = ⌊n·trim_milli/1000⌋ rows.

    All selection is INTEGER arithmetic off the value histogram — k
    by integer division, the per-cell included multiplicity

        inc = max(0, min(cum, n−k) − max(cum−cnt, k))

    (the cell covers ranks (cum−cnt, cum]; intersect with the kept
    rank window (k, n−k]), the winsor clamp values are the rank-(k+1)
    and rank-(n−k) elements (min v with cum ≥ rank — the
    grouped_quantiles crossing construction) — so both means are ONE
    division of exact decimal(38,0)/hugeint integers and
    hash-oracle-able.  ``value_col`` must already be
    integer-quantized (module convention: quantize ONCE at the edge);
    NULL values are dropped.  ``trim_milli`` ∈ [0, 500): k < n/2 so
    n − 2k ≥ 1 always — no empty-core division.

    Returns (group…, n, k, lo_clamp, hi_clamp, trimmed_mean,
    winsor_mean).  trim_milli = 0 degenerates both to the exact mean
    (pinned law).

    Scale shape: grouped_median_mad's — ONE histogram shuffle bounded
    by distinct values, one cumulative window, one group-sized
    aggregate.
    """
    if not 0 <= trim_milli < 500:
        raise ValueError(f"trim_milli must be in [0, 500), got {trim_milli}")
    src = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(value_col).cast("long").alias("v")
    )
    hist = src.groupBy(*group_cols, "v").agg(F.count("*").alias("cnt"))
    h = _cum_counts(hist, group_cols, "v").withColumn(
        "k", F.expr(f"(n * {int(trim_milli)}) DIV 1000")
    )
    inc = F.greatest(
        F.lit(0),
        F.least(F.col("cum"), F.col("n") - F.col("k"))
        - F.greatest(F.col("cum") - F.col("cnt"), F.col("k")),
    )
    d = "decimal(38,0)"
    agg = h.groupBy(*group_cols).agg(
        F.first("n").alias("n"),
        F.first("k").alias("k"),
        F.sum(F.col("v").cast(d) * inc.cast(d)).alias("tsum"),
        F.min(F.when(F.col("cum") >= F.col("k") + 1, F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cum") >= F.col("n") - F.col("k"), F.col("v"))).alias("hi"),
    )
    kd = F.col("k").cast(d)
    wsum = F.col("tsum") + kd * F.col("lo").cast(d) + kd * F.col("hi").cast(d)
    return agg.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.col("lo").alias("lo_clamp"),
        F.col("hi").alias("hi_clamp"),
        (
            F.col("tsum").cast("double")
            / (F.col("n") - F.lit(2) * F.col("k")).cast("double")
        ).alias("trimmed_mean"),
        (wsum.cast("double") / F.col("n").cast("double")).alias("winsor_mean"),
    )


def grouped_trimmed_mean_sql(
    table: str, group: str, value_expr: str, *, trim_milli: int = 50
) -> str:
    """DuckDB twin of :func:`grouped_trimmed_mean` (hugeint sums,
    identical integer selection).  ``value_expr`` must produce the
    SAME integer quantization used on the Spark side."""
    if not 0 <= trim_milli < 500:
        raise ValueError(f"trim_milli must be in [0, 500), got {trim_milli}")
    return f"""
        WITH hist AS (
            SELECT {group} AS g, {value_expr} AS v, count(*)::hugeint AS cnt
            FROM {table} WHERE {value_expr} IS NOT NULL
            GROUP BY 1, 2
        ),
        h AS (
            SELECT g, v, cnt,
                   sum(cnt) OVER (PARTITION BY g ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   sum(cnt) OVER (PARTITION BY g) AS n
            FROM hist
        ),
        hk AS (SELECT *, (n * {int(trim_milli)}::hugeint) // 1000 AS k FROM h),
        agg AS (
            SELECT g, min(n) AS n, min(k) AS k,
                   sum(v::hugeint * greatest(0::hugeint,
                       least(cum, n - k) - greatest(cum - cnt, k))) AS tsum,
                   min(CASE WHEN cum >= k + 1 THEN v END) AS lo,
                   min(CASE WHEN cum >= n - k THEN v END) AS hi
            FROM hk GROUP BY g
        )
        SELECT g AS {group}, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
               CAST(lo AS BIGINT) AS lo_clamp, CAST(hi AS BIGINT) AS hi_clamp,
               CAST(tsum AS DOUBLE) / CAST(n - 2 * k AS DOUBLE) AS trimmed_mean,
               CAST(tsum + k * lo::hugeint + k * hi::hugeint AS DOUBLE)
                 / CAST(n AS DOUBLE) AS winsor_mean
        FROM agg
    """

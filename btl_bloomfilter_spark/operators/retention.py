"""Cohort retention matrix — exact, engine-portable.

The second classic product-analytics operator (the funnel's sibling,
operators/funnel.py): group users into cohorts by their FIRST
activity period, then for each (cohort, age) count how many of the
cohort were active ``age`` periods later.  For transcripts: do users
acquired in week W keep conversing in weeks W+1, W+2, …?

All calendar arithmetic is integer: day = datediff(activity date,
fixed epoch Monday 2000-01-03), period = floor(day / period_days) —
``floor`` spelled explicitly in BOTH engines (DuckDB's integer ``//``
and Spark's ``div`` disagree on negative operands; floor of the
double division is IEEE-identical and exact for any representable
day count).  Counts are exact longs; retention is ONE division —
fully hash-oracle-able.

Retention here is "active in period cohort+age", the standard
N-period bounded-window definition (not "active at any point after"),
and n_cohort is the cohort's size — by construction every user is
active at age 0, so the age-0 row carries the cohort size and has
retention exactly 1.0 (pinned law).

Scale shape: one distinct over (user, period) — the only row-scale
shuffle, map-side combinable; a user-keyed MIN sharing that key; a
(cohort, age)-sized aggregate; a cohort-sized self-join for the
denominators.  Nothing row-shaped after the distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_EPOCH = "2000-01-03"  # a Monday, so period_days=7 aligns weeks Mon-Sun


def activity_periods(
    df: DataFrame, user_col: str, ts_col: str, period_days: int
) -> DataFrame:
    """Shared (user, period) activity facts — the deduped projection
    both the retention matrix and trailing-active (operators/activity)
    build on.  ONE definition of the engine-parity-critical period
    arithmetic so the two operators can never drift apart."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    day = F.datediff(F.to_date(F.col(ts_col)), F.lit(_EPOCH).cast("date"))
    period = F.floor(day.cast("double") / F.lit(float(period_days))).cast("long")
    return (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("__u"), period.alias("__p"))
        .distinct()
    )


def period_sql(ts: str, period_days: int) -> str:
    """DuckDB twin of the period expression (single source, shared by
    retention_matrix_sql and trailing_active_sql)."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    return (
        f"CAST(floor(datediff('day', DATE '{_EPOCH}', CAST({ts} AS DATE)) "
        f"/ CAST({period_days} AS DOUBLE)) AS BIGINT)"
    )


def retention_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    period_days: int = 7,
) -> DataFrame:
    """(cohort_period, age, n_active, n_cohort, retention) per
    cohort×age cell.  NULL users/timestamps are dropped."""
    act = activity_periods(df, user_col, ts_col, period_days)
    cohort = act.groupBy("__u").agg(F.min("__p").alias("__c"))
    cells = (
        act.join(cohort, "__u")
        .groupBy(F.col("__c").alias("cohort_period"), (F.col("__p") - F.col("__c")).alias("age"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = cells.where(F.col("age") == 0).select(
        "cohort_period", F.col("n_active").alias("n_cohort")
    )
    return cells.join(sizes, "cohort_period").select(
        F.col("cohort_period").cast("long").alias("cohort_period"),
        F.col("age").cast("long").alias("age"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_cohort").cast("long").alias("n_cohort"),
        (
            F.col("n_active").cast("double") / F.col("n_cohort").cast("double")
        ).alias("retention"),
    )


def retention_matrix_sql(
    table: str, user: str, ts: str, *, period_days: int = 7
) -> str:
    """DuckDB twin of :func:`retention_matrix`."""
    period = period_sql(ts, period_days)
    return f"""
        WITH act AS (
            SELECT DISTINCT {user} AS u, {period} AS p
            FROM {table}
            WHERE ({user}) IS NOT NULL AND ({ts}) IS NOT NULL
        ),
        cohort AS (SELECT u, min(p) AS c FROM act GROUP BY u),
        cells AS (
            SELECT c AS cohort_period, p - c AS age, count(*)::bigint AS n_active
            FROM act JOIN cohort USING (u)
            GROUP BY 1, 2
        ),
        sizes AS (
            SELECT cohort_period, n_active AS n_cohort FROM cells WHERE age = 0
        )
        SELECT cells.cohort_period, age, n_active, n_cohort,
               CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
        FROM cells JOIN sizes USING (cohort_period)
    """

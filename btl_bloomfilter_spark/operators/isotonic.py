"""Exact isotonic (PAV) regression / calibration curve.

calibration_bins (q138) DIAGNOSES miscalibration; this FIXES it: the
monotone score→probability mapping that minimizes squared error —
isotonic regression, the standard non-parametric recalibrator
(Zadrozny & Elkan KDD'02; Niculescu-Mizil & Caruana ICML'05).

Pool-Adjacent-Violators is sequential, which looks
non-SQL-expressible — but PAV has a CLOSED FORM, the minimax
identity (Barlow et al. 1972, §1.2):

    fit(p) = max_{i ≤ p} min_{j ≥ p} mean(y_i..y_j)

over score-ordered cells.  On the value-compressed score histogram
(cells (s_q, Σy, n) with prefix sums P, C) every interval mean is
ONE division of exact integers, mean(i..j) = (P_j−P_{i−1})/(C_j−C_{i−1}),
hence an engine-identical double; min/max over doubles is
deterministic; so the ENTIRE fitted curve hash-oracles.

The two-stage evaluation avoids the naive O(cells³):

  1. all interval pairs i ≤ j with their mean — O(cells²) rows;
  2. per (group, i), a j-DESC running min: row (i, j) now holds
     m(i, j) = min_{j' ≥ j} mean(i..j');
  3. fit at cell p = max over rows with j = p (every such row has
     i ≤ p by construction) — one groupBy(p) MAX.

COST CONTRACT: O(cells²) per group — the kendall/trend design
point: quantize scores to a calibration grid first (``micro`` = 100
→ ≤ 101 cells → ≤ 5151 pairs/group).  Monotonicity of the output is
a THEOREM here, not a post-hoc fix — pinned by test.

NULL/NaN scores and NULL labels are dropped; ``label_col`` must be
integer-valued (0/1 for probability calibration; any non-negative
integer response works).  Scale shape: one map-side-combined
row-scale histogram groupBy, then everything is cell-scale (pair
join, one window, one aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_D = "decimal(38,0)"


def isotonic_calibration(
    df: DataFrame,
    group_cols: list[str],
    score_col,
    label_col,
    *,
    micro: int = 100,
) -> DataFrame:
    """(group…, score_q, n, y_sum, y_rate, iso_fit) — the exact
    isotonic calibration curve per group, one row per distinct
    quantized score ``score_q = floor(score·micro)``.  ``y_rate`` is
    the cell's raw mean (one division), ``iso_fit`` the PAV-fitted
    monotone value (the minimax of one-division doubles).  Map new
    scores to ``iso_fit`` of the largest ``score_q`` ≤ theirs."""
    if micro < 1:
        raise ValueError(f"micro must be >= 1, got {micro}")
    s = (F.col(score_col) if isinstance(score_col, str) else score_col).cast("double")
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast("long")
    base = df.where(s.isNotNull() & ~F.isnan(s) & y.isNotNull()).select(
        *group_cols,
        F.floor(s * micro).cast("long").alias("__sq"),
        y.alias("__y"),
    )
    cells = base.groupBy(*group_cols, "__sq").agg(
        F.count(F.lit(1)).cast(_D).alias("__n"),
        F.sum(F.col("__y").cast(_D)).alias("__ys"),
    )
    w = Window.partitionBy(*group_cols).orderBy("__sq")
    pre = cells.withColumn(
        "__P", F.sum("__ys").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "__C", F.sum("__n").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    a, b = pre.alias("a"), pre.alias("b")
    cond = F.col("a.__sq") <= F.col("b.__sq")
    for c in group_cols:
        cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{c}").alias(c) for c in group_cols],
        F.col("a.__sq").alias("__i"),
        F.col("b.__sq").alias("__j"),
        (
            (F.col("b.__P") - F.col("a.__P") + F.col("a.__ys")).cast("double")
            / (F.col("b.__C") - F.col("a.__C") + F.col("a.__n")).cast("double")
        ).alias("__avg"),
    )
    wi = (
        Window.partitionBy(*group_cols, "__i")
        .orderBy(F.col("__j").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = pairs.withColumn("__m", F.min("__avg").over(wi))
    fit = m.groupBy(*group_cols, "__j").agg(F.max("__m").alias("__fit"))
    return (
        cells.join(
            fit.withColumnRenamed("__j", "__sq"),
            [*group_cols, "__sq"],
        )
        .select(
            *group_cols,
            F.col("__sq").alias("score_q"),
            F.col("__n").cast("long").alias("n"),
            F.col("__ys").cast("string").alias("y_sum"),
            (F.col("__ys").cast("double") / F.col("__n").cast("double")).alias(
                "y_rate"
            ),
            F.col("__fit").alias("iso_fit"),
        )
    )


def isotonic_calibration_sql(
    table: str,
    group: str,
    score: str,
    label: str,
    *,
    micro: int = 100,
) -> str:
    """DuckDB twin of :func:`isotonic_calibration` (hugeint prefix
    sums, identical pair means, running min and final max)."""
    if micro < 1:
        raise ValueError(f"micro must be >= 1, got {micro}")
    return f"""
        WITH base AS (
            SELECT {group} AS g,
                   floor(CAST({score} AS DOUBLE) * {micro})::bigint AS sq,
                   CAST({label} AS BIGINT) AS y
            FROM {table}
            WHERE ({score}) IS NOT NULL AND NOT isnan(CAST({score} AS DOUBLE))
              AND ({label}) IS NOT NULL
        ),
        cells AS (
            SELECT g, sq, count(*)::hugeint AS n, sum(y::hugeint) AS ys
            FROM base GROUP BY g, sq
        ),
        pre AS (
            SELECT g, sq, n, ys,
                   sum(ys) OVER (PARTITION BY g ORDER BY sq
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS P,
                   sum(n) OVER (PARTITION BY g ORDER BY sq
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS C
            FROM cells
        ),
        pairs AS (
            SELECT a.g, a.sq AS i, b.sq AS j,
                   CAST(b.P - a.P + a.ys AS DOUBLE)
                     / CAST(b.C - a.C + a.n AS DOUBLE) AS avg
            FROM pre a JOIN pre b ON a.g = b.g AND a.sq <= b.sq
        ),
        m AS (
            SELECT g, i, j,
                   min(avg) OVER (PARTITION BY g, i ORDER BY j DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
            FROM pairs
        ),
        fit AS (SELECT g, j AS sq, max(mn) AS fit FROM m GROUP BY g, j)
        SELECT cells.g AS {group}, cells.sq AS score_q,
               CAST(n AS BIGINT) AS n, ys::varchar AS y_sum,
               CAST(ys AS DOUBLE) / CAST(n AS DOUBLE) AS y_rate,
               fit AS iso_fit
        FROM cells JOIN fit ON cells.g = fit.g AND cells.sq = fit.sq
    """

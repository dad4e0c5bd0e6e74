"""Exact Mann-Kendall trend test + Theil-Sen slope estimator.

The time-series kit so far answers "did it shift" (drift PSI/KS),
"where" (operators/changepoint CUSUM) and "does it persist"
(stats.grouped_autocorr); this answers the remaining classical
question — IS there a monotone trend, and how steep: the
Mann-Kendall test (Mann 1945, Kendall 1975 — the standard
nonparametric trend test in hydrology/telemetry) with Sen's slope
(Sen, JASA 1968) as the robust magnitude, per group, computed
EXACTLY so both hash-oracle.

Statistic: over pairs with t_a < t_b (pairs tied in time contribute
nothing, the tie-corrected convention),

    S = Σ sign(x_b − x_a)

an exact integer off a self-join of the per-group VALUE-COMPRESSED
joint histogram — cells (t_q, x_q, w), a cell pair contributing
w_a·w_b — i.e. exactly the grouped_kendall (q141) machinery applied
to (time, value); this module adds what the correlation form lacks:

* the tie-corrected variance (Kendall 1975, §5.9; with time-tie run
  lengths u and value-tie run lengths v)

      var(S) = [n(n−1)(2n+5) − Σu(u−1)(2u+5) − Σv(v−1)(2v+5)]/18
             + [Σu(u−1)(u−2)·Σv(v−1)(v−2)] / [9n(n−1)(n−2)]
             + [Σu(u−1)·Σv(v−1)] / [2n(n−1)]

  where every bracket is an EXACT decimal(38,0)/hugeint integer and
  the double is assembled with a FIXED shape — three
  cast-to-double divisions added left-to-right — so it is
  engine-identical;
* the continuity-corrected normal score z = (S∓1)/√var(S) (NULL when
  var ≤ 0, a degenerate all-tied corner of the textbook formula);
* Sen's slope: the weighted lower median of the pair slopes
  (x_b − x_a)/(t_b − t_a).  Each slope is ONE division of exact
  integers — (Δx_q·order_scale)/(Δt_q·scale), already in ORIGINAL
  value-per-order units — hence bit-identical across engines, and
  the median is selected on integers (2·cumweight ≥ W + W mod 2
  picks the lower median deterministically).

NULL/NaN values and NULL orders are dropped; groups with no
time-distinct pair (n < 2, or every row on one timestamp) are
excluded.

COST CONTRACT (same as grouped_kendall): the cell self-join is
O(cells²) per group where cells = distinct (t_q, x_q) pairs — the
design point is pre-quantized/low-cardinality axes (daily buckets,
fixed-point values); quantize time coarsely via ``order_scale``
for dense timestamps.

OVERFLOW CONTRACT (loud under ANSI): the variance cross-term
Σu(u−1)(u−2)·Σv(v−1)(v−2) is the binding bound — each factor ≤ n³,
so groups must keep n³·n³ < 1e38, n ≲ 2·10⁶ rows at full ties (far
larger when ties are rare, since the factors count TIED triples).

Scale shape: one map-side-combined joint-histogram groupBy (the only
row-scale stage), the cell self-join, two marginal aggregates and a
slope-histogram window — all cell-scale.  One shuffle touches rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_D = "decimal(38,0)"


def mann_kendall(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    order_col,
    *,
    scale: int = 1_000_000,
    order_scale: int = 1,
) -> DataFrame:
    """(group…, n, n_pairs, s, var_s, z, sen_slope) — exact
    Mann-Kendall trend test + Sen slope per group.  ``s`` is the
    exact integer statistic (string), ``n_pairs`` the number of
    time-distinct pairs, ``sen_slope`` in value units per order unit
    (both axes quantize-once: floor(value·scale),
    floor(order·order_scale))."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if order_scale < 1:
        raise ValueError(f"order_scale must be >= 1, got {order_scale}")
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast("double")
    o = (F.col(order_col) if isinstance(order_col, str) else order_col).cast("double")
    base = df.where(v.isNotNull() & ~F.isnan(v) & o.isNotNull() & ~F.isnan(o)).select(
        *group_cols,
        F.floor(o * order_scale).cast("long").cast(_D).alias("__tq"),
        F.floor(v * scale).cast("long").cast(_D).alias("__xq"),
    )
    cells = base.groupBy(*group_cols, "__tq", "__xq").agg(
        F.count(F.lit(1)).cast(_D).alias("__w")
    )
    a, b = cells.alias("a"), cells.alias("b")
    cond = F.col("a.__tq") < F.col("b.__tq")
    for c in group_cols:
        cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
    z0 = F.lit(0).cast(_D)
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{c}").alias(c) for c in group_cols],
        (F.col("a.__w") * F.col("b.__w")).alias("__ww"),
        F.when(F.col("a.__xq") < F.col("b.__xq"), F.lit(1).cast(_D))
        .when(F.col("a.__xq") > F.col("b.__xq"), F.lit(-1).cast(_D))
        .otherwise(z0)
        .alias("__sgn"),
        (
            ((F.col("b.__xq") - F.col("a.__xq")) * F.lit(order_scale).cast(_D)).cast(
                "double"
            )
            / ((F.col("b.__tq") - F.col("a.__tq")) * F.lit(scale).cast(_D)).cast(
                "double"
            )
        ).alias("__slope"),
    )
    sw = pairs.groupBy(*group_cols).agg(
        F.sum(F.col("__sgn") * F.col("__ww")).alias("__s"),
        F.sum("__ww").alias("__wt"),
    )
    # weighted lower median of the slope histogram: slope doubles are
    # identical across engines (one division each), so grouping and
    # ordering by them is too; the pick is decided on integers
    sh = pairs.groupBy(*group_cols, "__slope").agg(F.sum("__ww").alias("__hw"))
    wo = Window.partitionBy(*group_cols).orderBy("__slope")
    wa = Window.partitionBy(*group_cols)
    med = (
        sh.withColumn(
            "__cum", F.sum("__hw").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("__tot", F.sum("__hw").over(wa))
        .where(
            F.lit(2).cast(_D) * F.col("__cum")
            >= F.col("__tot") + F.pmod(F.col("__tot"), F.lit(2).cast(_D))
        )
        .groupBy(*group_cols)
        .agg(F.min("__slope").alias("__sen"))
    )

    def marginal(col: str, p: str):
        one = F.lit(1).cast(_D)
        m = base.groupBy(*group_cols, col).agg(F.count(F.lit(1)).cast(_D).alias("__u"))
        u = F.col("__u")
        return m.groupBy(*group_cols).agg(
            F.sum(u).alias(f"{p}n"),
            F.sum(u * (u - one) * (F.lit(2).cast(_D) * u + F.lit(5).cast(_D))).alias(
                f"{p}1"
            ),
            F.sum(u * (u - one) * (u - F.lit(2).cast(_D))).alias(f"{p}2"),
            F.sum(u * (u - one)).alias(f"{p}3"),
        )

    mt = marginal("__tq", "__t")
    mx = marginal("__xq", "__x").drop("__xn")
    agg = sw.join(med, group_cols).join(mt, group_cols).join(mx, group_cols)
    n = F.col("__tn")
    one = F.lit(1).cast(_D)
    two = F.lit(2).cast(_D)
    nn1 = n * (n - one)
    # fixed shape: (term1 + term2) + term3, each ONE double division
    term1 = (
        (nn1 * (two * n + F.lit(5).cast(_D)) - F.col("__t1") - F.col("__x1")).cast(
            "double"
        )
        / F.lit(18.0)
    )
    term2 = F.when(
        n > two,
        (F.col("__t2") * F.col("__x2")).cast("double")
        / (F.lit(9).cast(_D) * nn1 * (n - two)).cast("double"),
    ).otherwise(F.lit(0.0))
    term3 = (F.col("__t3") * F.col("__x3")).cast("double") / (two * nn1).cast("double")
    var_s = (term1 + term2) + term3
    s_d = F.col("__s").cast("double")
    zcol = (
        F.when(var_s <= F.lit(0.0), F.lit(None).cast("double"))
        .when(F.col("__s") > z0, (s_d - F.lit(1.0)) / F.sqrt(var_s))
        .when(F.col("__s") < z0, (s_d + F.lit(1.0)) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return agg.select(
        *group_cols,
        n.cast("long").alias("n"),
        F.col("__wt").cast("long").alias("n_pairs"),
        F.col("__s").cast("string").alias("s"),
        var_s.alias("var_s"),
        zcol.alias("z"),
        F.col("__sen").alias("sen_slope"),
    )


def mann_kendall_sql(
    table: str,
    group: str,
    value: str,
    order: str,
    *,
    scale: int = 1_000_000,
    order_scale: int = 1,
) -> str:
    """DuckDB twin of :func:`mann_kendall` (hugeint arithmetic,
    identical quantization, pair set, median pick and double
    expression shapes)."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if order_scale < 1:
        raise ValueError(f"order_scale must be >= 1, got {order_scale}")
    not_null = (
        f"{value} IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE)) AND "
        f"{order} IS NOT NULL AND NOT isnan(CAST({order} AS DOUBLE))"
    )
    return f"""
        WITH q AS (
            SELECT {group} AS g,
                   floor(CAST({order} AS DOUBLE) * {order_scale})::bigint::hugeint AS tq,
                   floor(CAST({value} AS DOUBLE) * {scale})::bigint::hugeint AS xq
            FROM {table} WHERE {not_null}
        ),
        cells AS (SELECT g, tq, xq, count(*)::hugeint AS w FROM q GROUP BY g, tq, xq),
        pairs AS (
            SELECT a.g,
                   a.w * b.w AS ww,
                   CASE WHEN a.xq < b.xq THEN 1::hugeint
                        WHEN a.xq > b.xq THEN (-1)::hugeint
                        ELSE 0::hugeint END AS sgn,
                   CAST((b.xq - a.xq) * {order_scale}::hugeint AS DOUBLE)
                     / CAST((b.tq - a.tq) * {scale}::hugeint AS DOUBLE) AS slope
            FROM cells a JOIN cells b ON a.g = b.g AND a.tq < b.tq
        ),
        sw AS (SELECT g, sum(sgn * ww) AS s, sum(ww) AS wt FROM pairs GROUP BY g),
        sh AS (SELECT g, slope, sum(ww) AS hw FROM pairs GROUP BY g, slope),
        sc AS (
            SELECT g, slope,
                   sum(hw) OVER (PARTITION BY g ORDER BY slope
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   sum(hw) OVER (PARTITION BY g) AS tot
            FROM sh
        ),
        med AS (
            SELECT g, min(slope) AS sen FROM sc
            WHERE 2 * cum >= tot + tot % 2 GROUP BY g
        ),
        mt AS (
            SELECT g, sum(u) AS tn,
                   sum(u * (u - 1) * (2 * u + 5)) AS t1,
                   sum(u * (u - 1) * (u - 2)) AS t2,
                   sum(u * (u - 1)) AS t3
            FROM (SELECT g, tq, count(*)::hugeint AS u FROM q GROUP BY g, tq)
            GROUP BY g
        ),
        mx AS (
            SELECT g, sum(u * (u - 1) * (2 * u + 5)) AS x1,
                   sum(u * (u - 1) * (u - 2)) AS x2,
                   sum(u * (u - 1)) AS x3
            FROM (SELECT g, xq, count(*)::hugeint AS u FROM q GROUP BY g, xq)
            GROUP BY g
        ),
        v AS (
            SELECT sw.g, tn AS n, wt, s, sen,
                   (CAST(tn * (tn - 1) * (2 * tn + 5) - t1 - x1 AS DOUBLE) / 18.0
                    + CASE WHEN tn > 2
                           THEN CAST(t2 * x2 AS DOUBLE)
                                  / CAST(9::hugeint * tn * (tn - 1) * (tn - 2) AS DOUBLE)
                           ELSE 0.0 END)
                   + CAST(t3 * x3 AS DOUBLE) / CAST(2::hugeint * tn * (tn - 1) AS DOUBLE)
                     AS var_s
            FROM sw
            JOIN med ON sw.g = med.g
            JOIN mt ON sw.g = mt.g
            JOIN mx ON sw.g = mx.g
        )
        SELECT g AS {group}, CAST(n AS BIGINT) AS n, CAST(wt AS BIGINT) AS n_pairs,
               s::varchar AS s, var_s,
               CASE WHEN var_s <= 0.0 THEN NULL
                    WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
                    WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
                    ELSE 0.0 END AS z,
               sen AS sen_slope
        FROM v
    """


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col,
    y_col,
    *,
    x_scale: int = 1,
    y_scale: int = 1,
) -> DataFrame:
    """(group…, n, slope, intercept, r2) — exact per-group ordinary
    least squares of y on x: the PARAMETRIC companion to Sen's slope
    (:func:`mann_kendall` answers "is there a monotone trend";
    this answers "what is the best-fit line and how much variance
    does it explain").  The classical closed form over exact
    integer moments:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
        r²        = (n·Σxy − Σx·Σy)² / [(n·Σx² − (Σx)²)(n·Σy² − (Σy)²)]

    Both axes quantize-once (floor(x·x_scale), floor(y·y_scale));
    every moment rides decimal(38,0)/hugeint, so slope and intercept
    are each ONE division of exactly-integer-valued doubles
    (rescaled back to ORIGINAL units by folding x_scale / y_scale
    into the integer numerator/denominator), and r² is the fixed
    num·num / (den·dy) two-multiply-one-division shape over
    correctly-rounded casts — all three hash-oracle-able.

    ``slope``/``intercept`` are NULL when x is constant (or n < 2);
    ``r²`` additionally NULL when y is constant (0/0).  The intercept
    is the fitted value at x = 0 (exact in original units whenever
    x·x_scale is integral, e.g. integer day indexes at x_scale=1).
    NULL/NaN on either axis drops the row; every surviving group
    gets a row.

    OVERFLOW CONTRACT (loud under ANSI): the binding bound is
    num·max(x_scale, y_scale) with num ~ n²·|xq|·|yq| — keep
    n²·|xq|max·|yq|max·scale < 1e38 (e.g. n ≤ 1e6 rows per group at
    day-scale x ≤ 1e4 and cent-scale y ≤ 1e9 leaves 1e9 headroom).
    Pre-bucket dense axes the mann_kendall way when in doubt.

    Scale shape: ONE map-side-combined six-number aggregate per
    group — nothing row-shaped after it, no window, no join.
    """
    if x_scale < 1:
        raise ValueError(f"x_scale must be >= 1, got {x_scale}")
    if y_scale < 1:
        raise ValueError(f"y_scale must be >= 1, got {y_scale}")
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    base = df.where(x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)).select(
        *group_cols,
        F.floor(x * x_scale).cast("long").cast(_D).alias("__xq"),
        F.floor(y * y_scale).cast("long").cast(_D).alias("__yq"),
    )
    xq, yq = F.col("__xq"), F.col("__yq")
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_D).alias("__n"),
        F.sum(xq).alias("__sx"),
        F.sum(yq).alias("__sy"),
        F.sum(xq * xq).alias("__sxx"),
        F.sum(xq * yq).alias("__sxy"),
        F.sum(yq * yq).alias("__syy"),
    )
    n = F.col("__n")
    sx, sy = F.col("__sx"), F.col("__sy")
    sxx, sxy, syy = F.col("__sxx"), F.col("__sxy"), F.col("__syy")
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    dy = n * syy - sy * sy
    zero = F.lit(0).cast(_D)
    xs = F.lit(x_scale).cast(_D)
    ys = F.lit(y_scale).cast(_D)
    slope = F.when(
        den != zero, (num * xs).cast("double") / (den * ys).cast("double")
    )
    intercept = F.when(
        den != zero,
        (sy * sxx - sx * sxy).cast("double") / (den * ys).cast("double"),
    )
    r2 = F.when(
        (den != zero) & (dy != zero),
        (num.cast("double") * num.cast("double"))
        / (den.cast("double") * dy.cast("double")),
    )
    return agg.select(
        *group_cols,
        n.cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def grouped_ols_sql(
    table: str,
    group: str,
    x: str,
    y: str,
    *,
    x_scale: int = 1,
    y_scale: int = 1,
) -> str:
    """DuckDB twin of :func:`grouped_ols` (hugeint moments, identical
    quantization and double expression shapes)."""
    if x_scale < 1:
        raise ValueError(f"x_scale must be >= 1, got {x_scale}")
    if y_scale < 1:
        raise ValueError(f"y_scale must be >= 1, got {y_scale}")
    not_null = (
        f"({x}) IS NOT NULL AND NOT isnan(CAST({x} AS DOUBLE)) AND "
        f"({y}) IS NOT NULL AND NOT isnan(CAST({y} AS DOUBLE))"
    )
    return f"""
        WITH q AS (
            SELECT {group} AS g,
                   floor(CAST({x} AS DOUBLE) * {x_scale})::bigint::hugeint AS xq,
                   floor(CAST({y} AS DOUBLE) * {y_scale})::bigint::hugeint AS yq
            FROM {table} WHERE {not_null}
        ),
        a AS (
            SELECT g, count(*)::hugeint AS n,
                   sum(xq) AS sx, sum(yq) AS sy,
                   sum(xq * xq) AS sxx, sum(xq * yq) AS sxy,
                   sum(yq * yq) AS syy
            FROM q GROUP BY g
        )
        SELECT g AS {group}, CAST(n AS BIGINT) AS n,
               CASE WHEN n * sxx - sx * sx <> 0
                    THEN CAST((n * sxy - sx * sy) * {x_scale}::hugeint AS DOUBLE)
                           / CAST((n * sxx - sx * sx) * {y_scale}::hugeint AS DOUBLE)
               END AS slope,
               CASE WHEN n * sxx - sx * sx <> 0
                    THEN CAST(sy * sxx - sx * sxy AS DOUBLE)
                           / CAST((n * sxx - sx * sx) * {y_scale}::hugeint AS DOUBLE)
               END AS intercept,
               CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
                    THEN (CAST(n * sxy - sx * sy AS DOUBLE)
                            * CAST(n * sxy - sx * sy AS DOUBLE))
                           / (CAST(n * sxx - sx * sx AS DOUBLE)
                                * CAST(n * syy - sy * sy AS DOUBLE))
               END AS r2
        FROM a
    """

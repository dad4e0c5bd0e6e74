"""Exact grouped survival curves: Kaplan–Meier in the log domain +
Nelson–Aalen cumulative hazard.

The time-to-event completion of the retention kit: retention_matrix
(q153) reports period-over-period activity shares on a fixed grid;
this estimates the survival FUNCTION from (duration, event) pairs
with right-censoring — "how long until a user churns / a conversation
ends / a tool call errors", with still-active subjects contributing
exactly what is known about them (they survived at least this long)
instead of being dropped or miscounted as deaths.

Float hazards designed out, per the library's fixed-point policy:

- the product-limit estimator Ŝ(t) = Π (1 − dᵢ/nᵢ) is an
  order-DEPENDENT float product — so it is never formed.  Instead
  each factor's log, ln(nᵢ−dᵢ) − ln(nᵢ), is built from the
  grouped_entropy micro-nat quantization of INTEGER args (each ln
  quantized ONCE to round(ln·10⁶) longs), and the running sum over
  event times is an exact integer cumulative — order-independent,
  engine-identical, hash-oracle-able.
- Nelson–Aalen Ĥ(t) = Σ dᵢ/nᵢ quantizes each term ONCE to
  (dᵢ·10⁶) div nᵢ (nonnegative operands: Spark ``div`` == DuckDB
  ``//``), exact integer cumsum, ONE division by 10⁶ for the double.
- the per-time hazard dᵢ/nᵢ is ONE division of exact integers.

``attach_survival`` adds the human-facing Ŝ(t) = exp(log_surv/10⁶)
column for presentation — exp is libm-divergent across engines, so it
is deliberately NOT part of the oracled surface (consumers exp the
exact integer themselves when they need bit-stability).

Scale shape: one map-side-combined (group, duration) cell histogram
is the only row-scale stage; the risk-set and both cumulative sums
are cell-scale windows over one (group)-partitioned exchange; no
joins.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MICRO = 1_000_000


def survival_curve(
    df: DataFrame,
    group_cols: list[str],
    duration_col,
    event_col,
) -> DataFrame:
    """(group…, t, n_risk, n_events, n_censored, hazard,
    cum_hazard_micro, cum_hazard, log_surv_micro, absorbed) — one row
    per distinct duration per group, ordered by t within each group's
    own timeline.

    - ``n_risk``: subjects with duration ≥ t (exact).
    - ``hazard`` = d/n_risk, ONE division of exact integers.
    - ``cum_hazard_micro``: Nelson–Aalen Σ (d·10⁶ div n_risk), exact
      integer (each term truncated < 1 micro-unit; documented).
      ``cum_hazard`` = that / 10⁶, one exact division.
    - ``log_surv_micro``: Σ [ln_micro(n−d) − ln_micro(n)] over event
      times ≤ t, exact integer ≤ 0; Ŝ(t) = exp(·/10⁶).  NULL on an
      absorbing row (d == n_risk: the survival curve hits exactly 0 —
      provably only possible at the group's LAST duration, since any
      longer-lived subject would still be at risk).  ``absorbed``
      marks that row.
    - ties: all subjects sharing a duration fall in one cell; events
      at t are conventionally counted before censorings at t (both
      are in the risk set at t) — the standard KM convention.

    The event column must be 0/1 (validated in-plan: anything else
    raises).  NULL duration or event drops the row; NULL group keys
    keep theirs (single lineage, no join).  Durations may be any
    integers (only compared, never computed on).  OVERFLOW: none
    beyond long cumsums (micro-terms are ≤ 10⁶ each; ≥ 10¹² rows per
    group before a long cumsum could saturate).
    """
    from pyspark.sql import Window

    dur = F.col(duration_col) if isinstance(duration_col, str) else duration_col
    ev = F.col(event_col) if isinstance(event_col, str) else event_col
    dt = df.select(dur.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"duration_col must be integral, got {dt}; quantize explicitly first"
        )
    e = F.when(
        ev.isin(0, 1), ev.cast("long")
    ).otherwise(F.raise_error(F.lit("survival_curve: event must be 0 or 1")))
    cells = (
        df.where(dur.isNotNull() & ev.isNotNull())
        .groupBy(*group_cols, dur.cast("long").alias("__t"))
        .agg(
            F.sum(e).alias("__d"),
            F.sum(F.lit(1) - e).alias("__c"),
            F.count(F.lit(1)).alias("__ct"),
        )
    )
    wg = Window.partitionBy(*group_cols)
    wcum = wg.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    lnm = lambda c: F.round(  # noqa: E731
        F.log(c.cast("double")) * F.lit(float(_MICRO))
    ).cast("long")
    w = (
        cells.withColumn("__N", F.sum("__ct").over(wg))
        .withColumn("__cum", F.sum("__ct").over(wcum))
    )
    n_risk = F.col("__N") - F.col("__cum") + F.col("__ct")
    w = w.withColumn("__nr", n_risk)
    d, nr = F.col("__d"), F.col("__nr")
    na_term = F.expr(f"(__d * {_MICRO}) div __nr")
    ls_term = F.when(d < nr, lnm(nr - d) - lnm(nr)).otherwise(F.lit(None))
    w = w.withColumn("__na", na_term).withColumn("__ls", ls_term)
    cumna = F.sum("__na").over(wcum)
    cumls = F.sum("__ls").over(wcum)
    return w.select(
        *group_cols,
        F.col("__t").alias("t"),
        nr.alias("n_risk"),
        d.alias("n_events"),
        F.col("__c").alias("n_censored"),
        (d.cast("double") / nr.cast("double")).alias("hazard"),
        cumna.alias("cum_hazard_micro"),
        (cumna.cast("double") / F.lit(float(_MICRO))).alias("cum_hazard"),
        F.when(d < nr, cumls).alias("log_surv_micro"),
        (d == nr).alias("absorbed"),
    )


def attach_survival(curve: DataFrame) -> DataFrame:
    """Presentation helper: adds ``survival`` = exp(log_surv_micro/10⁶)
    (0.0 on the absorbed row).  exp is libm-divergent across engines —
    this column is NOT oracle-stable by design; the exact integer
    ``log_surv_micro`` is."""
    return curve.withColumn(
        "survival",
        F.when(F.col("absorbed"), F.lit(0.0)).otherwise(
            F.exp(F.col("log_surv_micro").cast("double") / F.lit(float(_MICRO)))
        ),
    )


def survival_curve_sql(table: str, group: str, duration: str, event: str) -> str:
    """DuckDB twin of :func:`survival_curve` (same micro quantization,
    `//` on nonnegative operands, half-away round matching Spark
    HALF_UP on positive ln args)."""
    lnm = "round(ln({x}) * 1000000)::BIGINT"
    return f"""
        WITH __sv_cells AS (
            SELECT {group} AS g, ({duration})::BIGINT AS t,
                   sum(CASE WHEN ({event}) = 1 THEN 1
                            WHEN ({event}) = 0 THEN 0
                            ELSE CAST(error('survival_curve: event must be 0 or 1') AS BIGINT)
                       END)::BIGINT AS d,
                   sum(CASE WHEN ({event}) = 1 THEN 0 ELSE 1 END)::BIGINT AS c,
                   count(*)::BIGINT AS ct
            FROM {table}
            WHERE ({duration}) IS NOT NULL AND ({event}) IS NOT NULL
            GROUP BY 1, 2
        ),
        __sv_w AS (
            SELECT g, t, d, c, ct,
                   sum(ct) OVER (PARTITION BY g) -
                   sum(ct) OVER (PARTITION BY g ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) + ct AS nr
            FROM __sv_cells
        ),
        __sv_terms AS (
            SELECT g, t, d, c, nr,
                   (d * 1000000) // nr AS na,
                   CASE WHEN d < nr THEN
                       {lnm.format(x='nr - d')} - {lnm.format(x='nr')}
                   END AS ls
            FROM __sv_w
        )
        SELECT g AS {group}, t, nr AS n_risk, d AS n_events, c AS n_censored,
               d::DOUBLE / nr::DOUBLE AS hazard,
               sum(na) OVER (PARTITION BY g ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_hazard_micro,
               sum(na) OVER (PARTITION BY g ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)::DOUBLE / 1000000.0
                   AS cum_hazard,
               CASE WHEN d < nr THEN
                   sum(ls) OVER (PARTITION BY g ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)
               END AS log_surv_micro,
               d = nr AS absorbed
        FROM __sv_terms
    """

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
    from btl_bloomfilter_spark.operators.stats import _ln_micro

    lnm = _ln_micro  # shared quantize-once step (stats._ln_micro)
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


def logrank_test(
    df: DataFrame,
    group_cols: list[str],
    cohort_col,
    duration_col,
    event_col,
    *,
    weight: str = "logrank",
    stratum_col=None,
) -> DataFrame:
    """(group…, cohort_a, cohort_b, n_a, n_b, events_a, events_b,
    e_a_micro, e_a, o_minus_e, v_micro, chi2, z) — exact two-cohort
    log-rank test per group: the significance completion of
    :func:`survival_curve` (q183 draws each cohort's curve; this says
    whether the two curves differ beyond noise).  The Mantel–Cox
    statistic conditions on the risk sets, so censoring is handled
    for free — the comparison the naive "mean duration per cohort"
    t-test gets wrong whenever censoring differs between cohorts.

    At each pooled distinct duration t (d = pooled events, n = pooled
    at risk, n₁ = cohort-a at risk, d₁ = cohort-a events):

        O₁       = Σ d₁                       (exact long)
        E₁_micro = Σ (d·n₁·10⁶) div n         (each hypergeometric
                                               mean quantized ONCE to
                                               micro-units — nonneg
                                               operands, Spark ``div``
                                               == DuckDB ``//``;
                                               truncation < 1 micro
                                               per event time)
        V_micro  = Σ (d·(n−d)·n₁·(n−n₁)·10⁶)
                     div (n·n·(n−1))          (hypergeometric
                                               variance, same
                                               quantize-once; the
                                               n = 1 term is 0 by
                                               d·(n−d) = 0 and is
                                               guarded before the
                                               division — DuckDB
                                               evaluates eagerly)
        chi2     = (O₁·10⁶ − E₁_micro)² / (V_micro·10⁶)
                                              (ONE division of exact
                                               decimal/hugeint
                                               integers)
        z        = sign(O₁·10⁶ − E₁_micro) · √chi2
                                              (sign on the exact
                                               integer; negative z
                                               means cohort a saw
                                               FEWER events than
                                               expected — it
                                               survives longer)

    — engine-identical, hash-oracle-able including both doubles.

    ``weight="gehan"`` gives the Gehan–Breslow–Wilcoxon variant:
    each time's (O−E) and V term is multiplied by the pooled at-risk
    n (and n², respectively) AFTER the quantization, so every
    weighted sum stays an exact integer and chi2/z keep the same
    one-division shapes.  Early times weigh most — the test to reach
    for when the curves separate early and re-converge (the plain
    log-rank is optimal under proportional hazards; both are
    reported unweighted in e_a/v_micro, with o_minus_e following the
    chosen weight).  With one distinct event time the weight cancels
    and chi2/z are IDENTICAL doubles (same rational, both divisions
    correctly rounded — pinned by test).  OVERFLOW (gehan): the
    BINDING term is the chi2 numerator square — numw can reach
    ~N²·10⁶ for early-separating cohorts, so numw² ~ N⁴·10¹² hits
    decimal(38,0)/hugeint at per-group subjects ~2·10⁶ (the Σn²·v
    variance term alone would allow ~7·10⁹, but the square binds
    first; beyond the ceiling Spark NULLs/raises on decimal overflow
    while DuckDB raises out-of-range — documented contract).

    ``stratum_col`` gives the STRATIFIED log-rank (the survival
    analogue of stats.mantel_haenszel): risk sets form within each
    (group, stratum) and the quantized (O−E)/V terms sum across
    strata, so a confounder that tracks both cohort membership and
    the baseline hazard is conditioned away — the pooled test
    reports a large spurious z on planted survival-Simpson data
    where the stratified test reports z == 0.0 EXACTLY (pinned).
    The cohort a/b mapping and the two-cohort check stay
    GROUP-level; an ``n_strata`` column is prepended (schema
    unchanged when stratum_col is None); composes with
    ``weight="gehan"`` (the weight is the stratum's own at-risk n).
    NULL stratum drops the row.

    Cohort identity is deterministic: cohort_a = the group's MIN
    cohort label, cohort_b = MAX (reported).  A third label raises
    in-plan in both engines.  A single-cohort group degenerates to
    V = 0 → NULL chi2/z (there is nothing to compare; the row is
    kept).  Censoring rows (d = 0 at a time) contribute 0 to every
    sum and are harmless.  The event column must be 0/1 (in-plan
    raise otherwise); NULL cohort/duration/event drops the row; the
    duration must be integral (ValueError — quantize explicitly
    first, the survival_curve contract).

    OVERFLOW: the V numerator is ≤ n⁴·10⁶ — requires per-group
    subjects < ~9e7 on decimal(38,0)/hugeint (documented contract,
    far beyond any per-group risk set this library targets).

    Scale shape: one map-side-combined (group, cohort, duration)
    cell histogram is the only row-scale stage; the cohort-label
    window, the (group, t) re-aggregate, the four risk-set windows
    and the final test aggregate are all cell-scale; no joins.
    """
    from pyspark.sql import Window

    co = F.col(cohort_col) if isinstance(cohort_col, str) else cohort_col
    dur = F.col(duration_col) if isinstance(duration_col, str) else duration_col
    ev = F.col(event_col) if isinstance(event_col, str) else event_col
    dt = df.select(dur.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"duration_col must be integral, got {dt}; quantize explicitly first"
        )
    e = F.when(
        ev.isin(0, 1), ev.cast("long")
    ).otherwise(F.raise_error(F.lit("logrank_test: event must be 0 or 1")))
    strat = []
    if stratum_col is not None:
        st = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
        strat = [st.alias("__strat")]
    base = df.where(co.isNotNull() & dur.isNotNull() & ev.isNotNull())
    if strat:
        stc = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
        base = base.where(stc.isNotNull())
    cells = base.groupBy(
        *group_cols, *strat, co.alias("__co"), dur.cast("long").alias("__t")
    ).agg(F.sum(e).alias("__d"), F.count(F.lit(1)).alias("__ct"))
    skeys = ["__strat"] if strat else []
    # cohort identity stays GROUP-level (one a/b mapping across all
    # strata); risk sets are per (group, stratum)
    wg = Window.partitionBy(*group_cols)
    ws = Window.partitionBy(*group_cols, *skeys)
    m = (
        cells.withColumn("__lo", F.min("__co").over(wg))
        .withColumn("__hi", F.max("__co").over(wg))
    )
    i1 = (
        F.when(F.col("__co") == F.col("__lo"), F.lit(1))
        .when(F.col("__co") == F.col("__hi"), F.lit(0))
        .otherwise(
            F.raise_error(
                F.lit("logrank_test: more than two cohorts in a group")
            )
        )
    )
    tc = m.groupBy(*group_cols, *skeys, "__t").agg(
        F.sum(F.col("__d") * i1).alias("__d1"),
        F.sum(F.col("__ct") * i1).alias("__ct1"),
        F.sum("__d").alias("__dd"),
        F.sum("__ct").alias("__cta"),
        F.max("__lo").alias("__lo"),
        F.max("__hi").alias("__hi"),
    )
    wcum = ws.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    w = (
        tc.withColumn("__N", F.sum("__cta").over(ws))
        .withColumn("__N1", F.sum("__ct1").over(ws))
        .withColumn("__cum", F.sum("__cta").over(wcum))
        .withColumn("__cum1", F.sum("__ct1").over(wcum))
        .withColumn("__n", F.col("__N") - F.col("__cum") + F.col("__cta"))
        .withColumn("__n1", F.col("__N1") - F.col("__cum1") + F.col("__ct1"))
    )
    e1 = F.expr(f"(CAST(__dd AS DECIMAL(38,0)) * __n1 * {_MICRO}) div __n")
    v = F.when(
        F.col("__n") > 1,
        F.expr(
            f"(CAST(__dd AS DECIMAL(38,0)) * (__n - __dd) * __n1"
            f" * (__n - __n1) * {_MICRO})"
            f" div (CAST(__n AS DECIMAL(38,0)) * __n * (__n - 1))"
        ),
    ).otherwise(F.lit(0).cast("long"))
    _D = "decimal(38,0)"
    if weight == "logrank":
        wt = F.lit(1).cast(_D)
    elif weight == "gehan":
        # Gehan–Breslow: w_t = pooled at-risk n — early times weigh
        # more (exact long; applied AFTER the per-time quantization,
        # so each weighted term stays an exact integer)
        wt = F.col("__n").cast(_D)
    else:
        raise ValueError(
            f"logrank_test: weight must be 'logrank' or 'gehan', got {weight!r}"
        )
    numt = F.col("__d1").cast(_D) * F.lit(_MICRO) - e1.cast(_D)
    extra = (
        [F.countDistinct("__strat").alias("n_strata")] if skeys else []
    )
    ga = w.groupBy(*group_cols).agg(
        *extra,
        F.max("__lo").alias("cohort_a"),
        F.max("__hi").alias("cohort_b"),
        F.sum("__ct1").alias("n_a"),
        F.sum(F.col("__cta") - F.col("__ct1")).alias("n_b"),
        F.sum("__d1").alias("events_a"),
        F.sum(F.col("__dd") - F.col("__d1")).alias("events_b"),
        F.sum(e1).alias("__e1m"),
        F.sum(v).alias("__vm"),
        F.sum(wt * numt).alias("__numw"),
        F.sum(wt * wt * v.cast(_D)).alias("__vmw"),
    )
    num = F.col("__numw")
    chi2 = (num * num).cast("double") / (
        F.col("__vmw") * F.lit(_MICRO).cast(_D)
    ).cast("double")
    ok = F.col("__vmw") > 0
    ga = ga.withColumn("__chi2", F.when(ok, chi2))
    return ga.select(
        *group_cols,
        *(["n_strata"] if skeys else []),
        "cohort_a",
        "cohort_b",
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        F.col("__e1m").alias("e_a_micro"),
        (F.col("__e1m").cast("double") / F.lit(float(_MICRO))).alias("e_a"),
        (num.cast("double") / F.lit(float(_MICRO))).alias("o_minus_e"),
        F.col("__vm").alias("v_micro"),
        F.col("__chi2").alias("chi2"),
        F.when(
            ok, F.signum(num.cast("double")) * F.sqrt(F.col("__chi2"))
        ).alias("z"),
    )


def logrank_test_sql(
    table: str, group: str, cohort: str, duration: str, event: str,
    *, weight: str = "logrank", stratum: str | None = None,
) -> str:
    """DuckDB twin of :func:`logrank_test` (hugeint quantize-once
    terms, identical cohort-label mapping, `//` on nonnegative
    operands, identical double shapes, same per-time weight applied
    AFTER quantization)."""
    if weight == "logrank":
        wsql = "1::HUGEINT"
    elif weight == "gehan":
        wsql = "n::HUGEINT"
    else:
        raise ValueError(
            f"logrank_test_sql: weight must be 'logrank' or 'gehan',"
            f" got {weight!r}"
        )
    # stratified: the stratum key joins the cell/risk-set keys; the
    # cohort a/b mapping and the final sums stay GROUP-level
    st_sel = f", ({stratum}) AS st" if stratum else ""
    st_key = ", st" if stratum else ""
    st_nn = f" AND ({stratum}) IS NOT NULL" if stratum else ""
    st_part = "PARTITION BY g, st" if stratum else "PARTITION BY g"
    st_out = "count(DISTINCT st)::BIGINT AS n_strata, " if stratum else ""
    st_col = "n_strata, " if stratum else ""
    return f"""
        WITH __lr_cells AS (
            SELECT {group} AS g{st_sel}, {cohort} AS co,
                   ({duration})::BIGINT AS t,
                   sum(CASE WHEN ({event}) = 1 THEN 1
                            WHEN ({event}) = 0 THEN 0
                            ELSE CAST(error('logrank_test: event must be 0 or 1') AS BIGINT)
                       END)::BIGINT AS d,
                   count(*)::BIGINT AS ct
            FROM {table}
            WHERE ({cohort}) IS NOT NULL AND ({duration}) IS NOT NULL
              AND ({event}) IS NOT NULL{st_nn}
            GROUP BY ALL
        ),
        __lr_m AS (
            SELECT g{st_key}, co, t, d, ct,
                   min(co) OVER (PARTITION BY g) AS lo,
                   max(co) OVER (PARTITION BY g) AS hi
            FROM __lr_cells
        ),
        __lr_tc AS (
            SELECT g{st_key}, t,
                   sum(d * CASE WHEN co = lo THEN 1 WHEN co = hi THEN 0
                                ELSE CAST(error('logrank_test: more than two cohorts in a group') AS BIGINT)
                           END)::BIGINT AS d1,
                   sum(ct * CASE WHEN co = lo THEN 1 ELSE 0 END)::BIGINT
                       AS ct1,
                   sum(d)::BIGINT AS dd, sum(ct)::BIGINT AS cta,
                   max(lo) AS lo, max(hi) AS hi
            FROM __lr_m GROUP BY ALL
        ),
        __lr_w AS (
            SELECT g{st_key}, t, d1, ct1, dd, cta, lo, hi,
                   sum(cta) OVER ({st_part})
                   - sum(cta) OVER ({st_part} ORDER BY t
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) + cta AS n,
                   sum(ct1) OVER ({st_part})
                   - sum(ct1) OVER ({st_part} ORDER BY t
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) + ct1 AS n1
            FROM __lr_tc
        ),
        __lr_terms AS (
            SELECT g{st_key}, d1, ct1, dd, cta, lo, hi,
                   (dd::HUGEINT * n1 * 1000000) // n AS e1,
                   CASE WHEN n > 1 THEN
                       (dd::HUGEINT * (n - dd) * n1 * (n - n1) * 1000000)
                       // (n::HUGEINT * n * (n - 1))
                   ELSE 0 END AS v,
                   {wsql} AS w
            FROM __lr_w
        ),
        __lr_a AS (
            SELECT g, {st_out}max(lo) AS cohort_a, max(hi) AS cohort_b,
                   sum(ct1)::BIGINT AS n_a,
                   sum(cta - ct1)::BIGINT AS n_b,
                   sum(d1)::BIGINT AS events_a,
                   sum(dd - d1)::BIGINT AS events_b,
                   sum(e1)::BIGINT AS e1m, sum(v)::BIGINT AS vm,
                   sum(w * (d1::HUGEINT * 1000000 - e1)) AS numw,
                   sum(w * w * v::HUGEINT) AS vmw
            FROM __lr_terms GROUP BY g
        )
        SELECT g AS {group}, {st_col}cohort_a, cohort_b, n_a, n_b,
               events_a, events_b,
               e1m AS e_a_micro,
               e1m::DOUBLE / 1000000.0 AS e_a,
               numw::DOUBLE / 1000000.0 AS o_minus_e,
               vm AS v_micro,
               CASE WHEN vmw > 0 THEN
                   CAST(numw * numw AS DOUBLE)
                   / CAST(vmw * 1000000::HUGEINT AS DOUBLE)
               END AS chi2,
               CASE WHEN vmw > 0 THEN
                   (CASE WHEN numw > 0 THEN 1.0
                         WHEN numw < 0 THEN -1.0
                         ELSE 0.0 END)
                   * sqrt(CAST(numw * numw AS DOUBLE)
                          / CAST(vmw * 1000000::HUGEINT AS DOUBLE))
               END AS z
        FROM __lr_a
    """

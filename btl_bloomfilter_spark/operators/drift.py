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


def grouped_jsd(
    df: DataFrame,
    group_cols: list[str],
    cat_col,
    cohort_col,
) -> DataFrame:
    """(group…, n_a, n_b, k, h_a, h_b, h_m, jsd2_micro, jsd,
    jsd_norm) — exact-fixed-point Jensen–Shannon divergence between
    two cohorts' categorical distributions per group: the drift
    measure that completes the kit's corners — PSI (psi_report) is
    unbounded and explodes on empty bins, KS (grouped_ks) needs an
    ordered axis, JSD is symmetric, bounded in [0, ln 2], and defined
    whenever either cohort saw the category.

    The key identity: with cell counts a_i (Σ = A) and b_i (Σ = B),
    the mixture M = ½(P+Q) has m_i = (a_i·B + b_i·A)/(2AB) — so
    H(M) is EXACTLY the grouped_entropy identity applied to the
    integer pseudo-counts w_i = a_i·B + b_i·A over N' = 2AB:

        H_x = ln_micro(X) − (Σ x·ln_micro(x)) div X     (x ∈ {a, b, w};
                                                         every ln
                                                         quantized ONCE
                                                         per integer
                                                         count)
        JSD₂ = max(2·H_m − H_a − H_b, 0)    (exact integer adds; the
                                             clamp absorbs ≤ ~8
                                             micro-nat quantization
                                             skew at identity)
        jsd      = JSD₂ / (2·10⁶)            (one exact division)
        jsd_norm = JSD₂ / (2·ln_micro(2))    (JSD/ln 2 ∈ [0,1]; exact
                                             literal 1386294)

    — engine-identical, hash-oracle-able including both doubles.
    jsd_norm can overshoot 1 by a few micro (documented, observable
    in jsd2_micro).  NULL category or cohort drops the row; groups
    where either cohort is empty are EXCLUDED (JSD undefined).
    OVERFLOW: Σ w·ln_micro(w) ≤ 2AB·ln_micro(2AB) on decimal(38,0)
    → N per group ≲ 10¹⁵.

    Scale shape: ONE map-side-combined (group, cat) two-cohort cell
    histogram is the only row-scale stage; everything after is one
    cell-scale aggregate.  No joins, no windows.
    """
    cat = F.col(cat_col) if isinstance(cat_col, str) else cat_col
    coh = F.col(cohort_col) if isinstance(cohort_col, str) else cohort_col
    _D = "decimal(19,0)"
    from btl_bloomfilter_spark.operators.stats import _ln_micro

    lnm = _ln_micro  # shared quantize-once step (stats._ln_micro)
    cells = (
        df.where(cat.isNotNull() & coh.isNotNull())
        .groupBy(*group_cols, cat.alias("__cat"))
        .agg(
            F.sum(coh.cast("int")).cast(_D).alias("__a"),
            F.sum(F.lit(1) - coh.cast("int")).cast(_D).alias("__b"),
        )
    )
    from pyspark.sql import Window

    wg = Window.partitionBy(*group_cols)
    # NOTE: totals must not be named "__A"/"__B" — Spark's default
    # case-INsensitive resolution would make withColumn REPLACE
    # "__a"/"__b" (found the hard way; pinned by test_matches_brute)
    w = cells.withColumn("__tot_a", F.sum("__a").over(wg)).withColumn(
        "__tot_b", F.sum("__b").over(wg)
    )
    a, b, A, B = (
        F.col("__a"),
        F.col("__b"),
        F.col("__tot_a"),
        F.col("__tot_b"),
    )
    wgt = a * B + b * A
    z = F.lit(0).cast("decimal(38,0)")
    sa = F.sum(F.when(a > 0, a * lnm(a)).otherwise(z))
    sb = F.sum(F.when(b > 0, b * lnm(b)).otherwise(z))
    # wgt can be 0 only in a group with an empty cohort (excluded
    # below) — guard anyway: DuckDB's ln(0) errors BEFORE the filter
    sw = F.sum(F.when(wgt > 0, wgt * lnm(wgt)).otherwise(z))
    agg = w.groupBy(*group_cols).agg(
        F.max(A).alias("__At"),
        F.max(B).alias("__Bt"),
        F.count(F.lit(1)).alias("__k"),
        sa.alias("__sa"),
        sb.alias("__sb"),
        sw.alias("__sw"),
    )
    At, Bt = F.col("__At"), F.col("__Bt")
    ha = lnm(At) - F.expr("CAST(__sa div __At AS LONG)")
    hb = lnm(Bt) - F.expr("CAST(__sb div __Bt AS LONG)")
    two_ab = F.lit(2).cast(_D) * At * Bt
    agg = agg.withColumn("__2ab", two_ab)
    hm = lnm(F.col("__2ab")) - F.expr("CAST(__sw div __2ab AS LONG)")
    agg = (
        agg.withColumn("__ha", ha)
        .withColumn("__hb", hb)
        .withColumn("__hm", hm)
    )
    jsd2 = F.greatest(
        F.lit(2) * F.col("__hm") - F.col("__ha") - F.col("__hb"),
        F.lit(0).cast("long"),
    )
    agg = agg.withColumn("__jsd2", jsd2)
    j2 = F.col("__jsd2")
    return agg.where((At > 0) & (Bt > 0)).select(
        *group_cols,
        At.cast("long").alias("n_a"),
        Bt.cast("long").alias("n_b"),
        F.col("__k").alias("k"),
        F.col("__ha").alias("h_a"),
        F.col("__hb").alias("h_b"),
        F.col("__hm").alias("h_m"),
        j2.alias("jsd2_micro"),
        (j2.cast("double") / F.lit(2000000.0)).alias("jsd"),
        (j2.cast("double") / F.lit(1386294.0)).alias("jsd_norm"),
    )


def grouped_jsd_sql(table: str, group: str, cat: str, cohort_pred: str) -> str:
    """DuckDB twin of :func:`grouped_jsd` (hugeint pseudo-counts,
    identical micro-nat quantization, `//` integral division,
    identical clamp and double shapes)."""
    lnm = "round(ln({x}) * 1000000)::BIGINT"
    return f"""
        WITH __jsd_cells AS (
            SELECT {group} AS g, {cat} AS cat,
                   sum(CASE WHEN {cohort_pred} THEN 1 ELSE 0 END)::HUGEINT AS a,
                   sum(CASE WHEN {cohort_pred} THEN 0 ELSE 1 END)::HUGEINT AS b
            FROM {table}
            WHERE ({cat}) IS NOT NULL AND ({cohort_pred}) IS NOT NULL
            GROUP BY 1, 2
        ),
        __jsd_w AS (
            SELECT g, a, b,
                   sum(a) OVER (PARTITION BY g) AS at,
                   sum(b) OVER (PARTITION BY g) AS bt
            FROM __jsd_cells
        ),
        __jsd_agg AS (
            SELECT g, any_value(at) AS at, any_value(bt) AS bt,
                   count(*)::BIGINT AS k,
                   sum(CASE WHEN a > 0 THEN a * ({lnm.format(x='a')})
                            ELSE 0 END) AS sa,
                   sum(CASE WHEN b > 0 THEN b * ({lnm.format(x='b')})
                            ELSE 0 END) AS sb,
                   sum(CASE WHEN a * bt + b * at > 0 THEN
                           (a * bt + b * at)
                           * ({lnm.format(x='a * bt + b * at')})
                       ELSE 0 END) AS sw
            FROM __jsd_w GROUP BY g
        ),
        __jsd_h AS (
            SELECT g, at, bt, k,
                   {lnm.format(x='at')} - CAST(sa // at AS BIGINT) AS ha,
                   {lnm.format(x='bt')} - CAST(sb // bt AS BIGINT) AS hb,
                   {lnm.format(x='2 * at * bt')}
                       - CAST(sw // (2 * at * bt) AS BIGINT) AS hm
            FROM __jsd_agg
            WHERE at > 0 AND bt > 0
        )
        SELECT g AS {group}, CAST(at AS BIGINT) AS n_a,
               CAST(bt AS BIGINT) AS n_b, k, ha AS h_a, hb AS h_b,
               hm AS h_m,
               greatest(2 * hm - ha - hb, 0::BIGINT) AS jsd2_micro,
               greatest(2 * hm - ha - hb, 0::BIGINT)::DOUBLE / 2000000.0
                   AS jsd,
               greatest(2 * hm - ha - hb, 0::BIGINT)::DOUBLE / 1386294.0
                   AS jsd_norm
        FROM __jsd_h
        WHERE at > 0 AND bt > 0
    """

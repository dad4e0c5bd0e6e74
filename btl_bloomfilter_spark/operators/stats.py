"""Exact pairwise co-moments + Pearson correlation in one scan.

``corr``/``covar_samp`` aggregates are float-accumulation order
dependent: per-partition running sums re-associate differently under
repartitioning, so two runs (or two engines) disagree in the last
ulps and the result can never be hash-oracled.  This module applies
the library's fixed-point policy (quantize ONCE to long, aggregate
exactly) to second moments:

- each column is quantized ``floor(x * scale)`` to int64 (floor is
  IEEE-identical across engines where round's tie-break is not);
- Σx, Σx², Σx·y are EXACT integer sums — Spark aggregates
  decimal(38,0) (products of two int64 fit: < 8.6e37 < 1e38), the
  DuckDB twin aggregates hugeint — rendered as strings they are
  digit-identical, so q103 hash-oracles the full moment table;
- the correlation double is DERIVED from the exact sums with a fixed
  expression shape (cast-to-double each sum, one subtraction order,
  ``num / sqrt(dx) / sqrt(dy)``): conversions are correctly rounded
  and /,sqrt are IEEE-exact, so both engines produce the same double.

Rows with a NULL in ANY requested column are dropped up front (single
global n keeps every pair on the same support — document the
difference from pairwise-deletion corr).

Scale shape: ONE scan, ONE reduce of K + K(K+1)/2 + 1 numbers —
nothing row-shaped shuffles; the pair table is assembled from the
single agg row with an inline explode.  Overflow bound: requires
n · max|x·scale|² < 1e38 (at 1e12 rows that allows |x·scale| up to
~3e12), enforced nowhere at runtime — documented contract, like the
rest of the fixed-point family.
"""
from __future__ import annotations

from itertools import combinations, combinations_with_replacement

from pyspark.sql import DataFrame, functions as F

_D = "decimal(19,0)"  # per-value; products promote to decimal(38,0)


def _ln_micro(c):
    """round(ln(c)·10⁶) as an exact LONG — the shared micro-nat
    quantize-once step of the entropy/inequality/divergence/survival
    family (ONE rounding per distinct integral input; IEEE log and
    round-half-even are engine-identical on these integer args, so
    every downstream integer sum stays hash-oracle-able).  Single
    source of truth: a change to the quantization semantics lands in
    every operator at once instead of diverging across inline
    copies."""
    return F.round(F.log(c.cast("double")) * F.lit(1000000.0)).cast("long")


def _nullsafe_join(left, right, group_cols, how="left"):
    """Join two per-group aggregates on the group keys with
    NULL == NULL semantics (eqNullSafe) — groupBy keeps NULL group
    keys, so a bare equi-join would silently drop that group's row
    (the mutual_info/fleiss review lesson, applied once here rather
    than re-inlined per operator; pinned by the null-group tests of
    every caller)."""
    import functools as _ft
    import operator as _op

    r2 = right
    for g in group_cols:
        r2 = r2.withColumnRenamed(g, f"__r_{g}")
    cond = _ft.reduce(
        _op.and_,
        [left[g].eqNullSafe(r2[f"__r_{g}"]) for g in group_cols],
    )
    return left.join(r2, cond, how).drop(*[f"__r_{g}" for g in group_cols])



def exact_comoments(df: DataFrame, cols: list[str], *, scale: int = 100) -> DataFrame:
    """One row per unordered column pair (a < b by position): exact
    n / Σa / Σb / Σa² / Σb² / Σab as STRINGS (digit-exact across
    engines) plus the derived ``corr`` double."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    if scale <= 0:
        raise ValueError("scale must be positive")
    # listwise drop of NULL *and* NaN, stated explicitly in BOTH
    # engines: Spark's na.drop treats NaN as null but SQL IS NOT NULL
    # does not, so the twin must share one spelled-out predicate or a
    # NaN-bearing double column silently diverges the support set
    keep = None
    for c in cols:
        cond = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        keep = cond if keep is None else (keep & cond)
    q = df.where(keep).select(
        *[F.floor(F.col(c).cast("double") * scale).cast("long").alias(c) for c in cols]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(_D)).alias(f"s_{c}"))
    for a, b in combinations_with_replacement(cols, 2):
        aggs.append(F.sum(F.col(a).cast(_D) * F.col(b).cast(_D)).alias(f"p_{a}_{b}"))
    row = q.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("n").cast(_D)
        num = (n * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast("double")
        dx = (n * F.col(f"p_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast("double")
        dy = (n * F.col(f"p_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast("double")
        return num / F.sqrt(dx) / F.sqrt(dy)

    pair_structs = [
        _pair_struct(a, b, corr_expr)
        for a, b in combinations(cols, 2)
    ]
    return row.select(F.explode(F.array(*pair_structs)).alias("pair")).select("pair.*")


def _pair_struct(a: str, b: str, corr_expr):
    return F.struct(
        F.lit(a).alias("col_a"),
        F.lit(b).alias("col_b"),
        F.col("n").alias("n"),
        F.col(f"s_{a}").cast("string").alias("sum_a"),
        F.col(f"s_{b}").cast("string").alias("sum_b"),
        F.col(f"p_{a}_{a}").cast("string").alias("sumsq_a"),
        F.col(f"p_{b}_{b}").cast("string").alias("sumsq_b"),
        F.col(f"p_{a}_{b}").cast("string").alias("sum_ab"),
        corr_expr(a, b).alias("corr"),
    )


def exact_comoments_sql(table: str, cols: list[str], *, scale: int = 100) -> str:
    """DuckDB twin: hugeint sums, identical quantization, identical
    corr expression shape.  Test-scale readability (one UNION ALL arm
    per pair) — the Spark operator is the corpus path."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    not_null = " AND ".join(
        f"({c} IS NOT NULL AND NOT isnan(CAST({c} AS DOUBLE)))" for c in cols
    )
    qexprs = ", ".join(
        f"CAST(floor(CAST({c} AS DOUBLE) * {scale}) AS BIGINT) AS {c}" for c in cols
    )
    sums = ["count(*) AS n"]
    for c in cols:
        sums.append(f"sum({c}::hugeint) AS s_{c}")
    for a, b in combinations_with_replacement(cols, 2):
        sums.append(f"sum({a}::hugeint * {b}::hugeint) AS p_{a}_{b}")
    base = (
        f"q AS (SELECT {qexprs} FROM {table} WHERE {not_null}), "
        f"m AS (SELECT {', '.join(sums)} FROM q)"
    )
    arms = []
    for a, b in combinations(cols, 2):
        num = f"(n::hugeint * p_{a}_{b} - s_{a} * s_{b})"
        dx = f"(n::hugeint * p_{a}_{a} - s_{a} * s_{a})"
        dy = f"(n::hugeint * p_{b}_{b} - s_{b} * s_{b})"
        arms.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, n, "
            f"s_{a}::varchar AS sum_a, s_{b}::varchar AS sum_b, "
            f"p_{a}_{a}::varchar AS sumsq_a, p_{b}_{b}::varchar AS sumsq_b, "
            f"p_{a}_{b}::varchar AS sum_ab, "
            f"CAST({num} AS DOUBLE) / sqrt(CAST({dx} AS DOUBLE)) / sqrt(CAST({dy} AS DOUBLE)) AS corr "
            f"FROM m"
        )
    return f"WITH {base} " + " UNION ALL ".join(arms)


def grouped_auc(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col,
) -> DataFrame:
    """Exact per-group ROC AUC via the Mann-Whitney U statistic with
    midrank tie handling — the standard eval for a quality/filter
    classifier's scores, computed exactly so it hash-oracles.

    Identity: with positives' midranks summed over the ascending
    score order, U = ranksum_pos - n_pos(n_pos+1)/2 and
    AUC = U / (n_pos·n_neg).  Everything stays integral by tracking
    2·ranksum: a tied group of size g starting after c lower-scored
    rows contributes pos_in_group · (2c + g + 1).  Sums ride in
    decimal(38,0) (2·ranksum ≤ 2n², fine to n ~ 7e18); the only float
    is ONE division of two exactly-integer-valued doubles, identical
    in every engine, so q133 hash-matches the double too.

    ``label_col`` may be a column name or a boolean Column expression.
    Rows with NULL score or label are dropped; groups with no
    positives or no negatives are EXCLUDED (AUC undefined there).

    Scale shape: one map-side-combined groupBy to the (group, score)
    histogram, a per-GROUP cumulative window over the histogram
    (value-compressed; partitioned by group, never global), and a
    group-sized final aggregate.
    """
    from pyspark.sql import Window

    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    g = [F.col(c) for c in group_cols]
    h = (
        df.where(F.col(score_col).isNotNull() & lab.isNotNull())
        .groupBy(*g, F.col(score_col).alias("__s"))
        .agg(
            F.sum(lab.cast("int")).cast("decimal(38,0)").alias("__pos"),
            F.sum(F.lit(1) - lab.cast("int")).cast("decimal(38,0)").alias("__neg"),
        )
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = h.withColumn(
        "__cb", F.coalesce(F.sum(F.col("__pos") + F.col("__neg")).over(w), F.lit(0))
    )
    agg = c.groupBy(*group_cols).agg(
        F.sum(
            F.col("__pos") * (F.lit(2) * F.col("__cb") + F.col("__pos") + F.col("__neg") + F.lit(1))
        ).alias("__rs2"),
        F.sum("__pos").alias("__np"),
        F.sum("__neg").alias("__nn"),
    )
    u2 = F.col("__rs2") - F.col("__np") * (F.col("__np") + F.lit(1))
    return (
        agg.where((F.col("__np") > 0) & (F.col("__nn") > 0))
        .select(
            *group_cols,
            F.col("__np").cast("long").alias("n_pos"),
            F.col("__nn").cast("long").alias("n_neg"),
            u2.cast("long").alias("u2"),
            (
                u2.cast("double")
                / (F.lit(2) * F.col("__np") * F.col("__nn")).cast("double")
            ).alias("auc"),
        )
    )


def grouped_auc_sql(
    table: str, group: str, score: str, label_pred: str
) -> str:
    """DuckDB twin of :func:`grouped_auc` (hugeint arithmetic; the
    same single int-double division)."""
    return f"""
        WITH h AS (
            SELECT {group} AS g, {score} AS s,
                   sum(CASE WHEN {label_pred} THEN 1 ELSE 0 END)::hugeint AS pos,
                   sum(CASE WHEN {label_pred} THEN 0 ELSE 1 END)::hugeint AS neg
            FROM {table}
            WHERE {score} IS NOT NULL AND ({label_pred}) IS NOT NULL
            GROUP BY 1, 2
        ),
        c AS (
            SELECT *, coalesce(sum(pos + neg) OVER (
                PARTITION BY g ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
            FROM h
        ),
        a AS (
            SELECT g, sum(pos * (2 * cb + pos + neg + 1)) AS rs2,
                   sum(pos) AS np, sum(neg) AS nn
            FROM c GROUP BY g
        )
        SELECT g AS {group},
               CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               CAST(rs2 - np * (np + 1) AS BIGINT) AS u2,
               (CAST(rs2 - np * (np + 1) AS DOUBLE) / CAST(2 * np * nn AS DOUBLE)) AS auc
        FROM a WHERE np > 0 AND nn > 0
    """


def threshold_sweep(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col,
) -> DataFrame:
    """Exact per-group precision/recall sweep: one row per distinct
    score value s with the confusion counts of the rule
    ``predict positive iff score >= s`` — the threshold-picking
    companion to :func:`grouped_auc`, and exact for the same reason
    (counts are integers; precision/recall are single divisions of
    exactly-integer-valued doubles, engine-identical).

    Returns (group..., threshold, tp, fp, fn, tn, precision, recall).
    NULL scores/labels are dropped.  Groups with NO positives are
    EXCLUDED (recall is 0/0 there — grouped_auc's contract, and a
    cross-engine hazard: Spark yields NaN where a DuckDB install
    without IEEE float ops yields NULL); groups with no negatives are
    kept (every rate stays well-defined).  Scale shape: the same
    map-side-combined (group, score) histogram as grouped_auc, one
    per-GROUP descending cumulative window, one per-group totals
    window — value-compressed throughout.
    """
    from pyspark.sql import Window

    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    g = [F.col(c) for c in group_cols]
    h = (
        df.where(F.col(score_col).isNotNull() & lab.isNotNull())
        .groupBy(*g, F.col(score_col).alias("threshold"))
        .agg(
            F.sum(lab.cast("long")).alias("__pos"),
            F.sum(F.lit(1) - lab.cast("long")).alias("__neg"),
        )
    )
    w_desc = (
        Window.partitionBy(*group_cols)
        .orderBy(F.desc("threshold"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    out = (
        h.withColumn("tp", F.sum("__pos").over(w_desc))
        .withColumn("fp", F.sum("__neg").over(w_desc))
        .withColumn("__np", F.sum("__pos").over(w_all))
        .withColumn("__nn", F.sum("__neg").over(w_all))
    )
    return out.where(F.col("__np") > 0).select(
        *group_cols,
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        (F.col("__np") - F.col("tp")).cast("long").alias("fn"),
        (F.col("__nn") - F.col("fp")).cast("long").alias("tn"),
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double")).alias(
            "precision"
        ),
        (F.col("tp").cast("double") / F.col("__np").cast("double")).alias("recall"),
    )


def grouped_spearman(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact per-group Spearman rank correlation with midrank ties —
    the monotone-association companion to :func:`exact_comoments`
    (Pearson) and :func:`grouped_auc`, computed exactly so it
    hash-oracles.

    Under ties the textbook 1 - 6Σd²/(n(n²-1)) formula is WRONG; the
    correct statistic is Pearson over midranks.  Everything stays
    integral by tracking 2·midrank = rank_asc + (n + 1 - rank_desc)
    (ranks are pure comparisons — no float arithmetic — so doubles
    rank identically in every engine); the five co-moment sums ride
    decimal(38,0)/hugeint (bound: n·(2n)⁴-ish terms hold to n ~ 1e9
    rows per group), and the derived rho uses the library's fixed
    expression shape (cast each exact sum to double, one subtraction
    order, num / sqrt(dx) / sqrt(dy)) — conversions correctly
    rounded, /,sqrt IEEE-exact, so both engines produce the same
    double and q137 hash-matches rho too.

    Rows with NULL or NaN in either column are dropped; groups where
    either column is constant (zero rank variance — rho undefined,
    and a NaN-vs-NULL cross-engine hazard) are EXCLUDED, mirroring
    grouped_auc's degenerate-group contract.  ``sum_d2`` = Σ(2rx-2ry)²
    is emitted as an exact integer witness (string, digit-identical).

    Scale shape: four rank windows + one count window per group
    partition (never global), then one map-side-combined group
    aggregate of six numbers.  Row-scale windows: per-group sorts are
    the cost, same as any exact rank statistic.
    """
    from pyspark.sql import Window

    keep = None
    for c in (x_col, y_col):
        cond = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        keep = cond if keep is None else (keep & cond)
    q = df.where(keep)
    g = Window.partitionBy(*group_cols)

    def mid2(col: str) -> F.Column:
        asc = F.rank().over(g.orderBy(F.col(col).asc()))
        desc = F.rank().over(g.orderBy(F.col(col).desc()))
        n = F.count(F.lit(1)).over(g)
        return (asc.cast("long") + n + F.lit(1) - desc.cast("long")).cast(_D)

    r = q.select(
        *group_cols, mid2(x_col).alias("__rx"), mid2(y_col).alias("__ry")
    )
    a = r.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_D).alias("__n"),
        F.sum("__rx").alias("__sx"),
        F.sum("__ry").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).alias("__syy"),
        F.sum(F.col("__rx") * F.col("__ry")).alias("__sxy"),
        F.sum(
            (F.col("__rx") - F.col("__ry")) * (F.col("__rx") - F.col("__ry"))
        ).alias("__sd2"),
    )
    num = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dx = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return (
        a.where((dx != F.lit(0)) & (dy != F.lit(0)))
        .select(
            *group_cols,
            F.col("__n").cast("long").alias("n"),
            F.col("__sd2").cast("string").alias("sum_d2"),
            (
                num.cast("double") / F.sqrt(dx.cast("double")) / F.sqrt(dy.cast("double"))
            ).alias("rho"),
        )
    )


def grouped_spearman_sql(table: str, group: str, x: str, y: str) -> str:
    """DuckDB twin of :func:`grouped_spearman` (hugeint sums, same
    2·midrank identity and rho expression shape)."""
    not_null = (
        f"{x} IS NOT NULL AND NOT isnan(CAST({x} AS DOUBLE)) AND "
        f"{y} IS NOT NULL AND NOT isnan(CAST({y} AS DOUBLE))"
    )
    return f"""
        WITH q AS (SELECT {group} AS g, {x} AS x, {y} AS y FROM {table} WHERE {not_null}),
        r AS (
            SELECT g,
                   (rank() OVER (PARTITION BY g ORDER BY x)
                    + count(*) OVER (PARTITION BY g) + 1
                    - rank() OVER (PARTITION BY g ORDER BY x DESC))::hugeint AS rx,
                   (rank() OVER (PARTITION BY g ORDER BY y)
                    + count(*) OVER (PARTITION BY g) + 1
                    - rank() OVER (PARTITION BY g ORDER BY y DESC))::hugeint AS ry
            FROM q
        ),
        a AS (
            SELECT g, count(*)::hugeint AS n,
                   sum(rx) AS sx, sum(ry) AS sy,
                   sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
                   sum(rx * ry) AS sxy,
                   sum((rx - ry) * (rx - ry)) AS sd2
            FROM r GROUP BY g
        )
        SELECT g AS {group}, CAST(n AS BIGINT) AS n, sd2::varchar AS sum_d2,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS rho
        FROM a
        WHERE n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
    """


def grouped_kendall(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact per-group Kendall tau-b with tie correction — the
    pair-concordance companion to :func:`grouped_spearman`, computed
    exactly so it hash-oracles.

    All counts are integral: concordant/discordant pairs come from a
    self-join of the per-group VALUE-COMPRESSED joint histogram
    (cells (x, y, w); a cell pair with x_a < x_b contributes w_a·w_b
    to C if y_a < y_b, to D if y_a > y_b), tie corrections n1/n2 from
    the marginal histograms, n0 = n(n−1)/2.  Sums ride
    decimal(38,0)/hugeint; tau_b = (C−D)/√(n0−n1)/√(n0−n2) uses the
    library's fixed num/sqrt/sqrt shape, so the double is
    engine-identical and q141 hash-matches it too.

    COST CONTRACT: the cell self-join is O(Dx·Dy)² per group, where
    Dx/Dy are the DISTINCT value counts — this is the exact-tau
    design point for low-cardinality or pre-quantized columns (the
    fixed-point policy: quantize first, then every engine agrees);
    for high-cardinality doubles quantize to a grid before calling.
    Rows with NULL/NaN in either column are dropped; groups with
    zero variance in either column (tau undefined, NaN hazard) are
    excluded, mirroring grouped_spearman.

    Scale shape: one map-side-combined joint-histogram groupBy (the
    only row-scale stage — its shuffle is emitted once and reused by
    the self-join and both marginals, ReusedExchange), two cell-scale
    marginal aggregates off the same histogram, one cell-scale
    self-join on the group key, one group-sized final reduce.
    """
    keep = None
    for c in (x_col, y_col):
        cond = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        keep = cond if keep is None else (keep & cond)
    q = df.where(keep).select(
        *group_cols, F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    )
    cells = q.groupBy(*group_cols, "__x", "__y").agg(
        F.count(F.lit(1)).cast(_D).alias("__w")
    )
    a, b = cells.alias("a"), cells.alias("b")
    cond = F.col("a.__x") < F.col("b.__x")
    for c in group_cols:
        cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{c}").alias(c) for c in group_cols],
        (F.col("a.__w") * F.col("b.__w")).alias("__ww"),
        F.when(F.col("a.__y") < F.col("b.__y"), F.lit(1))
        .when(F.col("a.__y") > F.col("b.__y"), F.lit(-1))
        .otherwise(F.lit(0))
        .alias("__sgn"),
    )
    cd = pairs.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("__sgn") == 1, F.col("__ww")).otherwise(F.lit(0).cast(_D))).alias("__c"),
        F.sum(F.when(F.col("__sgn") == -1, F.col("__ww")).otherwise(F.lit(0).cast(_D))).alias("__d"),
    )

    def marginal(col: str, alias: str):
        # marginals off the CELL histogram, not the raw rows: all
        # three consumers (pair self-join + both marginals) then
        # share one identical row-scale aggregate whose shuffle the
        # planner emits once and reuses (ReusedExchange) — one source
        # pass instead of three (the jonckheere_terpstra rewrite,
        # applied back to its parent)
        m = cells.groupBy(*group_cols, col).agg(F.sum("__w").alias("__t"))
        return m.groupBy(*group_cols).agg(
            F.sum(F.col("__t") * (F.col("__t") - 1)).alias(alias),
            F.sum("__t").alias(f"{alias}_n"),
        )

    mx = marginal("__x", "__tx2")  # 2·n1 (tie-pair count doubled)
    my = marginal("__y", "__ty2")
    agg = cd.join(mx, group_cols).join(my, group_cols)
    n = F.col("__tx2_n")
    n0_2 = n * (n - 1)  # 2·n0
    da = n0_2 - F.col("__tx2")  # 2·(n0 − n1)
    db = n0_2 - F.col("__ty2")
    num = F.lit(2).cast(_D) * (F.col("__c") - F.col("__d"))  # 2·(C−D)
    return (
        agg.where((da != F.lit(0)) & (db != F.lit(0)))
        .select(
            *group_cols,
            n.cast("long").alias("n"),
            F.col("__c").cast("string").alias("concordant"),
            F.col("__d").cast("string").alias("discordant"),
            (
                num.cast("double") / F.sqrt(da.cast("double")) / F.sqrt(db.cast("double"))
            ).alias("tau_b"),
        )
    )


def grouped_kendall_sql(table: str, group: str, x: str, y: str) -> str:
    """DuckDB twin of :func:`grouped_kendall` (hugeint arithmetic,
    identical doubled-count tau expression shape)."""
    not_null = (
        f"{x} IS NOT NULL AND NOT isnan(CAST({x} AS DOUBLE)) AND "
        f"{y} IS NOT NULL AND NOT isnan(CAST({y} AS DOUBLE))"
    )
    return f"""
        WITH q AS (SELECT {group} AS g, {x} AS x, {y} AS y FROM {table} WHERE {not_null}),
        cells AS (SELECT g, x, y, count(*)::hugeint AS w FROM q GROUP BY g, x, y),
        cd AS (
            SELECT a.g,
                   sum(CASE WHEN a.y < b.y THEN a.w * b.w ELSE 0::hugeint END) AS c,
                   sum(CASE WHEN a.y > b.y THEN a.w * b.w ELSE 0::hugeint END) AS d
            FROM cells a JOIN cells b ON a.g = b.g AND a.x < b.x
            GROUP BY a.g
        ),
        mx AS (
            -- marginals off the CELL histogram (the Spark side's
            -- ReusedExchange shape mirrored)
            SELECT g, sum(t * (t - 1)) AS tx2, sum(t) AS n FROM (
                SELECT g, x, sum(w) AS t FROM cells GROUP BY g, x
            ) GROUP BY g
        ),
        my AS (
            SELECT g, sum(t * (t - 1)) AS ty2 FROM (
                SELECT g, y, sum(w) AS t FROM cells GROUP BY g, y
            ) GROUP BY g
        )
        SELECT cd.g AS {group}, CAST(mx.n AS BIGINT) AS n,
               c::varchar AS concordant, d::varchar AS discordant,
               CAST(2 * (c - d) AS DOUBLE)
                 / sqrt(CAST(mx.n * (mx.n - 1) - tx2 AS DOUBLE))
                 / sqrt(CAST(mx.n * (mx.n - 1) - ty2 AS DOUBLE)) AS tau_b
        FROM cd JOIN mx ON cd.g = mx.g JOIN my ON cd.g = my.g
        WHERE mx.n * (mx.n - 1) - tx2 <> 0 AND mx.n * (mx.n - 1) - ty2 <> 0
    """


def grouped_gini(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    *,
    scale: int = 100,
) -> DataFrame:
    """Exact per-group Gini coefficient — the concentration metric for
    corpus curation (how skewed is token/byte mass across sources,
    domains, conversations; a Gini near 1 says a handful of domains
    dominate the mix), computed exactly so it hash-oracles.

    Identity (sorted values x_(1..n), S = Σx, A = Σ i·x_(i)):
    G = (2A − (n+1)·S) / (n·S).  Ties make the rank i ambiguous but
    not the SUM — tied runs have equal x, so Σ i·x over a run is
    order-independent: a run of c copies of value v after cb lower
    rows contributes v·c·(2cb+c+1)/2 to A.  With values quantized
    ONCE (floor(x·scale), the fixed-point policy) 2A and S are exact
    integers off the value-compressed histogram (the grouped_auc
    machinery), sums ride decimal(38,0)/hugeint, and G is ONE
    division of exactly-integer-valued doubles — engine-identical.

    Contract: values must be non-negative (Gini is undefined below
    zero; negative quantized values raise nothing distributed —
    documented, like the family's overflow bounds).  NULL/NaN rows
    are dropped; groups with S = 0 (all-zero mass) are excluded.

    Scale shape: one map-side-combined (group, value) histogram, one
    per-GROUP cumulative window over it (value-compressed, never
    global), one group-sized final aggregate.
    """
    from pyspark.sql import Window

    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    h = (
        df.where(v.isNotNull() & ~F.isnan(v.cast("double")))
        .select(
            *group_cols,
            F.floor(v.cast("double") * scale).cast("long").alias("__v"),
        )
        .groupBy(*group_cols, "__v")
        .agg(F.count(F.lit(1)).cast(_D).alias("__c"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = h.withColumn("__cb", F.coalesce(F.sum("__c").over(w), F.lit(0).cast(_D)))
    vq = F.col("__v").cast(_D)
    agg = c.groupBy(*group_cols).agg(
        F.sum("__c").alias("__n"),
        F.sum(vq * F.col("__c")).alias("__s"),
        F.sum(
            vq * F.col("__c") * (F.lit(2).cast(_D) * F.col("__cb") + F.col("__c") + 1)
        ).alias("__a2"),
    )
    num = F.col("__a2") - (F.col("__n") + 1) * F.col("__s")
    den = F.col("__n") * F.col("__s")
    return agg.where(F.col("__s") != F.lit(0)).select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        F.col("__s").cast("string").alias("mass_q"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


def grouped_gini_sql(table: str, group: str, value: str, *, scale: int = 100) -> str:
    """DuckDB twin of :func:`grouped_gini` (hugeint arithmetic,
    identical quantization and single-division shape)."""
    return f"""
        WITH h AS (
            SELECT {group} AS g,
                   CAST(floor(CAST({value} AS DOUBLE) * {scale}) AS BIGINT) AS v,
                   count(*)::hugeint AS c
            FROM {table}
            WHERE {value} IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE))
            GROUP BY 1, 2
        ),
        cw AS (
            SELECT *, coalesce(sum(c) OVER (
                PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
            FROM h
        ),
        a AS (
            SELECT g, sum(c) AS n, sum(v::hugeint * c) AS s,
                   sum(v::hugeint * c * (2 * cb + c + 1)) AS a2
            FROM cw GROUP BY g
        )
        SELECT g AS {group}, CAST(n AS BIGINT) AS n, s::varchar AS mass_q,
               CAST(a2 - (n + 1) * s AS DOUBLE) / CAST(n * s AS DOUBLE) AS gini
        FROM a WHERE s <> 0
    """


def _poisson1_thresholds(cap: int = 8) -> list[int]:
    """Cumulative Poisson(1) CDF as integer thresholds on the 60-bit
    hash space: multiplicity m = #{k < cap : u60 >= floor(cdf_k·2^60)}.
    Computed once in Python floats and embedded as LITERALS in both
    engines, so the mapping is engine-identical by construction.
    P(X > 7) ~ 1e-5: the cap's truncation bias is far below bootstrap
    resolution and, being part of the spec, identical everywhere."""
    import math

    cdf, acc = [], 0.0
    for k in range(cap):
        acc += math.exp(-1.0) / math.factorial(k)
        cdf.append(min(int(acc * (1 << 60)), (1 << 60) - 1))
    return cdf


def bootstrap_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    key_cols: list[str],
    *,
    replicates: int = 48,
    scale: int = 1_000_000,
    seed: int | str = 0,
    alpha_milli: int = 50,
) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the
    per-group mean — error bars for curation metrics in ONE pass over
    100 TB, with none of the replay problems of sampled bootstraps.

    The online/Poisson bootstrap (Oza & Russell AISTATS'01; Chamandy
    et al., Google 2012) replaces resampling with an independent
    Poisson(1) multiplicity per (row, replicate).  Here the Poisson
    draw is the library's content hash pushed through the fixed
    integer-threshold inverse CDF (:func:`_poisson1_thresholds`), so
    every multiplicity is a pure function of (seed, key columns,
    replicate) — partitioning-independent, replayable in SQL, and
    hash-oracle-able end to end:

      * values quantized ONCE (floor(x·scale)) — replicate sums are
        exact integers in decimal(38,0)/hugeint;
      * each replicate mean is ONE division of exactly-integer-valued
        doubles; replicates whose total multiplicity is 0 are skipped
        (identically in both engines);
      * the CI is the nearest-rank percentile of the sorted replicate
        means (sort_array/list_sort agree on non-NaN doubles):
        lo_idx = max(1, ceil(alpha/2·R)), hi_idx = R+1−lo_idx.

    NULL/NaN values are dropped; groups with no surviving replicate
    are excluded.  ``key_cols`` must
    identify rows stably (the same contract as every content-keyed
    operator in `functions/splits`).

    Scale shape: the ×replicates explode feeds DIRECTLY into a
    map-side-combined (group, replicate) aggregate — the blowup never
    shuffles row-shaped; then a (groups × replicates)-sized window-
    free aggregate assembles the CI.  Cost is `replicates` extra
    codegen projections per row, no extra scan.
    """
    from ..functions.splits import _hash60

    if replicates < 4:
        raise ValueError(f"replicates must be >= 4, got {replicates}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if not 0 < alpha_milli < 1000:
        raise ValueError(f"alpha_milli must be in (0, 1000), got {alpha_milli}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast("double")
    base = df.where(v.isNotNull() & ~F.isnan(v)).select(
        *group_cols,
        *[F.col(k) for k in key_cols],
        F.floor(v * scale).cast("long").alias("__xq"),
    )
    full = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__xq").cast(_D)).alias("__sx"),
    )
    rep = base.select(
        *group_cols,
        "__xq",
        F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("__b"),
        *[F.col(k) for k in key_cols],
    )
    u = _hash60(list(key_cols) + ["__b"], seed)
    m = None
    for t in _poisson1_thresholds():
        term = F.when(u >= F.lit(t), 1).otherwise(0)
        m = term if m is None else (m + term)
    rep = rep.withColumn("__m", m.cast(_D))
    g1 = rep.groupBy(*group_cols, "__b").agg(
        F.sum(F.col("__m") * F.col("__xq").cast(_D)).alias("__smx"),
        F.sum("__m").alias("__sm"),
    )
    means = g1.where(F.col("__sm") > 0).select(
        *group_cols,
        (
            F.col("__smx").cast("double")
            / (F.lit(scale).cast(_D) * F.col("__sm")).cast("double")
        ).alias("__mean"),
    )
    arr = means.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__mean")).alias("__a")
    )
    r_cnt = F.size("__a")
    lo_idx = F.greatest(
        F.lit(1),
        F.ceil(
            (F.lit(alpha_milli) * r_cnt).cast("double") / F.lit(2000.0)
        ).cast("int"),
    )
    hi_idx = r_cnt + 1 - lo_idx
    return arr.join(full, group_cols).select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        (
            F.col("__sx").cast("double")
            / (F.lit(scale).cast(_D) * F.col("__n").cast(_D)).cast("double")
        ).alias("mean"),
        F.element_at("__a", lo_idx).alias("ci_lo"),
        F.element_at("__a", hi_idx).alias("ci_hi"),
        r_cnt.cast("int").alias("n_replicates"),
    )


def bootstrap_ci_sql(
    table: str,
    group: str,
    value: str,
    key: str,
    *,
    replicates: int = 48,
    scale: int = 1_000_000,
    seed: int | str = 0,
    alpha_milli: int = 50,
) -> str:
    """DuckDB twin of :func:`bootstrap_ci` (same literal Poisson
    thresholds, hugeint sums, identical index arithmetic; ``key`` is
    a single key expression — the test-scale twin)."""
    from ..functions.splits import _key_sql

    ts = _poisson1_thresholds()
    h = f"((('0x' || substr({{k}}, 1, 15))::ubigint))::bigint"
    key_md5 = _key_sql(seed, ["key_col", "b"])
    u = h.format(k=key_md5)
    m_expr = " + ".join(f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in ts)
    return f"""
        WITH base AS (
            SELECT {group} AS g, {key} AS key_col,
                   CAST(floor(CAST({value} AS DOUBLE) * {scale}) AS BIGINT) AS xq
            FROM {table}
            WHERE ({value}) IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE))
        ),
        fullagg AS (
            SELECT g, count(*)::hugeint AS n, sum(xq::hugeint) AS sx
            FROM base GROUP BY g
        ),
        rep AS (
            SELECT g, xq, key_col, CAST(r.range AS BIGINT) AS b
            FROM base CROSS JOIN range(0, {replicates}) r
        ),
        rep_u AS (SELECT g, xq, b, {u} AS u FROM rep),
        g1 AS (
            SELECT g, b, sum(({m_expr})::hugeint * xq::hugeint) AS smx,
                   sum(({m_expr})::hugeint) AS sm
            FROM rep_u GROUP BY g, b
        ),
        means AS (
            SELECT g, CAST(smx AS DOUBLE) / CAST({scale}::hugeint * sm AS DOUBLE) AS mean
            FROM g1 WHERE sm > 0
        ),
        arr AS (
            SELECT g, list_sort(list(mean)) AS a FROM means GROUP BY g
        ),
        idx AS (
            SELECT g, a, len(a) AS r,
                   greatest(1, CAST(ceil(CAST({alpha_milli} * len(a) AS DOUBLE) / 2000.0) AS INT)) AS lo
            FROM arr
        )
        SELECT idx.g AS {group}, CAST(n AS BIGINT) AS n,
               CAST(sx AS DOUBLE) / CAST({scale}::hugeint * n AS DOUBLE) AS mean,
               a[lo] AS ci_lo, a[r + 1 - lo] AS ci_hi,
               CAST(r AS INT) AS n_replicates
        FROM idx JOIN fullagg ON idx.g = fullagg.g
    """


def _two_cohort_hist(df, group_cols, value_col, cohort_col) -> DataFrame:
    """Shared value-compressed per-group two-cohort histogram
    (__v, __c1, __c2) — the common first stage of grouped_ks and
    grouped_cliffs_delta; NULL values/cohorts and NaN dropped."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    coh = F.col(cohort_col) if isinstance(cohort_col, str) else cohort_col
    return (
        df.where(v.isNotNull() & ~F.isnan(v.cast("double")) & coh.isNotNull())
        .groupBy(*group_cols, v.alias("__v"))
        .agg(
            F.sum(coh.cast("int")).cast(_D).alias("__c1"),
            F.sum(F.lit(1) - coh.cast("int")).cast(_D).alias("__c2"),
        )
    )


def _two_cohort_hist_sql(table: str, group: str, value: str, cohort_pred: str) -> str:
    """DuckDB twin of :func:`_two_cohort_hist` as a CTE body."""
    return f"""
            SELECT {group} AS g, {value} AS v,
                   sum(CASE WHEN {cohort_pred} THEN 1 ELSE 0 END)::hugeint AS c1,
                   sum(CASE WHEN {cohort_pred} THEN 0 ELSE 1 END)::hugeint AS c2
            FROM {table}
            WHERE {value} IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE))
              AND ({cohort_pred}) IS NOT NULL
            GROUP BY 1, 2"""


def grouped_ks(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    cohort_col,
) -> DataFrame:
    """Exact per-group two-sample Kolmogorov-Smirnov statistic — the
    distribution-shift test for numeric columns (did this month's
    turn lengths / quality scores drift from last month's), the
    rank-based complement to the binned PSI drift kit.

    D = max_v |F1(v) − F2(v)| is a RATIONAL: with per-cohort
    cumulative counts c1, c2 and totals n1, n2, the numerator
    max|c1·n2 − c2·n1| is an exact integer over the merged
    value-compressed histogram (values compare, never compute — no
    quantization needed), and D is ONE division by n1·n2 of exactly-
    integer-valued doubles — engine-identical, hash-oracle-able.

    ``cohort_col`` may be a column name or a boolean Column: True =
    cohort 1, False = cohort 2.  NULL values/cohorts are dropped;
    groups where either cohort is empty are excluded (D degenerates
    to 1 vacuously).  Returns (group..., n1, n2, ks_num, d).

    Scale shape: one map-side-combined (group, value) histogram with
    per-cohort conditional counts, one per-GROUP cumulative window
    (value-compressed, never global), one group-sized max aggregate.
    """
    from pyspark.sql import Window

    h = _two_cohort_hist(df, group_cols, value_col, cohort_col)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = h.withColumn("__f1", F.sum("__c1").over(w)).withColumn(
        "__f2", F.sum("__c2").over(w)
    )
    wa = Window.partitionBy(*group_cols)
    c = c.withColumn("__n1", F.sum("__c1").over(wa)).withColumn(
        "__n2", F.sum("__c2").over(wa)
    )
    agg = c.groupBy(*group_cols).agg(
        F.max(
            F.abs(F.col("__f1") * F.col("__n2") - F.col("__f2") * F.col("__n1"))
        ).alias("__num"),
        F.first("__n1").alias("__n1"),
        F.first("__n2").alias("__n2"),
    )
    return agg.where((F.col("__n1") > 0) & (F.col("__n2") > 0)).select(
        *group_cols,
        F.col("__n1").cast("long").alias("n1"),
        F.col("__n2").cast("long").alias("n2"),
        F.col("__num").cast("string").alias("ks_num"),
        (
            F.col("__num").cast("double")
            / (F.col("__n1") * F.col("__n2")).cast("double")
        ).alias("d"),
    )


def grouped_ks_sql(table: str, group: str, value: str, cohort_pred: str) -> str:
    """DuckDB twin of :func:`grouped_ks` (hugeint arithmetic, same
    single-division shape)."""
    return f"""
        WITH h AS ({_two_cohort_hist_sql(table, group, value, cohort_pred)}
        ),
        c AS (
            SELECT g,
                   sum(c1) OVER (PARTITION BY g ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
                   sum(c2) OVER (PARTITION BY g ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2,
                   sum(c1) OVER (PARTITION BY g) AS n1,
                   sum(c2) OVER (PARTITION BY g) AS n2
            FROM h
        ),
        a AS (
            SELECT g, max(abs(f1 * n2 - f2 * n1)) AS num,
                   any_value(n1) AS n1, any_value(n2) AS n2
            FROM c GROUP BY g
        )
        SELECT g AS {group}, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               num::varchar AS ks_num,
               CAST(num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS d
        FROM a WHERE n1 > 0 AND n2 > 0
    """


def grouped_welch(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    cohort_col,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact-moment Welch two-sample t-test per group — the A/B
    primitive (did the new filter change mean quality?  is this
    source's mean turn length different?), computed so it
    hash-oracles: values quantized ONCE (fixed-point policy), both
    cohorts' n / Σx / Σx² exact integers in decimal(38,0)/hugeint,
    and every derived double a FIXED expression shape over
    correctly-rounded casts (the q103 corr precedent):

      mean_i = S_i / (scale·n_i)
      var_i  = (n_i·SS_i − S_i²) / (n_i·(n_i−1)·scale²)     [sample]
      se2    = var_1/n_1 + var_2/n_2
      t      = (mean_1 − mean_2) / √se2
      df     = se2² / ((var_1/n_1)²/(n_1−1) + (var_2/n_2)²/(n_2−1))

    — single-operator IEEE ops in a deterministic order, so both
    engines produce bit-identical t and Welch df.

    ``cohort_col``: name or boolean Column (True = cohort 1).
    NULL/NaN values and NULL cohorts are dropped; groups where either
    cohort has n < 2, or BOTH variances are zero (t undefined), are
    excluded — decided on exact integers, never floats.

    Scale shape: ONE map-side-combined conditional aggregate of six
    numbers per group; nothing row-shaped after the scan.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast("double")
    coh = F.col(cohort_col) if isinstance(cohort_col, str) else cohort_col
    q = df.where(v.isNotNull() & ~F.isnan(v) & coh.isNotNull()).select(
        *group_cols,
        F.floor(v * scale).cast("long").cast(_D).alias("__xq"),
        coh.cast("int").alias("__c"),
    )
    one = F.col("__c") == 1

    def agg_for(c1: bool, name: str):
        cond = one if c1 else ~one
        z = F.lit(0).cast(_D)
        return [
            F.sum(F.when(cond, F.lit(1).cast(_D)).otherwise(z)).alias(f"__n{name}"),
            F.sum(F.when(cond, F.col("__xq")).otherwise(z)).alias(f"__s{name}"),
            F.sum(F.when(cond, F.col("__xq") * F.col("__xq")).otherwise(z)).alias(
                f"__ss{name}"
            ),
        ]

    a = q.groupBy(*group_cols).agg(*agg_for(True, "1"), *agg_for(False, "2"))
    sc = F.lit(scale).cast(_D)
    n1, s1, ss1 = F.col("__n1"), F.col("__s1"), F.col("__ss1")
    n2, s2, ss2 = F.col("__n2"), F.col("__s2"), F.col("__ss2")
    num1 = n1 * ss1 - s1 * s1
    num2 = n2 * ss2 - s2 * s2
    m1 = s1.cast("double") / (sc * n1).cast("double")
    m2 = s2.cast("double") / (sc * n2).cast("double")
    v1 = num1.cast("double") / (n1 * (n1 - 1) * sc * sc).cast("double")
    v2 = num2.cast("double") / (n2 * (n2 - 1) * sc * sc).cast("double")
    se1 = v1 / n1.cast("double")
    se2c = v2 / n2.cast("double")
    se = se1 + se2c
    t = (m1 - m2) / F.sqrt(se)
    dfw = (se * se) / (
        se1 * se1 / (n1 - 1).cast("double") + se2c * se2c / (n2 - 1).cast("double")
    )
    return (
        a.where(
            (n1 >= 2) & (n2 >= 2) & ~((num1 == F.lit(0)) & (num2 == F.lit(0)))
        )
        .select(
            *group_cols,
            n1.cast("long").alias("n1"),
            n2.cast("long").alias("n2"),
            s1.cast("string").alias("sum1_q"),
            s2.cast("string").alias("sum2_q"),
            (m1 - m2).alias("mean_diff"),
            t.alias("t"),
            dfw.alias("df_welch"),
        )
    )


def grouped_welch_sql(
    table: str, group: str, value: str, cohort_pred: str, *, scale: int = 1_000_000
) -> str:
    """DuckDB twin of :func:`grouped_welch` — the derived doubles use
    the IDENTICAL expression shape and operand order."""
    return f"""
        WITH q AS (
            SELECT {group} AS g,
                   CAST(floor(CAST({value} AS DOUBLE) * {scale}) AS BIGINT)::hugeint AS xq,
                   CASE WHEN {cohort_pred} THEN 1 ELSE 0 END AS c
            FROM {table}
            WHERE ({value}) IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE))
              AND ({cohort_pred}) IS NOT NULL
        ),
        a AS (
            SELECT g,
                   sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::hugeint AS n1,
                   sum(CASE WHEN c = 1 THEN xq ELSE 0 END) AS s1,
                   sum(CASE WHEN c = 1 THEN xq * xq ELSE 0 END) AS ss1,
                   sum(CASE WHEN c = 1 THEN 0 ELSE 1 END)::hugeint AS n2,
                   sum(CASE WHEN c = 1 THEN 0 ELSE xq END) AS s2,
                   sum(CASE WHEN c = 1 THEN 0 ELSE xq * xq END) AS ss2
            FROM q GROUP BY g
        ),
        d AS (
            SELECT g, n1, n2, s1, s2,
                   CAST(s1 AS DOUBLE) / CAST({scale}::hugeint * n1 AS DOUBLE) AS m1,
                   CAST(s2 AS DOUBLE) / CAST({scale}::hugeint * n2 AS DOUBLE) AS m2,
                   (CAST(n1 * ss1 - s1 * s1 AS DOUBLE)
                      / CAST(n1 * (n1 - 1) * {scale}::hugeint * {scale}::hugeint AS DOUBLE))
                     / CAST(n1 AS DOUBLE) AS se1,
                   (CAST(n2 * ss2 - s2 * s2 AS DOUBLE)
                      / CAST(n2 * (n2 - 1) * {scale}::hugeint * {scale}::hugeint AS DOUBLE))
                     / CAST(n2 AS DOUBLE) AS se2,
                   n1 * ss1 - s1 * s1 AS num1, n2 * ss2 - s2 * s2 AS num2
            FROM a
        )
        SELECT g AS {group}, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               s1::varchar AS sum1_q, s2::varchar AS sum2_q,
               m1 - m2 AS mean_diff,
               (m1 - m2) / sqrt(se1 + se2) AS t,
               ((se1 + se2) * (se1 + se2))
                 / (se1 * se1 / CAST(n1 - 1 AS DOUBLE) + se2 * se2 / CAST(n2 - 1 AS DOUBLE))
                 AS df_welch
        FROM d
        WHERE n1 >= 2 AND n2 >= 2 AND NOT (num1 = 0 AND num2 = 0)
    """


def calibration_bins(
    df: DataFrame,
    group_cols: list[str],
    score_col,
    label_col,
    *,
    n_bins: int,
    micro: int = 1_000_000,
) -> DataFrame:
    """Exact per-group reliability diagram + expected calibration
    error — the third leg of the classifier-eval kit (grouped_auc
    ranks, threshold_sweep picks the operating point, this checks
    whether the scores MEAN what they say; Guo et al. ICML'17).

    Scores are expected in [0, 1]; out-of-range values clamp into the
    edge bins (documented contract, both engines).  Per (group, bin =
    clamp(floor(score·n_bins))): n, n_pos, and the bin's score mass
    quantized ONCE to the micro grid (floor(score·micro) per row —
    the library's fixed-point policy), summed exactly.  Everything
    derived is a single division of exactly-integer-valued operands:

      confidence = Σ⌊s·micro⌋ / (micro·n_bin)
      frac_pos   = n_pos / n_bin
      ece        = Σ_bins |micro·pos_b − Σ⌊s·micro⌋_b| / (micro·n_grp)

    — the ECE numerator is an EXACT integer (the usual Σ n_b/n·|acc−conf|
    float chain re-associated into one integral sum), so the whole
    row, doubles included, hash-oracles.  ``ece`` repeats on every row
    of its group.  The micro-grid quantization of confidence is the
    only approximation (≤ 1e-6 per row, policy-documented); counts
    and ECE are exact on the grid.  NULL/NaN scores and NULL labels
    are dropped (the spelled-out NaN predicate — the file's documented
    NaN-vs-NULL cross-engine hazard).

    ``score_col``/``label_col`` may be column names or Column
    expressions.  Scale shape: one map-side-combined (group, bin)
    aggregate over a pure row-local projection, plus one per-GROUP
    window over the (≤ n_bins)-row bin table — nothing row-shaped
    after the first aggregate.
    """
    from pyspark.sql import Window

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if micro < 1:
        raise ValueError(f"micro must be >= 1, got {micro}")
    sc = (F.col(score_col) if isinstance(score_col, str) else score_col).cast("double")
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    binc = F.greatest(
        F.lit(0), F.least(F.floor(sc * n_bins).cast("long"), F.lit(n_bins - 1))
    )
    rows = df.where(sc.isNotNull() & ~F.isnan(sc) & lab.isNotNull()).select(
        *group_cols,
        binc.alias("bin"),
        lab.cast("int").alias("__lab"),
        F.floor(sc * micro).cast("long").alias("__sm"),
    )
    b = rows.groupBy(*group_cols, "bin").agg(
        F.count(F.lit(1)).cast(_D).alias("__n"),
        F.sum("__lab").cast(_D).alias("__pos"),
        F.sum(F.col("__sm").cast(_D)).alias("__s"),
    )
    w = Window.partitionBy(*group_cols)
    mic = F.lit(micro).cast(_D)
    b = b.withColumn("__ntot", F.sum("__n").over(w)).withColumn(
        "__enum", F.sum(F.abs(mic * F.col("__pos") - F.col("__s"))).over(w)
    )
    return b.select(
        *group_cols,
        F.col("bin"),
        F.col("__n").cast("long").alias("n"),
        F.col("__pos").cast("long").alias("n_pos"),
        F.col("__s").cast("string").alias("conf_micro_sum"),
        (F.col("__s").cast("double") / (mic * F.col("__n")).cast("double")).alias(
            "confidence"
        ),
        (F.col("__pos").cast("double") / F.col("__n").cast("double")).alias("frac_pos"),
        (F.col("__enum").cast("double") / (mic * F.col("__ntot")).cast("double")).alias(
            "ece"
        ),
    )


def calibration_bins_sql(
    table: str,
    group: str,
    score: str,
    label_pred: str,
    *,
    n_bins: int,
    micro: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`calibration_bins` (hugeint arithmetic,
    identical clamp/quantize expressions and division shapes)."""
    return f"""
        WITH rows_q AS (
            SELECT {group} AS g,
                   greatest(0, least(CAST(floor(CAST({score} AS DOUBLE) * {n_bins}) AS BIGINT),
                                     {n_bins - 1})) AS bin,
                   CASE WHEN {label_pred} THEN 1 ELSE 0 END AS lab,
                   CAST(floor(CAST({score} AS DOUBLE) * {micro}) AS BIGINT) AS sm
            FROM {table}
            WHERE ({score}) IS NOT NULL AND NOT isnan(CAST({score} AS DOUBLE))
              AND ({label_pred}) IS NOT NULL
        ),
        b AS (
            SELECT g, bin, count(*)::hugeint AS n, sum(lab)::hugeint AS pos,
                   sum(sm::hugeint) AS s
            FROM rows_q GROUP BY g, bin
        ),
        wdw AS (
            SELECT *, sum(n) OVER (PARTITION BY g) AS ntot,
                   sum(abs({micro}::hugeint * pos - s)) OVER (PARTITION BY g) AS enum_
            FROM b
        )
        SELECT g AS {group}, bin, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS n_pos,
               s::varchar AS conf_micro_sum,
               CAST(s AS DOUBLE) / CAST({micro}::hugeint * n AS DOUBLE) AS confidence,
               CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
               CAST(enum_ AS DOUBLE) / CAST({micro}::hugeint * ntot AS DOUBLE) AS ece
        FROM wdw
    """


def threshold_sweep_sql(table: str, group: str, score: str, label_pred: str) -> str:
    """DuckDB twin of :func:`threshold_sweep`."""
    return f"""
        WITH h AS (
            SELECT {group} AS g, {score} AS threshold,
                   sum(CASE WHEN {label_pred} THEN 1 ELSE 0 END)::bigint AS pos,
                   sum(CASE WHEN {label_pred} THEN 0 ELSE 1 END)::bigint AS neg
            FROM {table}
            WHERE {score} IS NOT NULL AND ({label_pred}) IS NOT NULL
            GROUP BY 1, 2
        ),
        c AS (
            SELECT g, threshold,
                   sum(pos) OVER (PARTITION BY g ORDER BY threshold DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
                   sum(neg) OVER (PARTITION BY g ORDER BY threshold DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
                   sum(pos) OVER (PARTITION BY g) AS np,
                   sum(neg) OVER (PARTITION BY g) AS nn
            FROM h
        )
        SELECT g AS {group}, threshold,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(np - tp AS BIGINT) AS fn, CAST(nn - fp AS BIGINT) AS tn,
               (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)) AS precision,
               (CAST(tp AS DOUBLE) / CAST(np AS DOUBLE)) AS recall
        FROM c WHERE np > 0
    """


def grouped_cliffs_delta(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    cohort_col,
) -> DataFrame:
    """Exact per-group Cliff's delta — the nonparametric effect size
    that the eval kit's tests (KS: *is* there a shift; Welch: mean
    shift) leave unquantified: δ = P(x > y) − P(x < y) for x drawn
    from cohort 1 and y from cohort 2 (Cliff, Psych. Bull. 1993).

    δ is a RATIONAL of exact pair counts: over the value-compressed
    per-group histogram with per-cohort counts (c1, c2) ordered by
    value, with F2⁻(v) = Σ c2 strictly below v,

      gt   = Σ_v c1(v)·F2⁻(v)              (x > y pairs)
      lt   = Σ_v c1(v)·(n2 − F2⁻(v) − c2(v)) (x < y pairs)
      ties = Σ_v c1(v)·c2(v)
      δ    = (gt − lt) / (n1·n2)

    — values compare, never compute (no quantization), every count an
    exact integer in decimal(38,0)/hugeint, and δ ONE division of
    exactly-integer-valued doubles: engine-identical, hash-oracle-able
    including the double.  Identity with AUC: δ = 2·AUC(x vs y) − 1
    (pinned by a test).

    ``cohort_col`` may be a column name or boolean Column (True =
    cohort 1).  NULL values/cohorts and NaN values are dropped; groups
    where either cohort is empty are excluded (δ undefined).  Pair
    counts are returned as STRINGS (they reach n1·n2, beyond int64 at
    large n — the ks_num convention).

    Scale shape: identical to :func:`grouped_ks` — one map-side-
    combined (group, value) histogram, one per-GROUP cumulative window
    (value-compressed, never global), one group-sized aggregate.
    """
    from pyspark.sql import Window

    h = _two_cohort_hist(df, group_cols, value_col, cohort_col)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wa = Window.partitionBy(*group_cols)
    c = (
        h.withColumn("__fb2", F.coalesce(F.sum("__c2").over(w), F.lit(0).cast(_D)))
        .withColumn("__n1", F.sum("__c1").over(wa))
        .withColumn("__n2", F.sum("__c2").over(wa))
    )
    agg = c.groupBy(*group_cols).agg(
        F.sum(F.col("__c1") * F.col("__fb2")).alias("__gt"),
        F.sum(
            F.col("__c1") * (F.col("__n2") - F.col("__fb2") - F.col("__c2"))
        ).alias("__lt"),
        F.sum(F.col("__c1") * F.col("__c2")).alias("__ties"),
        F.first("__n1").alias("__n1"),
        F.first("__n2").alias("__n2"),
    )
    return agg.where((F.col("__n1") > 0) & (F.col("__n2") > 0)).select(
        *group_cols,
        F.col("__n1").cast("long").alias("n1"),
        F.col("__n2").cast("long").alias("n2"),
        F.col("__gt").cast("string").alias("gt_pairs"),
        F.col("__lt").cast("string").alias("lt_pairs"),
        F.col("__ties").cast("string").alias("tie_pairs"),
        (
            (F.col("__gt") - F.col("__lt")).cast("double")
            / (F.col("__n1") * F.col("__n2")).cast("double")
        ).alias("delta"),
    )


def grouped_cliffs_delta_sql(table: str, group: str, value: str, cohort_pred: str) -> str:
    """DuckDB twin of :func:`grouped_cliffs_delta` (hugeint counts,
    same single-division shape)."""
    return f"""
        WITH h AS ({_two_cohort_hist_sql(table, group, value, cohort_pred)}
        ),
        c AS (
            SELECT g, c1, c2,
                   coalesce(sum(c2) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fb2,
                   sum(c1) OVER (PARTITION BY g) AS n1,
                   sum(c2) OVER (PARTITION BY g) AS n2
            FROM h
        ),
        a AS (
            SELECT g, sum(c1 * fb2) AS gt, sum(c1 * (n2 - fb2 - c2)) AS lt,
                   sum(c1 * c2) AS ties,
                   any_value(n1) AS n1, any_value(n2) AS n2
            FROM c GROUP BY g
        )
        SELECT g AS {group}, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               gt::varchar AS gt_pairs, lt::varchar AS lt_pairs,
               ties::varchar AS tie_pairs,
               CAST(gt - lt AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS delta
        FROM a WHERE n1 > 0 AND n2 > 0
    """


def randomization_test(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    cohort_col,
    key_cols: list[str],
    *,
    replicates: int = 64,
    scale: int = 1_000_000,
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic hash-randomization test for a per-group mean
    difference between two cohorts — the NONPARAMETRIC significance
    companion to :func:`grouped_welch` (which assumes approximate
    normality) and the sibling of :func:`bootstrap_ci` (same
    content-hash determinism, opposite question: "how big is the
    uncertainty" vs "could this difference be chance").

    Monte-Carlo approximation of the permutation test (Fisher;
    Ernst, Stat. Sci. 2004): under H0 the cohort labels carry no
    information, so each replicate b re-assigns every row to cohort 1
    with probability n1/n — decided by the pure integer comparison
    u·n < n1·2^60 where u is the library's 60-bit content hash of
    (seed, key columns, b).  Bernoulli re-labeling (fixing n1 in
    expectation) rather than exact permutation (fixing it exactly):
    a permutation is not expressible as a per-row pure function, and
    the Bernoulli variant is the standard large-scale surrogate with
    the same asymptotic validity; the conditioning difference is
    O(1/√n).  Everything downstream is exact:

      * per-replicate sums are exact integers (quantize-once policy);
      * "replicate at least as extreme as observed" is the exact
        integer comparison
          |s1b·n2b − s2b·n1b| · n1·n2  ≥  |s1·n2 − s2·n1| · n1b·n2b
        (both sides cross-multiplied mean-difference magnitudes —
        no floats anywhere in the decision);
      * replicates where either re-drawn cohort is empty are dropped
        IDENTICALLY in both engines;
      * p = (1 + n_extreme) / (1 + r_valid) — the add-one MC
        estimator (Davison & Hinkley) — is ONE division of
        exactly-integer-valued doubles.

    Fully hash-oracle-able: every multiplicity is a pure function of
    (seed, key, replicate), so the whole test replays in SQL
    (:func:`randomization_test_sql`) bit-for-bit, and is
    partitioning-independent by construction.

    NULL/NaN values and NULL cohorts are dropped; groups where an
    OBSERVED cohort is empty are excluded.  Overflow contract (loud
    under Spark 4's ANSI default, never silent): the extremeness
    comparison's largest term is |s·n2b|·(n1·n2) ≈ max|xq|·n⁴/4 per
    group, which must stay below 1e38 — at scale=1e6 and |x| ≤ 1e3
    that allows groups to ~2.5e7 rows; reduce ``scale`` (or
    pre-aggregate to coarser units) for larger groups.  On engines
    where decimal overflow yields NULL instead of an error, an
    overflowed comparison would silently undercount extreme
    replicates — another reason the contract is a hard bound, not
    advisory.

    Scale shape: one map-side-combined observed aggregate; the
    ×replicates explode feeds straight into a map-side-combined
    (group, replicate) aggregate (nothing row-shaped shuffles — the
    q143 plan shape); the observed row is joined to the
    (groups × replicates)-sized table, never to rows.
    """
    from ..functions.splits import _hash60

    if replicates < 4:
        raise ValueError(f"replicates must be >= 4, got {replicates}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast("double")
    coh = F.col(cohort_col) if isinstance(cohort_col, str) else cohort_col
    base = df.where(v.isNotNull() & ~F.isnan(v) & coh.isNotNull()).select(
        *group_cols,
        *[F.col(k) for k in key_cols],
        F.floor(v * scale).cast("long").cast(_D).alias("__xq"),
        coh.cast("int").alias("__c"),
    )
    one = F.col("__c") == 1
    z = F.lit(0).cast(_D)
    obs = (
        base.groupBy(*group_cols)
        .agg(
            F.sum(F.when(one, F.lit(1).cast(_D)).otherwise(z)).alias("__n1"),
            F.sum(F.when(one, F.col("__xq")).otherwise(z)).alias("__s1"),
            F.sum(F.when(~one, F.lit(1).cast(_D)).otherwise(z)).alias("__n2"),
            F.sum(F.when(~one, F.col("__xq")).otherwise(z)).alias("__s2"),
        )
        .where((F.col("__n1") > 0) & (F.col("__n2") > 0))
    )
    rep = base.select(
        *group_cols,
        "__xq",
        F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("__b"),
        *[F.col(k) for k in key_cols],
    ).withColumn("__u", _hash60(list(key_cols) + ["__b"], seed).cast(_D))
    rep = rep.join(
        F.broadcast(obs.select(*group_cols, "__n1", "__s1", "__n2", "__s2")),
        group_cols,
    )
    two60 = F.lit(1 << 60).cast(_D)
    pick1 = F.col("__u") * (F.col("__n1") + F.col("__n2")) < F.col("__n1") * two60
    g1 = rep.groupBy(*group_cols, "__b").agg(
        F.sum(F.when(pick1, F.lit(1).cast(_D)).otherwise(z)).alias("__n1b"),
        F.sum(F.when(pick1, F.col("__xq")).otherwise(z)).alias("__s1b"),
        F.first("__n1").alias("__n1"),
        F.first("__s1").alias("__s1"),
        F.first("__n2").alias("__n2"),
        F.first("__s2").alias("__s2"),
        F.count(F.lit(1)).alias("__nn"),
        F.sum("__xq").alias("__ss"),
    )
    n1b, s1b = F.col("__n1b"), F.col("__s1b")
    n2b = F.col("__nn").cast(_D) - n1b
    s2b = F.col("__ss") - s1b
    n1, s1, n2, s2 = F.col("__n1"), F.col("__s1"), F.col("__n2"), F.col("__s2")
    valid = (n1b > 0) & (n2b > 0)
    extreme = F.abs(s1b * n2b - s2b * n1b) * (n1 * n2) >= F.abs(
        s1 * n2 - s2 * n1
    ) * (n1b * n2b)
    fin = g1.groupBy(*group_cols).agg(
        F.sum(F.when(valid, 1).otherwise(0)).alias("__rv"),
        F.sum(F.when(valid & extreme, 1).otherwise(0)).alias("__ne"),
        F.first("__n1").alias("__n1"),
        F.first("__s1").alias("__s1"),
        F.first("__n2").alias("__n2"),
        F.first("__s2").alias("__s2"),
    )
    sc = F.lit(scale).cast(_D)
    m1 = F.col("__s1").cast("double") / (sc * F.col("__n1")).cast("double")
    m2 = F.col("__s2").cast("double") / (sc * F.col("__n2")).cast("double")
    return fin.select(
        *group_cols,
        F.col("__n1").cast("long").alias("n1"),
        F.col("__n2").cast("long").alias("n2"),
        (m1 - m2).alias("mean_diff"),
        F.col("__rv").cast("int").alias("r_valid"),
        F.col("__ne").cast("int").alias("n_extreme"),
        (
            (F.lit(1) + F.col("__ne")).cast("double")
            / (F.lit(1) + F.col("__rv")).cast("double")
        ).alias("p"),
    )


def randomization_test_sql(
    table: str,
    group: str,
    value: str,
    cohort_pred: str,
    key: str,
    *,
    replicates: int = 64,
    scale: int = 1_000_000,
    seed: int | str = 0,
) -> str:
    """DuckDB twin of :func:`randomization_test` (same md5 hash spec
    as bootstrap_ci_sql, hugeint arithmetic, identical integer
    extremeness comparison; ``key`` is a single key expression)."""
    from ..functions.splits import _key_sql

    key_md5 = _key_sql(seed, ["key_col", "b"])
    u = f"((('0x' || substr({key_md5}, 1, 15))::ubigint))::bigint"
    return f"""
        WITH base AS (
            SELECT {group} AS g, {key} AS key_col,
                   CAST(floor(CAST({value} AS DOUBLE) * {scale}) AS BIGINT)::hugeint AS xq,
                   CASE WHEN {cohort_pred} THEN 1 ELSE 0 END AS c
            FROM {table}
            WHERE ({value}) IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE))
              AND ({cohort_pred}) IS NOT NULL
        ),
        obs AS (
            SELECT g,
                   sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::hugeint AS n1,
                   sum(CASE WHEN c = 1 THEN xq ELSE 0 END) AS s1,
                   sum(CASE WHEN c = 1 THEN 0 ELSE 1 END)::hugeint AS n2,
                   sum(CASE WHEN c = 1 THEN 0 ELSE xq END) AS s2
            FROM base GROUP BY g
            HAVING sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) > 0
               AND sum(CASE WHEN c = 1 THEN 0 ELSE 1 END) > 0
        ),
        rep AS (
            SELECT base.g, xq, key_col, CAST(r.range AS BIGINT) AS b,
                   obs.n1, obs.s1, obs.n2, obs.s2
            FROM base CROSS JOIN range(0, {replicates}) r
            JOIN obs ON base.g = obs.g
        ),
        rep_u AS (
            SELECT g, xq, b, n1, s1, n2, s2,
                   ({u})::hugeint * (n1 + n2) < n1 * {1 << 60}::hugeint AS pick1
            FROM rep
        ),
        g1 AS (
            SELECT g, b,
                   sum(CASE WHEN pick1 THEN 1 ELSE 0 END)::hugeint AS n1b,
                   sum(CASE WHEN pick1 THEN xq ELSE 0 END) AS s1b,
                   any_value(n1) AS n1, any_value(s1) AS s1,
                   any_value(n2) AS n2, any_value(s2) AS s2,
                   count(*)::hugeint AS nn, sum(xq) AS ss
            FROM rep_u GROUP BY g, b
        ),
        fin AS (
            SELECT g,
                   sum(CASE WHEN n1b > 0 AND nn - n1b > 0 THEN 1 ELSE 0 END) AS rv,
                   sum(CASE WHEN n1b > 0 AND nn - n1b > 0
                            AND abs(s1b * (nn - n1b) - (ss - s1b) * n1b) * (n1 * n2)
                                >= abs(s1 * n2 - s2 * n1) * (n1b * (nn - n1b))
                            THEN 1 ELSE 0 END) AS ne,
                   any_value(n1) AS n1, any_value(s1) AS s1,
                   any_value(n2) AS n2, any_value(s2) AS s2
            FROM g1 GROUP BY g
        )
        SELECT g AS {group}, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               CAST(s1 AS DOUBLE) / CAST({scale}::hugeint * n1 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) / CAST({scale}::hugeint * n2 AS DOUBLE) AS mean_diff,
               CAST(rv AS INT) AS r_valid, CAST(ne AS INT) AS n_extreme,
               CAST(1 + ne AS DOUBLE) / CAST(1 + rv AS DOUBLE) AS p
        FROM fin
    """


def grouped_cohens_kappa(
    df: DataFrame,
    group_cols: list[str],
    rater_a,
    rater_b,
) -> DataFrame:
    """Exact per-group Cohen's kappa — chance-corrected agreement
    between two categorical labelings (Cohen 1960): two annotators,
    model-vs-gold labels, or two classifier versions over the same
    rows.  The eval kit's agreement primitive next to AUC (ranking),
    calibration (probabilities) and kappa's unchance-corrected
    cousin, raw accuracy.

    With N co-labeled rows, ``agree`` = #{a = b}, and per-category
    marginals r_c = #{a = c}, s_c = #{b = c}:

        κ = (p_o − p_e) / (1 − p_e)
          = (N·agree − Σ_c r_c·s_c) / (N² − Σ_c r_c·s_c)

    — the classic identity clears both denominators, so the numerator
    and denominator are EXACT integers (decimal(38,0)/hugeint) and κ
    is ONE division: engine-identical, hash-oracle-able including the
    double.  NULLs in either label are dropped; groups where the
    denominator is 0 (both raters constant on the same single
    category — κ undefined, 0/0) are excluded.

    Scale shape: one map-side-combined (group, a, b) joint histogram
    (≤ categories² rows per group), two histogram-sized marginal
    re-aggregations joined on (group, category), one group-sized
    final aggregate — nothing row-shaped after the first groupBy.
    """
    a = F.col(rater_a) if isinstance(rater_a, str) else rater_a
    b = F.col(rater_b) if isinstance(rater_b, str) else rater_b
    h = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(*group_cols, a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).cast(_D).alias("__n"))
    )
    tot = h.groupBy(*group_cols).agg(
        F.sum("__n").alias("__N"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n")).otherwise(
            F.lit(0).cast(_D)
        )).alias("__agree"),
    )
    ra = h.groupBy(*group_cols, F.col("__a").alias("__c")).agg(
        F.sum("__n").alias("__r")
    )
    sb = h.groupBy(*group_cols, F.col("__b").alias("__c")).agg(
        F.sum("__n").alias("__s")
    )
    pe = (
        ra.join(sb, [*group_cols, "__c"])
        .groupBy(*group_cols)
        .agg(F.sum(F.col("__r") * F.col("__s")).alias("__pe"))
    )
    # LEFT join + coalesce: raters with DISJOINT category sets have no
    # matching marginal rows (pe group absent), but κ = 0 is perfectly
    # defined there — an inner join silently deleted such groups
    # (review finding, pinned by test_kappa_disjoint_categories).
    j = tot.join(pe, group_cols, "left").withColumn(
        "__pe", F.coalesce(F.col("__pe"), F.lit(0).cast(_D))
    )
    num = j["__N"] * j["__agree"] - j["__pe"]
    den = j["__N"] * j["__N"] - j["__pe"]
    return j.where(den != 0).select(
        *group_cols,
        F.col("__N").cast("long").alias("n"),
        F.col("__agree").cast("long").alias("agree"),
        F.col("__pe").cast("string").alias("pe_num"),
        (num.cast("double") / den.cast("double")).alias("kappa"),
    )


def grouped_cohens_kappa_sql(table: str, group: str, a: str, b: str) -> str:
    """DuckDB twin of :func:`grouped_cohens_kappa`."""
    return f"""
        WITH h AS (
            SELECT {group} AS g, {a} AS a, {b} AS b, count(*)::hugeint AS n
            FROM {table}
            WHERE ({a}) IS NOT NULL AND ({b}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        tot AS (
            SELECT g, sum(n) AS N,
                   sum(CASE WHEN a = b THEN n ELSE 0 END) AS agree
            FROM h GROUP BY g
        ),
        ra AS (SELECT g, a AS c, sum(n) AS r FROM h GROUP BY g, a),
        sb AS (SELECT g, b AS c, sum(n) AS s FROM h GROUP BY g, b),
        pe0 AS (
            SELECT ra.g, sum(r * s) AS pe
            FROM ra JOIN sb ON ra.g = sb.g AND ra.c = sb.c
            GROUP BY ra.g
        ),
        pe AS (
            SELECT tot.g, coalesce(pe0.pe, 0::hugeint) AS pe
            FROM tot LEFT JOIN pe0 ON tot.g = pe0.g
        )
        SELECT tot.g AS {group},
               CAST(N AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
               pe::varchar AS pe_num,
               CAST(N * agree - pe AS DOUBLE) / CAST(N * N - pe AS DOUBLE) AS kappa
        FROM tot JOIN pe ON tot.g = pe.g
        WHERE N * N - pe <> 0
    """


def grouped_simpson(
    df: DataFrame,
    group_cols: list[str],
    cat_col,
) -> DataFrame:
    """Exact per-group Simpson concentration / diversity — how
    concentrated is a categorical column (tools per conversation,
    sources per lang, domains per shard)?  The curation kit's
    diversity primitive: a shard dominated by one source scores
    hhi → 1, a uniform mix over k categories scores 1/k.

    All RATIONALS of exact integers: with category counts c_i and
    N = Σ c_i,

        hhi          = Σ c_i² / N²        (Herfindahl-Hirschman)
        inv_simpson  = N² / Σ c_i²        (effective category count)

    — Σ c_i² rides decimal(38,0)/hugeint, each output ONE division of
    exactly-integer-valued doubles: hash-oracle-able.  NULL
    categories are dropped; empty groups vanish naturally.

    Scale shape: one map-side-combined (group, cat) histogram, one
    histogram-sized aggregate.  Nothing row-shaped after the first
    groupBy.
    """
    c = F.col(cat_col) if isinstance(cat_col, str) else cat_col
    h = (
        df.where(c.isNotNull())
        .groupBy(*group_cols, c.alias("__c"))
        .agg(F.count(F.lit(1)).cast(_D).alias("__n"))
    )
    agg = h.groupBy(*group_cols).agg(
        F.sum("__n").alias("__N"),
        F.sum(F.col("__n") * F.col("__n")).alias("__ss"),
        F.count(F.lit(1)).alias("__k"),
    )
    n2 = F.col("__N") * F.col("__N")
    return agg.select(
        *group_cols,
        F.col("__N").cast("long").alias("n"),
        F.col("__k").cast("long").alias("n_cats"),
        F.col("__ss").cast("string").alias("sum_sq"),
        (F.col("__ss").cast("double") / n2.cast("double")).alias("hhi"),
        (n2.cast("double") / F.col("__ss").cast("double")).alias("inv_simpson"),
    )


def grouped_simpson_sql(table: str, group: str, cat: str) -> str:
    """DuckDB twin of :func:`grouped_simpson`."""
    return f"""
        WITH h AS (
            SELECT {group} AS g, {cat} AS c, count(*)::hugeint AS n
            FROM {table} WHERE ({cat}) IS NOT NULL
            GROUP BY 1, 2
        ),
        a AS (
            SELECT g, sum(n) AS N, sum(n * n) AS ss, count(*)::bigint AS k
            FROM h GROUP BY g
        )
        SELECT g AS {group}, CAST(N AS BIGINT) AS n, k AS n_cats,
               ss::varchar AS sum_sq,
               CAST(ss AS DOUBLE) / CAST(N * N AS DOUBLE) AS hhi,
               CAST(N * N AS DOUBLE) / CAST(ss AS DOUBLE) AS inv_simpson
        FROM a
    """


def grouped_autocorr(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    order_col: str,
    *,
    lag: int = 1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact per-group lag-k autocorrelation — the periodicity /
    persistence detector (is today's value predicted by yesterday's?
    does a weekly cycle show at lag 7?), the time-series companion to
    :func:`exact_comoments` (same fixed-point policy, same corr
    expression shape, so the double is engine-identical).

    Rows are totally ordered by (order, quantized value) — the
    changepoint convention: permutations of fully-tied rows leave
    every lagged pair multiset unchanged.  The lag-k partner comes
    from ``lead(xq, k)`` over that order (no self-join); Pearson is
    computed over the (x_i, x_{i+k}) pairs with exact integer
    moments and the library's documented num/sqrt/sqrt shape.
    Groups with fewer than 2 pairs or zero variance on either leg
    are excluded.  Fully hash-oracle-able.

    Scale shape: one shuffle on the group key, one ordered window
    (row-scale — the spearman/changepoint cost contract), one
    six-number aggregate.
    """
    from pyspark.sql import Window

    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast("double")
    base = df.where(
        v.isNotNull() & ~F.isnan(v) & F.col(order_col).isNotNull()
    ).select(
        *group_cols,
        F.col(order_col).alias("__o"),
        F.floor(v * scale).cast("long").cast(_D).alias("__x"),
    )
    w = Window.partitionBy(*group_cols).orderBy("__o", "__x")
    p = base.withColumn("__y", F.lead("__x", lag).over(w)).where(
        F.col("__y").isNotNull()
    )
    a = p.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_D).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    sxx, syy, sxy = F.col("__sxx"), F.col("__syy"), F.col("__sxy")
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    return a.where((n >= 2) & (dx > 0) & (dy > 0)).select(
        *group_cols,
        F.lit(lag).alias("lag"),
        n.cast("long").alias("n_pairs"),
        sxy.cast("string").alias("sxy"),
        (
            num.cast("double") / F.sqrt(dx.cast("double")) / F.sqrt(dy.cast("double"))
        ).alias("autocorr"),
    )


def grouped_autocorr_sql(
    table: str, group: str, value: str, order: str, *, lag: int = 1, scale: int = 1_000_000
) -> str:
    """DuckDB twin of :func:`grouped_autocorr` (identical ordering,
    hugeint moments, the same num/sqrt/sqrt shape)."""
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    return f"""
        WITH base AS (
            SELECT {group} AS g, {order} AS o,
                   CAST(floor(CAST({value} AS DOUBLE) * {scale}) AS BIGINT)::hugeint AS x
            FROM {table}
            WHERE ({value}) IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE))
              AND ({order}) IS NOT NULL
        ),
        p AS (
            SELECT g, x,
                   lead(x, {lag}) OVER (PARTITION BY g ORDER BY o, x) AS y
            FROM base
        ),
        a AS (
            SELECT g, count(*)::hugeint AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
            FROM p WHERE y IS NOT NULL GROUP BY g
        )
        SELECT g AS {group}, {lag} AS lag, CAST(n AS BIGINT) AS n_pairs,
               sxy::varchar AS sxy,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS autocorr
        FROM a
        WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """


# 95% two-sided normal quantile; repr() round-trips, so injecting it
# as a literal parses to the SAME double in Spark, DuckDB and Python
_Z95 = 1.959963984540054


def grouped_proportion_ci(
    df: DataFrame,
    group_cols: list[str],
    success_col,
    *,
    z: float = _Z95,
) -> DataFrame:
    """Exact-count Wilson score interval per group — the uncertainty
    companion to every rate the kit reports (hit_rate, call_rate,
    conversion, precision): how wide is the CI around x/n?  Wilson
    (1927) rather than Wald: no zero-width collapse at p̂ ∈ {0, 1},
    valid at small n.

    Hash-oracle-able by the library's fixed-shape policy: x and n
    are exact counts; z, z², z²/2 and z²/4 are computed ONCE
    driver-side and injected as the same literals into both engines;
    the bounds are assembled with one fixed expression shape

        denom  = n + z²
        center = (x + z²/2) / denom
        half   = z · √(x·(n−x)/n + z²/4) / denom

    — every op correctly rounded, so lo/hi/p_hat are
    engine-identical doubles.  NULL successes are dropped (a row
    that can't be judged isn't a trial); ``success_col`` is a
    boolean or 0/1 expression.
    """
    s = F.col(success_col) if isinstance(success_col, str) else success_col
    s = s.cast("int")
    base = df.where(s.isNotNull()).select(*group_cols, s.alias("__s"))
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__s").alias("__x")
    )
    z2 = z * z
    xd = F.col("__x").cast("double")
    nd = F.col("__n").cast("double")
    denom = nd + F.lit(z2)
    center = (xd + F.lit(z2 / 2.0)) / denom
    half = F.lit(z) * F.sqrt(xd * (nd - xd) / nd + F.lit(z2 / 4.0)) / denom
    return agg.select(
        *group_cols,
        F.col("__n").alias("n"),
        F.col("__x").alias("successes"),
        (xd / nd).alias("p_hat"),
        (center - half).alias("ci_lo"),
        (center + half).alias("ci_hi"),
    )


def grouped_proportion_ci_sql(
    table: str,
    group: str,
    success: str,
    *,
    z: float = _Z95,
) -> str:
    """DuckDB twin of :func:`grouped_proportion_ci` (identical
    literals and expression shapes)."""
    z2 = z * z
    return f"""
        WITH a AS (
            SELECT {group} AS g, count(*) AS n,
                   sum(CAST({success} AS INT)) AS x
            FROM {table}
            WHERE CAST({success} AS INT) IS NOT NULL
            GROUP BY 1
        )
        SELECT g AS {group}, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS successes,
               CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
               (CAST(x AS DOUBLE) + {z2 / 2.0!r}) / (CAST(n AS DOUBLE) + {z2!r})
                 - {z!r} * sqrt(CAST(x AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(x AS DOUBLE))
                                  / CAST(n AS DOUBLE) + {z2 / 4.0!r})
                     / (CAST(n AS DOUBLE) + {z2!r}) AS ci_lo,
               (CAST(x AS DOUBLE) + {z2 / 2.0!r}) / (CAST(n AS DOUBLE) + {z2!r})
                 + {z!r} * sqrt(CAST(x AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(x AS DOUBLE))
                                  / CAST(n AS DOUBLE) + {z2 / 4.0!r})
                     / (CAST(n AS DOUBLE) + {z2!r}) AS ci_hi
        FROM a
    """


def bh_adjust(
    df: DataFrame,
    p_col: str,
    key_cols: list[str],
    *,
    family_cols: list[str] | None = None,
) -> DataFrame:
    """Benjamini-Hochberg FDR adjustment — the multiple-testing
    correction the kit's per-group tests (Welch q145, KS q144,
    randomization q149) need once you run one test PER GROUP: with
    50 event types at α=0.05, ~2.5 spurious "significant" groups are
    expected; BH (JRSS-B 1995) controls the expected false-discovery
    RATE instead.

    q_value_i = min(1, min_{j ≥ i} p_(j)·m/j) over the hypotheses
    ranked by ascending p — a deterministic transform of the input
    doubles: the rank order breaks p-ties by ``key_cols`` (total
    order, engine-identical), p·m/j is two correctly-rounded ops in
    a fixed shape, and the running min from the largest rank down is
    order-insensitive.  Hash-oracle-able whenever the input p's are
    (the kit's are — q143/q149 p's are single divisions of exact
    integers).

    ``family_cols`` partition the hypothesis families (m counts per
    family); default one global family.  NULL/NaN p rows are
    dropped.  This is a HYPOTHESIS-SCALE operator (one row per
    already-aggregated test), not a row-scale one.
    """
    from pyspark.sql import Window

    if not key_cols:
        raise ValueError("key_cols must be non-empty (deterministic p-tie break)")
    fam = list(family_cols or [])
    p = F.col(p_col).cast("double")
    base = df.where(p.isNotNull() & ~F.isnan(p)).select(
        *fam, *key_cols, p.alias("__p")
    )
    wf = Window.partitionBy(*fam) if fam else Window.partitionBy()
    wo = wf.orderBy(F.col("__p").asc(), *[F.col(c).asc() for c in key_cols])
    ranked = base.withColumn("__r", F.row_number().over(wo)).withColumn(
        "__m", F.count(F.lit(1)).over(wf)
    )
    raw = (F.col("__p") * F.col("__m").cast("double")) / F.col("__r").cast("double")
    wdesc = wf.orderBy(F.col("__r").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ranked.withColumn("__raw", raw)
        .withColumn("__q", F.least(F.lit(1.0), F.min("__raw").over(wdesc)))
        .select(
            *fam,
            *key_cols,
            F.col("__p").alias("p"),
            F.col("__r").cast("long").alias("p_rank"),
            F.col("__m").cast("long").alias("m"),
            F.col("__q").alias("q_value"),
        )
    )


def bh_adjust_sql(
    table: str,
    p: str,
    keys: list[str],
    *,
    family: str | None = None,
) -> str:
    """DuckDB twin of :func:`bh_adjust` (identical rank order, raw
    shape and running min).  ``keys`` are output column names present
    in ``table``; ``family`` an optional single family expression."""
    if not keys:
        raise ValueError("keys must be non-empty (deterministic p-tie break)")
    fam_sel = f"{family} AS fam, " if family else ""
    fam_out = "fam, " if family else ""
    part = "PARTITION BY fam " if family else ""
    key_list = ", ".join(keys)
    key_order = ", ".join(f"{k} ASC" for k in keys)
    return f"""
        WITH base AS (
            SELECT {fam_sel}{key_list}, CAST({p} AS DOUBLE) AS p
            FROM {table}
            WHERE ({p}) IS NOT NULL AND NOT isnan(CAST({p} AS DOUBLE))
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER ({part}ORDER BY p ASC, {key_order}) AS r,
                   count(*) OVER ({part.rstrip() if part else ""}) AS m
            FROM base
        )
        SELECT {fam_out}{key_list}, p, CAST(r AS BIGINT) AS p_rank,
               CAST(m AS BIGINT) AS m,
               least(CAST(1 AS DOUBLE),
                     min(p * CAST(m AS DOUBLE) / CAST(r AS DOUBLE))
                       OVER ({part}ORDER BY r DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS q_value
        FROM ranked
    """


def fleiss_kappa(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    cat_col,
    *,
    n_raters: int,
) -> DataFrame:
    """Exact per-group Fleiss' kappa — multi-rater agreement beyond
    Cohen's two raters (:func:`grouped_kappa`, q152): the QA metric
    for consensus labeling (N items × n raters each picking a
    category; Fleiss, Psych. Bull. 1971).

    Input: one row per RATING (group…, item, category).  Items with
    a rating count ≠ ``n_raters`` are EXCLUDED (Fleiss requires
    equal panels; the count is reported so silent exclusion is
    visible), NULL categories dropped first.

    Everything is exact by the denominator-clearing identity: with
    per-item-category counts c_ij, S1 = Σ_i(Σ_j c_ij² − n),
    category totals C_j and S2 = Σ_j C_j², and M = N·n,

        P̄  = S1 / (M(n−1)),   P̄e = S2 / M²,
        κ   = (S1·M² − S2·M(n−1)) / (M(n−1)·(M² − S2))

    — ONE division of exact decimal(38,0)/hugeint integers, so κ
    hash-oracles.  EVERY group with ratings gets a row: κ is NULL
    when undefined — no kept items (N = 0, every panel mismatched)
    or every rating in one category (M² = S2, the 0/0 degenerate) —
    so the exclusion counts stay visible instead of the group
    silently vanishing (review finding).

    OVERFLOW CONTRACT (loud under ANSI): S1·M² ≤ N³n⁴ must stay
    below 1e38 — N to ~4·10⁸ items at n = 10 raters.

    Scale shape: one map-side-combined (group, item, cat) count —
    the only row-scale stage — then item-sized and category-sized
    aggregates.
    """
    if n_raters < 2:
        raise ValueError(f"n_raters must be >= 2, got {n_raters}")
    c = F.col(cat_col) if isinstance(cat_col, str) else cat_col
    base = df.where(c.isNotNull()).select(
        *group_cols, F.col(item_col).alias("__it"), c.alias("__c")
    )
    cij = base.groupBy(*group_cols, "__it", "__c").agg(
        F.count(F.lit(1)).cast(_D).alias("__w")
    )
    per_item = cij.groupBy(*group_cols, "__it").agg(
        F.sum(F.col("__w") * F.col("__w")).alias("__s2i"),
        F.sum("__w").alias("__ni"),
    )
    n = F.lit(n_raters).cast(_D)
    kept = per_item.withColumn("__ok", F.col("__ni") == n)
    counts = kept.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("__ok"), 1).otherwise(0)).alias("__N"),
        F.sum(F.when(~F.col("__ok"), 1).otherwise(0)).alias("__ex"),
        F.sum(F.when(F.col("__ok"), F.col("__s2i") - n).otherwise(F.lit(0).cast(_D))).alias(
            "__s1"
        ),
    )
    # category totals over KEPT items only
    cat_tot = (
        cij.join(
            kept.where("__ok").select(*group_cols, "__it"),
            [*group_cols, "__it"],
        )
        .groupBy(*group_cols, "__c")
        .agg(F.sum("__w").alias("__cj"))
        .groupBy(*group_cols)
        .agg(F.sum(F.col("__cj") * F.col("__cj")).alias("__s2"))
    )
    agg = counts.join(cat_tot, group_cols, "left").withColumn(
        "__s2", F.coalesce(F.col("__s2"), F.lit(0).cast(_D))
    )
    m = F.col("__N").cast(_D) * n
    nm1 = n - F.lit(1).cast(_D)
    num = F.col("__s1") * m * m - F.col("__s2") * m * nm1
    den = m * nm1 * (m * m - F.col("__s2"))
    return agg.select(
        *group_cols,
        F.col("__N").cast("long").alias("n_items"),
        F.lit(n_raters).alias("n_raters"),
        F.col("__ex").cast("long").alias("excluded_items"),
        F.col("__s1").cast("string").alias("s1"),
        F.col("__s2").cast("string").alias("s2"),
        F.when(
            (F.col("__N") >= 1) & (m * m != F.col("__s2")),
            num.cast("double") / den.cast("double"),
        ).alias("kappa"),
    )


def fleiss_kappa_sql(
    table: str,
    group: str,
    item: str,
    cat: str,
    *,
    n_raters: int,
) -> str:
    """DuckDB twin of :func:`fleiss_kappa` (hugeint arithmetic,
    identical exclusion and degenerate rules)."""
    if n_raters < 2:
        raise ValueError(f"n_raters must be >= 2, got {n_raters}")
    n = n_raters
    return f"""
        WITH base AS (
            SELECT {group} AS g, {item} AS it, {cat} AS c
            FROM {table} WHERE ({cat}) IS NOT NULL
        ),
        cij AS (
            SELECT g, it, c, count(*)::hugeint AS w FROM base GROUP BY g, it, c
        ),
        per_item AS (
            SELECT g, it, sum(w * w) AS s2i, sum(w) AS ni FROM cij GROUP BY g, it
        ),
        counts AS (
            SELECT g,
                   sum(CASE WHEN ni = {n} THEN 1 ELSE 0 END)::hugeint AS N,
                   sum(CASE WHEN ni <> {n} THEN 1 ELSE 0 END)::hugeint AS ex,
                   sum(CASE WHEN ni = {n} THEN s2i - {n} ELSE 0::hugeint END) AS s1
            FROM per_item GROUP BY g
        ),
        cat_tot AS (
            SELECT g, sum(cj * cj) AS s2 FROM (
                SELECT cij.g, cij.c, sum(w) AS cj
                FROM cij JOIN per_item USING (g, it)
                WHERE per_item.ni = {n}
                GROUP BY cij.g, cij.c
            ) GROUP BY g
        )
        SELECT counts.g AS {group}, CAST(N AS BIGINT) AS n_items,
               {n} AS n_raters, CAST(ex AS BIGINT) AS excluded_items,
               s1::varchar AS s1, coalesce(s2, 0::hugeint)::varchar AS s2,
               CASE WHEN N >= 1 AND (N * {n}) * (N * {n}) <> coalesce(s2, 0::hugeint)
                    THEN CAST(s1 * (N * {n}) * (N * {n})
                              - coalesce(s2, 0::hugeint) * (N * {n}) * {n - 1} AS DOUBLE)
                           / CAST((N * {n}) * {n - 1}
                                  * ((N * {n}) * (N * {n}) - coalesce(s2, 0::hugeint)) AS DOUBLE)
                    END AS kappa
        FROM counts LEFT JOIN cat_tot ON counts.g = cat_tot.g
    """


def chi2_independence(
    df: DataFrame,
    group_cols: list[str],
    a_col,
    b_col,
    *,
    scale: int = 10**12,
) -> DataFrame:
    """(group…, n, n_a, n_b, dof, chi2_fp, chi2, cramers_v) — the
    classical chi-square test of independence between two categorical
    columns, per group, with Cramér's V as the bounded-[0,1] effect
    size.  The contingency question the keyness 2×2 (chi2_keyness)
    and two-cohort kits can't ask: is source independent of length
    bucket within a language?  role of tool within a model?

    Pearson's statistic over the r×c contingency table (o observed,
    expected e = r_a·c_b/N).  The naive Σ(o−e)²/e needs the EMPTY
    cells too (both marginals present, zero co-occurrence — their
    term is e, and a groupBy histogram never materializes them), so
    the sum is taken through the algebraic identity

        chi² = Σ_all (o−e)²/e = Σ_all o²/e − N
             = N·Σ_nonzero o²/(r_a·c_b) − N

    which touches ONLY observed cells.  Each term is a RATIONAL of
    exact integers; float-summing rationals is order-dependent, so
    the sum is made exact the library's fixed-point way (the
    ranking-DCG / trimmed-mean pattern): every term becomes the
    exact integer

        term_fp = o²·N·scale  div  (r_a·c_b)

    on decimal/hugeint (positive operands: trunc == floor in both
    engines), the terms SUM exactly,
    chi2_fp = max(Σterm_fp − N·scale, 0) (the clamp absorbs the
    ≤ n_cells truncation deficit at independence), and

        chi2      = chi2_fp / scale                 (one division)
        cramers_v = √(chi2_fp / (scale·N·(min(n_a,n_b)−1)))
                                        (√ of one division; IEEE-754
                                         sqrt is correctly rounded)

    — both engine-identical, hash-oracle-able.  The truncation
    understates chi² by < n_cells/scale (≤ 1e-6 at defaults for a
    thousand-cell table): a DETERMINISM device, not an approximation
    knob.  ``chi2_fp`` (string) is the exact integer for audits.
    ``cramers_v`` is NULL for single-category axes (dof 0); NULL in
    either column drops the row; every surviving group gets a row.

    OVERFLOW CONTRACT (loud under ANSI): o²·N·scale ≤ N³·scale must
    stay < 1e38 and each term_fp ≤ scale·N must fit the div's BIGINT
    quotient (9.2e18) → N per group ≲ 4·10⁶ at scale 1e12 (the div
    bound binds first; 9e12 rows at scale 1e6).  p-values are
    deliberately not emitted: the chi² CDF is not exactly computable
    cross-engine; compare chi2 against the caller's critical value
    for (dof).

    Scale shape: one map-side-combined (group, a, b) cell histogram
    — the only row-scale stage — then three marginal window sums and
    a final aggregate, each with its OWN hash exchange of the
    ≤-distinct-cell table (partitionBy (g,a), (g,b), (g) cannot share
    partitioning; all four exchanges move cell-scale rows, bounded by
    distinct (a, b) pairs per group, never corpus rows).
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    from pyspark.sql import Window

    a = F.col(a_col) if isinstance(a_col, str) else a_col
    b = F.col(b_col) if isinstance(b_col, str) else b_col
    cells = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(*group_cols, a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).cast(_D).alias("__o"))
    )
    wa = Window.partitionBy(*group_cols, "__a")
    wb = Window.partitionBy(*group_cols, "__b")
    wg = Window.partitionBy(*group_cols)
    w = (
        cells.withColumn("__r", F.sum("__o").over(wa))
        .withColumn("__c", F.sum("__o").over(wb))
        .withColumn("__N", F.sum("__o").over(wg))
    )
    term = F.expr(
        f"CAST((__o * __o * __N * CAST({scale} AS DECIMAL(38,0)))"
        f" div (__r * __c) AS DECIMAL(38,0))"
    )
    agg = w.groupBy(*group_cols).agg(
        F.sum(term).alias("__fpr"),
        F.max("__N").alias("__Nt"),
        F.countDistinct("__a").alias("__ka"),
        F.countDistinct("__b").alias("__kb"),
    )
    sc = F.lit(scale).cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    fp = F.greatest(F.col("__fpr") - sc * F.col("__Nt"), zero)
    agg = agg.withColumn("__fp", fp)
    mind = F.least(F.col("__ka"), F.col("__kb"))
    vden = sc * F.col("__Nt") * (mind - F.lit(1)).cast(_D)
    return agg.select(
        *group_cols,
        F.col("__Nt").cast("long").alias("n"),
        F.col("__ka").alias("n_a"),
        F.col("__kb").alias("n_b"),
        ((F.col("__ka") - 1) * (F.col("__kb") - 1)).alias("dof"),
        F.col("__fp").cast("string").alias("chi2_fp"),
        (F.col("__fp").cast("double") / sc.cast("double")).alias("chi2"),
        F.when(
            mind > 1,
            F.sqrt(F.col("__fp").cast("double") / vden.cast("double")),
        ).alias("cramers_v"),
    )


def chi2_independence_sql(
    table: str,
    group: str,
    a: str,
    b: str,
    *,
    scale: int = 10**12,
) -> str:
    """DuckDB twin of :func:`chi2_independence` (hugeint cells and
    marginal window sums, `//` floor division, identical fixed-point
    term and double shapes)."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    return f"""
        WITH __chi_cells AS (
            SELECT {group} AS g, {a} AS a, {b} AS b, count(*)::hugeint AS o
            FROM {table}
            WHERE ({a}) IS NOT NULL AND ({b}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        __chi_w AS (
            SELECT g, a, b, o,
                   sum(o) OVER (PARTITION BY g, a) AS r,
                   sum(o) OVER (PARTITION BY g, b) AS c,
                   sum(o) OVER (PARTITION BY g) AS N
            FROM __chi_cells
        ),
        __chi_t0 AS (
            SELECT g, max(N) AS N,
                   sum((o * o * N * {scale}::hugeint) // (r * c)) AS fpr,
                   count(DISTINCT a)::bigint AS ka,
                   count(DISTINCT b)::bigint AS kb
            FROM __chi_w GROUP BY g
        ),
        __chi_t AS (
            SELECT g, N, ka, kb,
                   greatest(fpr - {scale}::hugeint * N, 0::hugeint) AS fp
            FROM __chi_t0
        )
        SELECT g AS {group}, CAST(N AS BIGINT) AS n, ka AS n_a, kb AS n_b,
               (ka - 1) * (kb - 1) AS dof,
               fp::varchar AS chi2_fp,
               CAST(fp AS DOUBLE) / CAST({scale}::hugeint AS DOUBLE) AS chi2,
               CASE WHEN least(ka, kb) > 1
                    THEN sqrt(CAST(fp AS DOUBLE)
                              / CAST({scale}::hugeint * N
                                     * (least(ka, kb) - 1)::hugeint AS DOUBLE))
               END AS cramers_v
        FROM __chi_t
    """


def grouped_entropy(
    df: DataFrame,
    group_cols: list[str],
    cat_col,
) -> DataFrame:
    """(group…, n, k, entropy_micro_nats, entropy, norm_entropy) —
    exact-fixed-point Shannon entropy of a categorical column's
    distribution per group, in nats, with the Pielou evenness
    H/ln k as ``norm_entropy``.  The distributional spread measure
    next to Simpson concentration (grouped_simpson): hhi answers
    "how dominated", entropy answers "how many nats of surprise" —
    e.g. how evenly a language's documents spread over sources, or
    a role's turns over tools.

    The q84 char-entropy identity lifted from row-local runs to a
    grouped histogram: with cell counts c over N = Σc,

        H = ln N − (1/N)·Σ c·ln c

    where every ln is quantized ONCE per cell count to micro-nat
    LONGS (round(ln·10⁶) — positive args, so Spark HALF_UP and
    DuckDB half-away agree), Σ c·ln_micro(c) is an exact
    order-independent integer sum, the division is integral
    (`div`/`//`, identical for positive operands), and

        entropy      = H_micro / 10⁶          (one exact division)
        norm_entropy = H_micro / ln_micro(k)  (one division of
                                               exact-integer doubles,
                                               NULL when k == 1)

    — both engine-identical, hash-oracle-able.  H_micro is clamped
    at 0 (quantization can push an exactly-zero entropy a micro-nat
    negative); the ≤ ln k bound can overshoot by ~1 micro-nat and is
    deliberately NOT clamped (documented, observable in the exact
    integer).  NULL categories are dropped; groups with no surviving
    rows vanish.  OVERFLOW: Σ c·ln_micro(c) ≤ N·ln_micro(N) must fit
    a long → N per group ≲ 3·10¹¹.

    Scale shape: one map-side-combined (group, cat) cell histogram —
    the only row-scale stage — then a cell-scale aggregate.
    """
    cat = F.col(cat_col) if isinstance(cat_col, str) else cat_col
    ln_micro = _ln_micro
    cells = (
        df.where(cat.isNotNull())
        .groupBy(*group_cols, cat.alias("__c"))
        .agg(F.count(F.lit(1)).alias("__cc"))
    )
    agg = cells.groupBy(*group_cols).agg(
        F.sum("__cc").alias("__n"),
        F.count(F.lit(1)).alias("__k"),
        F.sum(F.col("__cc") * ln_micro(F.col("__cc"))).alias("__s"),
    )
    n, k, s = F.col("__n"), F.col("__k"), F.col("__s")
    h = F.greatest(
        ln_micro(n) - F.expr("__s div __n"), F.lit(0).cast("long")
    )
    agg = agg.withColumn("__h", h)
    hm = F.col("__h")
    return agg.select(
        *group_cols,
        n.alias("n"),
        k.alias("k"),
        hm.alias("entropy_micro_nats"),
        (hm.cast("double") / F.lit(1000000.0)).alias("entropy"),
        F.when(
            k > 1, hm.cast("double") / ln_micro(k).cast("double")
        ).alias("norm_entropy"),
    )


def grouped_entropy_sql(table: str, group: str, cat: str) -> str:
    """DuckDB twin of :func:`grouped_entropy` (same micro-nat
    quantization, `//` integral division, identical double shapes)."""
    lnm = "round(ln({x}) * 1000000)::BIGINT"
    return f"""
        WITH __ent_cells AS (
            SELECT {group} AS g, {cat} AS c, count(*)::BIGINT AS cc
            FROM {table}
            WHERE ({cat}) IS NOT NULL
            GROUP BY 1, 2
        ),
        __ent_agg AS (
            SELECT g, sum(cc)::BIGINT AS n, count(*)::BIGINT AS k,
                   sum(cc * ({lnm.format(x='cc')}))::BIGINT AS s
            FROM __ent_cells GROUP BY g
        ),
        __ent_h AS (
            SELECT g, n, k,
                   greatest({lnm.format(x='n')} - (s // n), 0::BIGINT) AS h
            FROM __ent_agg
        )
        SELECT g AS {group}, n, k, h AS entropy_micro_nats,
               h::DOUBLE / 1000000.0 AS entropy,
               CASE WHEN k > 1
                    THEN h::DOUBLE / ({lnm.format(x='k')})::DOUBLE
               END AS norm_entropy
        FROM __ent_h
    """


def grouped_mutual_info(
    df: DataFrame,
    group_cols: list[str],
    a_col,
    b_col,
) -> DataFrame:
    """(group…, n, k_a, k_b, k_ab, h_a, h_b, h_ab, mi_micro_nats, mi,
    u_a, u_b) — exact-fixed-point mutual information between two
    categorical columns per group, with the entropies it decomposes
    into and Theil's uncertainty coefficients.  Completes the
    association kit: chi² (chi2_independence) answers "is the
    dependence significant", MI answers "how many nats of B does
    knowing A buy" — and unlike chi², MI is comparable across tables
    of different shapes.

    All three entropies come from ONE (group, a, b) cell histogram
    via the grouped_entropy identity (ln quantized ONCE per count to
    micro-nat longs, exact integer sums, integral division):
    H(A,B) from the cells, H(A)/H(B) from the cell-scale marginals.

        MI_micro = max(H_a + H_b − H_ab, 0)   (exact integer adds;
                                               the clamp absorbs the
                                               ≤ ~3 micro-nat
                                               truncation skew at
                                               independence)
        mi  = MI_micro / 10⁶                  (one exact division)
        u_a = MI_micro / H_a                  ("fraction of A's
                                               uncertainty removed by
                                               B"; NULL when H_a = 0)

    — engine-identical, hash-oracle-able.  The h_* columns are the
    micro-nat LONGS (exact; divide by 10⁶ for nats).  MI can
    overshoot min(H_a, H_b) by a few micro-nats (quantization;
    documented, observable in the exact integers).  NULL in either
    column drops the row.  OVERFLOW: as grouped_entropy
    (N ≲ 3·10¹¹ per group).

    Scale shape: the row-scale stage is the one map-side-combined
    cell histogram; marginals are cell-scale aggregates joined back
    on the group key (null-safely — a NULL group key keeps its row,
    matching chi2_independence/grouped_entropy).
    """
    a = F.col(a_col) if isinstance(a_col, str) else a_col
    b = F.col(b_col) if isinstance(b_col, str) else b_col
    lnm = _ln_micro
    cells = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(*group_cols, a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__cc"))
    )
    def _h(gb, tag):
        m = gb.agg(
            F.sum("__m").alias("__n"),
            F.count(F.lit(1)).alias(f"k_{tag}"),
            F.sum(F.col("__m") * lnm(F.col("__m"))).alias("__s"),
        )
        return m.withColumn(
            f"h_{tag}",
            lnm(F.col("__n")) - F.expr("__s div __n"),
        ).drop("__s")

    hab = _h(
        cells.select(*group_cols, F.col("__cc").alias("__m")).groupBy(*group_cols),
        "ab",
    )
    ha = _h(
        cells.groupBy(*group_cols, "__a")
        .agg(F.sum("__cc").alias("__m"))
        .groupBy(*group_cols),
        "a",
    ).drop("__n")
    hb = _h(
        cells.groupBy(*group_cols, "__b")
        .agg(F.sum("__cc").alias("__m"))
        .groupBy(*group_cols),
        "b",
    ).drop("__n")
    # null-safe group joins: groupBy keeps NULL group keys, a plain
    # equi-join would silently drop that group — inconsistent with
    # chi2_independence/grouped_entropy which emit its row (review
    # catch, pinned by test_null_group_key)
    j = _nullsafe_join(
        _nullsafe_join(hab, ha, group_cols, "inner"), hb, group_cols, "inner"
    )
    mi = F.greatest(
        F.col("h_a") + F.col("h_b") - F.col("h_ab"), F.lit(0).cast("long")
    )
    j = j.withColumn("__mi", mi)
    m = F.col("__mi")
    return j.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        "k_a",
        "k_b",
        "k_ab",
        "h_a",
        "h_b",
        "h_ab",
        m.alias("mi_micro_nats"),
        (m.cast("double") / F.lit(1000000.0)).alias("mi"),
        F.when(F.col("h_a") > 0, m.cast("double") / F.col("h_a").cast("double"))
        .alias("u_a"),
        F.when(F.col("h_b") > 0, m.cast("double") / F.col("h_b").cast("double"))
        .alias("u_b"),
    )


def grouped_mutual_info_sql(table: str, group: str, a: str, b: str) -> str:
    """DuckDB twin of :func:`grouped_mutual_info` (same micro-nat
    quantization, `//` integral division, identical double shapes)."""
    lnm = "round(ln({x}) * 1000000)::BIGINT"
    ent = (
        "({n_ln} - (sum(m * ({m_ln}))::BIGINT // sum(m)::BIGINT))"
    )
    h = ent.format(n_ln=lnm.format(x="sum(m)"), m_ln=lnm.format(x="m"))
    return f"""
        WITH __mi_cells AS (
            SELECT {group} AS g, {a} AS a, {b} AS b, count(*)::BIGINT AS m
            FROM {table}
            WHERE ({a}) IS NOT NULL AND ({b}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        __mi_ab AS (
            SELECT g, sum(m)::BIGINT AS n, count(*)::BIGINT AS k_ab,
                   {h} AS h_ab
            FROM __mi_cells GROUP BY g
        ),
        __mi_am AS (
            SELECT g, a, sum(m)::BIGINT AS m FROM __mi_cells GROUP BY g, a
        ),
        __mi_a AS (
            SELECT g, count(*)::BIGINT AS k_a, {h} AS h_a
            FROM __mi_am GROUP BY g
        ),
        __mi_bm AS (
            SELECT g, b, sum(m)::BIGINT AS m FROM __mi_cells GROUP BY g, b
        ),
        __mi_b AS (
            SELECT g, count(*)::BIGINT AS k_b, {h} AS h_b
            FROM __mi_bm GROUP BY g
        ),
        __mi_j AS (
            SELECT ab.g AS g, n, k_a, k_b, k_ab, h_a, h_b, h_ab,
                   greatest(h_a + h_b - h_ab, 0::BIGINT) AS mi
            FROM __mi_ab ab
            JOIN __mi_a a ON ab.g IS NOT DISTINCT FROM a.g
            JOIN __mi_b b ON ab.g IS NOT DISTINCT FROM b.g
        )
        SELECT g AS {group}, n, k_a, k_b, k_ab, h_a, h_b, h_ab,
               mi AS mi_micro_nats,
               mi::DOUBLE / 1000000.0 AS mi,
               CASE WHEN h_a > 0 THEN mi::DOUBLE / h_a::DOUBLE END AS u_a,
               CASE WHEN h_b > 0 THEN mi::DOUBLE / h_b::DOUBLE END AS u_b
        FROM __mi_j
    """


def grouped_dispersion(
    df: DataFrame,
    group_cols: list[str],
    count_col,
) -> DataFrame:
    """(group…, n, total, mean, var_pop, fano, cv2) — exact index of
    dispersion (Fano factor, var/mean) and squared coefficient of
    variation (var/mean²) of an integer count column per group: the
    counting-process diagnostic that separates bursty from Poisson
    from regular streams (Poisson ⇒ fano = 1; fano > 1 ⇒
    overdispersed/bursty, the signature of hot users, retry storms,
    or bot traffic in per-window event counts).

    Exactness: with S = Σx and Q = Σx² as decimal/hugeint integers
    over n rows,

        var_pop = (n·Q − S²) / n²       mean = S / n
        fano    = (n·Q − S²) / (n·S)    cv2  = (n·Q − S²) / S²

    — every numerator/denominator an exact integer, each statistic
    ONE correctly-rounded division, so the whole row hash-oracles.
    fano/cv2 are NULL when S = 0 (all-zero counts); the column must
    be integral (LONG-castable without loss — float inputs are
    REJECTED like grouped_log_quantiles, the engines' cast rounding
    diverges).  Negative counts are rejected in-plan (a count column
    with negatives is upstream corruption, not a distribution).
    OVERFLOW: n·Q ≤ n²·max(x)² < 10³⁸.

    Scale shape: ONE map-side-combined three-number aggregate per
    group; nothing row-shaped after it.
    """
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    dt = df.select(c.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"count_col must be integral, got {dt}; quantize explicitly first"
        )
    x = F.when(
        c < 0, F.raise_error(F.lit("grouped_dispersion: negative count"))
    ).otherwise(c).cast(_D)
    agg = df.where(c.isNotNull()).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(x).alias("__s"),
        F.sum(x * x).alias("__q"),
    )
    n = F.col("__n").cast(_D)
    s, q = F.col("__s"), F.col("__q")
    num = (n * q - s * s).cast("double")
    return agg.select(
        *group_cols,
        F.col("__n").alias("n"),
        s.cast("long").alias("total"),
        (s.cast("double") / F.col("__n").cast("double")).alias("mean"),
        (num / (n * n).cast("double")).alias("var_pop"),
        F.when(s > 0, num / (n * s).cast("double")).alias("fano"),
        F.when(s > 0, num / (s * s).cast("double")).alias("cv2"),
    )


def grouped_dispersion_sql(table: str, group: str, count: str) -> str:
    """DuckDB twin of :func:`grouped_dispersion` (hugeint moments,
    identical double shapes)."""
    return f"""
        WITH __dsp AS (
            SELECT {group} AS g, count(*)::BIGINT AS n,
                   sum(({count})::HUGEINT) AS s,
                   sum(({count})::HUGEINT * ({count})::HUGEINT) AS q
            FROM {table}
            WHERE ({count}) IS NOT NULL
            GROUP BY 1
        )
        SELECT g AS {group}, n, CAST(s AS BIGINT) AS total,
               s::DOUBLE / n::DOUBLE AS mean,
               CAST(n::HUGEINT * q - s * s AS DOUBLE)
                   / CAST(n::HUGEINT * n::HUGEINT AS DOUBLE) AS var_pop,
               CASE WHEN s > 0 THEN
                   CAST(n::HUGEINT * q - s * s AS DOUBLE)
                       / CAST(n::HUGEINT * s AS DOUBLE) END AS fano,
               CASE WHEN s > 0 THEN
                   CAST(n::HUGEINT * q - s * s AS DOUBLE)
                       / CAST(s * s AS DOUBLE) END AS cv2
        FROM __dsp
    """


def grouped_anova(
    df: DataFrame,
    group_cols: list[str],
    treat_col,
    value_col,
    *,
    term_scale: int = 1_000_000,
) -> DataFrame:
    """(group…, n, k, df1, df2, ssb_fp, ssw_fp, ssb, ssw, f_stat,
    eta2) — exact-fixed-point one-way ANOVA per group: does the
    treatment column shift the value column's MEAN?  The k-sample
    parametric completion of the two-cohort Welch t (grouped_welch
    answers the 2-sample question; this answers "do ANY of the k
    sources/types/variants differ", with η² = SSB/SST as the
    variance-explained effect size the F alone doesn't give).

    Exactness (the chi2_independence quantize-once recipe): with
    per-treatment n_i / S_i = Σx / overall Q = Σx² as exact
    decimal(38,0)/hugeint integers and TS = ``term_scale``,

        a_i    = (S_i²·TS) div n_i       (quantized ONCE per
                                          treatment — nonnegative
                                          operands, so Spark `div`
                                          and DuckDB `//` agree)
        A      = Σ a_i                   (exact, order-independent)
        SSB_fp = max(A − (S²·TS div N), 0)
        SSW_fp = Q·TS − A                (≥ 0: a_i is truncated DOWN)
        SST_fp = SSB_fp + SSW_fp         (so η² ∈ [0,1] structurally)

        f_stat = (SSB_fp·(N−k)) / (SSW_fp·(k−1))   (ONE division of
                                                    exact integers)
        eta2   = SSB_fp / SST_fp                   (one division)
        ssb    = SSB_fp / TS    ssw = SSW_fp / TS  (one division each;
                                                    raw value² units)

    — engine-identical, hash-oracle-able including all four doubles.
    Truncation error ≤ (k+1)/TS absolute in SS units (documented,
    observable in the exact ssb_fp/ssw_fp strings).  f_stat is NULL
    when k < 2, N−k < 1, or SSW_fp = 0 (perfect separation — η² = 1
    exactly there); eta2 is NULL when SST_fp = 0 (all values equal).
    The value column must be integral (float inputs REJECTED like
    grouped_dispersion — quantize explicitly first); NULL treatment
    or value drops the row; NULL GROUP keys keep theirs (single
    lineage, no join).  OVERFLOW: S_i²·TS < 1e38 → N·max|x| ≲ 10¹⁶
    at the default TS.

    Scale shape: ONE map-side-combined (group, treat) moment
    histogram is the only row-scale stage; the group aggregate runs
    over k-scale cells.
    """
    if term_scale < 1:
        raise ValueError(f"term_scale must be >= 1, got {term_scale}")
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    dt = df.select(v.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"value_col must be integral, got {dt}; quantize explicitly first"
        )
    x = v.cast(_D)
    cells = (
        df.where(t.isNotNull() & v.isNotNull())
        .groupBy(*group_cols, t.alias("__t"))
        .agg(
            F.count(F.lit(1)).cast(_D).alias("__ni"),
            F.sum(x).alias("__si"),
            F.sum(x * x).alias("__qi"),
        )
    )
    term = F.expr(
        f"CAST((__si * __si * CAST({term_scale} AS DECIMAL(38,0)))"
        f" div __ni AS DECIMAL(38,0))"
    )
    agg = cells.groupBy(*group_cols).agg(
        F.sum("__ni").alias("__N"),
        F.count(F.lit(1)).alias("__k"),
        F.sum("__si").alias("__S"),
        F.sum("__qi").alias("__Q"),
        F.sum(term).alias("__A"),
    )
    ts = F.lit(term_scale).cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    n, k, s, q, a = (
        F.col("__N"),
        F.col("__k"),
        F.col("__S"),
        F.col("__Q"),
        F.col("__A"),
    )
    stot = F.expr(
        f"CAST((__S * __S * CAST({term_scale} AS DECIMAL(38,0)))"
        f" div __N AS DECIMAL(38,0))"
    )
    agg = (
        agg.withColumn("__ssb", F.greatest(a - stot, zero))
        .withColumn("__ssw", q * ts - a)
    )
    ssb, ssw = F.col("__ssb"), F.col("__ssw")
    sst = ssb + ssw
    kd = k.cast(_D)
    return agg.select(
        *group_cols,
        n.cast("long").alias("n"),
        k.alias("k"),
        (k - 1).cast("long").alias("df1"),
        (n - kd).cast("long").alias("df2"),
        ssb.cast("string").alias("ssb_fp"),
        ssw.cast("string").alias("ssw_fp"),
        (ssb.cast("double") / ts.cast("double")).alias("ssb"),
        (ssw.cast("double") / ts.cast("double")).alias("ssw"),
        F.when(
            (k >= 2) & (n - kd >= 1) & (ssw > zero),
            (ssb * (n - kd)).cast("double")
            / (ssw * (kd - 1)).cast("double"),
        ).alias("f_stat"),
        F.when(sst > zero, ssb.cast("double") / sst.cast("double")).alias(
            "eta2"
        ),
    )


def grouped_anova_sql(
    table: str, group: str, treat: str, value: str, *, term_scale: int = 1_000_000
) -> str:
    """DuckDB twin of :func:`grouped_anova` (hugeint moments, `//`
    integral division on nonnegative operands, identical clamp and
    double shapes)."""
    return f"""
        WITH __av_cells AS (
            SELECT {group} AS g, {treat} AS t,
                   count(*)::HUGEINT AS ni,
                   sum(({value})::HUGEINT) AS si,
                   sum(({value})::HUGEINT * ({value})::HUGEINT) AS qi
            FROM {table}
            WHERE ({treat}) IS NOT NULL AND ({value}) IS NOT NULL
            GROUP BY 1, 2
        ),
        __av_agg AS (
            SELECT g, sum(ni) AS n, count(*)::HUGEINT AS k,
                   sum(si) AS s, sum(qi) AS q,
                   sum((si * si * {term_scale}::HUGEINT) // ni) AS a
            FROM __av_cells GROUP BY g
        ),
        __av_ss AS (
            SELECT g, n, k, q,
                   greatest(a - ((s * s * {term_scale}::HUGEINT) // n),
                            0::HUGEINT) AS ssb,
                   q * {term_scale}::HUGEINT - a AS ssw
            FROM __av_agg
        )
        SELECT g AS {group}, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
               CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
               ssb::VARCHAR AS ssb_fp, ssw::VARCHAR AS ssw_fp,
               ssb::DOUBLE / {term_scale}::HUGEINT::DOUBLE AS ssb,
               ssw::DOUBLE / {term_scale}::HUGEINT::DOUBLE AS ssw,
               CASE WHEN k >= 2 AND n - k >= 1 AND ssw > 0 THEN
                   CAST(ssb * (n - k) AS DOUBLE)
                       / CAST(ssw * (k - 1) AS DOUBLE) END AS f_stat,
               CASE WHEN ssb + ssw > 0 THEN
                   ssb::DOUBLE / CAST(ssb + ssw AS DOUBLE) END AS eta2
        FROM __av_ss
    """


def grouped_kruskal_wallis(
    df: DataFrame,
    group_cols: list[str],
    treat_col,
    value_col,
    *,
    term_scale: int = 1_000_000,
) -> DataFrame:
    """(group…, n, k, df, ties_t, h, h_corrected) — exact-fixed-point
    Kruskal–Wallis H per group: the rank-based k-sample test
    completing grouped_anova's parametric F (ANOVA asks "do the
    treatment MEANS differ" and assumes normal-ish tails; KW asks "do
    the treatment DISTRIBUTIONS shift" on ranks, immune to outliers
    and monotone transforms).

    Midranks never touch floats: from the (group, value) histogram
    (cell count ct, inclusive cumulative cum via a RANGE window),
    the DOUBLED midrank r2 = 2·cum − ct + 1 is an exact integer.
    Per treatment, R2_i = Σ cnt·r2 and n_i are exact
    decimal(38,0)/hugeint; each rational term R_i²/n_i = R2_i²/(4n_i)
    is quantized ONCE (the chi² recipe, nonnegative operands):

        b_i  = (R2_i²·TS) div (4·n_i)       A = Σ b_i   (exact)
        hnum = max(12·A − 3·TS·N·(N+1)², 0) (H ≥ 0 by Cauchy–Schwarz;
                                             the clamp absorbs ≤ k/TS
                                             truncation undershoot)
        h    = hnum / (TS·N·(N+1))          (ONE division)
        h_corrected = h / ((N³−N−T) / (N³−N))   (tie correction,
                                             T = Σ_v ct³−ct exact;
                                             fixed 3-division shape)

    — engine-identical, hash-oracle-able including both doubles.
    h/h_corrected are NULL when k < 2; h_corrected additionally NULL
    when every value in the group is tied (N³−N = T) or N < 2.  The
    value column must be integral (float inputs REJECTED — quantize
    explicitly first); NULL treatment or value drops the row; NULL
    GROUP keys keep theirs (single lineage, no join).  OVERFLOW:
    R2_i²·TS < 1e38 with R2_i ≤ 2N·n_i → N per group ≲ 10⁷ at the
    default TS (lower term_scale to raise the ceiling).  The reported ties_t DIAGNOSTIC is NULL (TRY_CAST, both
    engines) past BIGINT — ≥ ~2.1M rows sharing one value —
    while every statistic keeps its exact wide arithmetic.

    Scale shape: ONE map-side-combined (group, treat, value) cell
    histogram is the only row-scale stage; after it, three cell-scale
    window/aggregate passes (partitionBy (g,v) twice and the
    (g)-range cumulative each exchange the cell table — cells are
    bounded by distinct (treat, value) pairs per group, never rows),
    then the (g,t) → (g) aggregate cascade.  No joins.
    """
    if term_scale < 1:
        raise ValueError(f"term_scale must be >= 1, got {term_scale}")
    from pyspark.sql import Window

    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    dt = df.select(v.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"value_col must be integral, got {dt}; quantize explicitly first"
        )
    cells = (
        df.where(t.isNotNull() & v.isNotNull())
        .groupBy(*group_cols, t.alias("__t"), v.cast("long").alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wv = Window.partitionBy(*group_cols, "__v")
    wr = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w = (
        cells.withColumn("__ct", F.sum("__cnt").over(wv))
        .withColumn("__cum", F.sum("__cnt").over(wr))
        .withColumn(
            "__first",
            (F.row_number().over(wv.orderBy("__t")) == 1).cast("long"),
        )
    )
    r2 = (F.lit(2) * F.col("__cum") - F.col("__ct") + F.lit(1)).cast(_D)
    ct = F.col("__ct").cast(_D)
    per_t = w.groupBy(*group_cols, "__t").agg(
        F.sum(F.col("__cnt").cast(_D)).alias("__ni"),
        F.sum(F.col("__cnt").cast(_D) * r2).alias("__r2i"),
        F.sum(F.col("__first") * (ct * ct * ct - ct)).alias("__tp"),
    )
    term = F.expr(
        f"CAST((__r2i * __r2i * CAST({term_scale} AS DECIMAL(38,0)))"
        f" div (4 * __ni) AS DECIMAL(38,0))"
    )
    agg = per_t.groupBy(*group_cols).agg(
        F.sum("__ni").alias("__N"),
        F.count(F.lit(1)).alias("__k"),
        F.sum(term).alias("__A"),
        F.sum("__tp").alias("__T"),
    )
    ts = F.lit(term_scale).cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    n, k, a, tt = F.col("__N"), F.col("__k"), F.col("__A"), F.col("__T")
    hnum = F.greatest(
        F.lit(12).cast(_D) * a - F.lit(3).cast(_D) * ts * n * (n + 1) * (n + 1),
        zero,
    )
    hden = ts * n * (n + 1)
    h = hnum.cast("double") / hden.cast("double")
    n3n = n * n * n - n
    corr = (n3n - tt).cast("double") / n3n.cast("double")
    return agg.select(
        *group_cols,
        n.cast("long").alias("n"),
        k.alias("k"),
        (k - 1).cast("long").alias("df"),
        tt.try_cast("long").alias("ties_t"),
        F.when(k >= 2, h).alias("h"),
        F.when((k >= 2) & (n3n > tt), h / corr).alias("h_corrected"),
    )


def grouped_kruskal_wallis_sql(
    table: str, group: str, treat: str, value: str, *, term_scale: int = 1_000_000
) -> str:
    """DuckDB twin of :func:`grouped_kruskal_wallis` (hugeint ranks
    and moments, `//` on nonnegative operands, identical clamp and
    division shapes)."""
    return f"""
        WITH __kw_cells AS (
            SELECT {group} AS g, {treat} AS t, ({value})::BIGINT AS v,
                   count(*)::BIGINT AS cnt
            FROM {table}
            WHERE ({treat}) IS NOT NULL AND ({value}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        __kw_w AS (
            SELECT g, t, v, cnt,
                   sum(cnt) OVER (PARTITION BY g, v) AS ct,
                   sum(cnt) OVER (PARTITION BY g ORDER BY v
                                  RANGE BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
                   CASE WHEN row_number() OVER (PARTITION BY g, v ORDER BY t)
                        = 1 THEN 1 ELSE 0 END AS first
            FROM __kw_cells
        ),
        __kw_t AS (
            SELECT g, t, sum(cnt::HUGEINT) AS ni,
                   sum(cnt::HUGEINT * (2 * cum - ct + 1)::HUGEINT) AS r2i,
                   sum(first::HUGEINT
                       * (ct::HUGEINT * ct::HUGEINT * ct::HUGEINT
                          - ct::HUGEINT)) AS tp
            FROM __kw_w GROUP BY g, t
        ),
        __kw_g AS (
            SELECT g, sum(ni) AS n, count(*)::HUGEINT AS k,
                   sum((r2i * r2i * {term_scale}::HUGEINT) // (4 * ni)) AS a,
                   sum(tp) AS tt
            FROM __kw_t GROUP BY g
        )
        SELECT g AS {group}, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
               CAST(k - 1 AS BIGINT) AS df, TRY_CAST(tt AS BIGINT) AS ties_t,
               CASE WHEN k >= 2 THEN
                   greatest(12 * a - 3 * {term_scale}::HUGEINT * n * (n + 1)
                                * (n + 1), 0::HUGEINT)::DOUBLE
                       / CAST({term_scale}::HUGEINT * n * (n + 1) AS DOUBLE)
               END AS h,
               CASE WHEN k >= 2 AND n * n * n - n > tt THEN
                   (greatest(12 * a - 3 * {term_scale}::HUGEINT * n * (n + 1)
                                * (n + 1), 0::HUGEINT)::DOUBLE
                       / CAST({term_scale}::HUGEINT * n * (n + 1) AS DOUBLE))
                   / (CAST(n * n * n - n - tt AS DOUBLE)
                       / CAST(n * n * n - n AS DOUBLE))
               END AS h_corrected
        FROM __kw_g
    """


def grouped_mannwhitney(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    cohort_col,
) -> DataFrame:
    """(group…, n1, n2, ties_t, u2_fp, u, auc, z) — exact per-group
    Mann–Whitney U (Wilcoxon rank-sum) with the tie-corrected normal
    z: the SIGNIFICANCE completion of grouped_cliffs_delta (δ sizes
    the shift, this says whether it clears noise) and the two-sample
    special case of grouped_kruskal_wallis.

    Everything derives from the same value-compressed two-cohort
    histogram as KS/Cliff's δ — values COMPARE, never compute (no
    quantization; doubles welcome):

        U₂  = 2·gt + ties            (doubled U, exact integer; the
                                      Cliff identity U₂ = n1·n2 +
                                      (gt − lt) is pinned by test)
        u   = U₂ / 2                 (exact halving)
        auc = U₂ / (2·n1·n2)         (ONE division — the common-
                                      language effect size
                                      P(x>y) + ½P(x=y) = (δ+1)/2)
        z   = (U₂ − n1·n2) / √( n1·n2·(N³−N−T) / (3·N·(N−1)) )
                                     (tie-corrected variance,
                                      T = Σ_v t³−t exact; fixed
                                      div→sqrt→div shape — 4·var
                                      because U₂ − n1·n2 = 2(U−μ))

    — every count an exact decimal(38,0)/hugeint integer, each double
    a single correctly-rounded shape: engine-identical,
    hash-oracle-able.  No continuity correction (documented choice —
    with ties the ±½ convention is ambiguous; consumers can apply
    their own to u).  z is NULL when all values are tied (variance
    0) or N < 2.  NULL values/cohorts and NaN are dropped; groups
    where either cohort is empty are excluded.  OVERFLOW:
    n1·n2·(N³−N) < 1e38 → N per group ≲ 3·10⁷.  The reported ties_t DIAGNOSTIC is NULL (TRY_CAST, both
    engines) past BIGINT — ≥ ~2.1M rows sharing one value —
    while every statistic keeps its exact wide arithmetic.

    Scale shape: identical to grouped_ks/grouped_cliffs_delta — one
    map-side-combined (group, value) histogram, one per-GROUP
    cumulative window over compressed values, one group-sized
    aggregate.
    """
    from pyspark.sql import Window

    h = _two_cohort_hist(df, group_cols, value_col, cohort_col)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wa = Window.partitionBy(*group_cols)
    c = (
        h.withColumn("__fb2", F.coalesce(F.sum("__c2").over(w), F.lit(0).cast(_D)))
        .withColumn("__n1", F.sum("__c1").over(wa))
        .withColumn("__n2", F.sum("__c2").over(wa))
    )
    t = F.col("__c1") + F.col("__c2")
    agg = c.groupBy(*group_cols).agg(
        F.sum(F.col("__c1") * F.col("__fb2")).alias("__gt"),
        F.sum(F.col("__c1") * F.col("__c2")).alias("__ties"),
        F.sum(t * t * t - t).alias("__T"),
        F.first("__n1").alias("__n1"),
        F.first("__n2").alias("__n2"),
    )
    n1, n2 = F.col("__n1"), F.col("__n2")
    u2 = F.lit(2).cast(_D) * F.col("__gt") + F.col("__ties")
    nn = n1 + n2
    n3n = nn * nn * nn - nn
    v4num = n1 * n2 * (n3n - F.col("__T"))
    v4den = F.lit(3).cast(_D) * nn * (nn - 1)
    agg = agg.withColumn("__u2", u2)
    u2c = F.col("__u2")
    return agg.where((n1 > 0) & (n2 > 0)).select(
        *group_cols,
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.col("__T").try_cast("long").alias("ties_t"),
        u2c.cast("string").alias("u2_fp"),
        (u2c.cast("double") / F.lit(2.0)).alias("u"),
        (u2c.cast("double") / (F.lit(2).cast(_D) * n1 * n2).cast("double")).alias(
            "auc"
        ),
        F.when(
            (v4num > 0) & (nn >= 2),
            (u2c - n1 * n2).cast("double")
            / F.sqrt(v4num.cast("double") / v4den.cast("double")),
        ).alias("z"),
    )


def grouped_mannwhitney_sql(
    table: str, group: str, value: str, cohort_pred: str
) -> str:
    """DuckDB twin of :func:`grouped_mannwhitney` (hugeint counts,
    identical single-division / div→sqrt→div shapes)."""
    return f"""
        WITH __mw_h AS ({_two_cohort_hist_sql(table, group, value, cohort_pred)}
        ),
        __mw_c AS (
            SELECT g, c1, c2,
                   coalesce(sum(c2) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fb2,
                   sum(c1) OVER (PARTITION BY g) AS n1,
                   sum(c2) OVER (PARTITION BY g) AS n2
            FROM __mw_h
        ),
        __mw_a AS (
            SELECT g, sum(c1 * fb2) AS gt, sum(c1 * c2) AS ties,
                   sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS tt,
                   any_value(n1) AS n1, any_value(n2) AS n2
            FROM __mw_c GROUP BY g
        )
        SELECT g AS {group}, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               TRY_CAST(tt AS BIGINT) AS ties_t,
               (2 * gt + ties)::VARCHAR AS u2_fp,
               (2 * gt + ties)::DOUBLE / 2.0 AS u,
               (2 * gt + ties)::DOUBLE / CAST(2 * n1 * n2 AS DOUBLE) AS auc,
               CASE WHEN n1 * n2 * ((n1 + n2) * (n1 + n2) * (n1 + n2)
                        - (n1 + n2) - tt) > 0 AND n1 + n2 >= 2 THEN
                   CAST(2 * gt + ties - n1 * n2 AS DOUBLE)
                   / sqrt(CAST(n1 * n2 * ((n1 + n2) * (n1 + n2) * (n1 + n2)
                               - (n1 + n2) - tt) AS DOUBLE)
                          / CAST(3 * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE))
               END AS z
        FROM __mw_a WHERE n1 > 0 AND n2 > 0
    """


def brown_forsythe(
    df: DataFrame,
    group_cols: list[str],
    treat_col,
    value_col,
    *,
    term_scale: int = 1_000_000,
    broadcast_medians: bool = True,
) -> DataFrame:
    """(group…, n, k, df1, df2, ssb_fp, ssw_fp, ssb, ssw, f_stat,
    eta2) — exact Brown–Forsythe test per group: do the k treatments
    have equal SPREAD?  The variance-homogeneity check that q179's
    ANOVA F quietly assumes (Levene 1960 centered on means; the
    Brown–Forsythe 1974 median-centering used here is the
    heavy-tail-robust variant that became the default) — and a
    useful dispersion comparison in its own right (is this source's
    length distribution WIDER, not just shifted?).

    Construction: W is the one-way ANOVA F computed on absolute
    deviations from the per-treatment median.  To stay integral the
    deviations are DOUBLED — with the per-treatment doubled median

        med₂ = 2·med_lo                (n odd)
             = med_lo + med_hi         (n even; lo/hi = the two
                                        middle order statistics, via
                                        the 2·cum ≥ n and ≥ n+2
                                        histogram crossings)
        z    = |2·x − med₂|            (exact integer; F is
                                        scale-invariant, so F(z) =
                                        F(|x−med|) exactly up to the
                                        shared term_scale truncation)

    then delegates to :func:`grouped_anova` — every guarantee there
    (quantize-once terms, one-division F/η², hash-oracle-ability)
    carries over; ssb/ssw are in DOUBLED-deviation² units (4× the
    |x−med| scale; documented, consistent across engines).

    Two passes over the rows by construction (median, then
    deviations — BF is inherently two-pass); the median table is
    (group, treat)-sized and broadcast by default
    (``broadcast_medians=False`` falls back to a shuffle join for
    high-cardinality treatments).  The join is NULL-SAFE on the
    group keys (a NULL group key keeps its rows — the
    grouped_mutual_info review lesson).  The value column must be
    integral; NULL treatment or value drops the row.  OVERFLOW: as
    grouped_anova, plus |2·x| must fit a long.
    """
    from pyspark.sql import Window

    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    dt = df.select(v.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"value_col must be integral, got {dt}; quantize explicitly first"
        )
    base = df.where(t.isNotNull() & v.isNotNull()).select(
        *group_cols, t.alias("__t"), v.cast("long").alias("__v")
    )
    hist = base.groupBy(*group_cols, "__t", "__v").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    wc = (
        Window.partitionBy(*group_cols, "__t")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*group_cols, "__t")
    h = hist.withColumn("__cum", F.sum("__cnt").over(wc)).withColumn(
        "__n", F.sum("__cnt").over(wn)
    )
    two_cum = F.lit(2) * F.col("__cum")
    med = h.groupBy(*group_cols, "__t").agg(
        F.min(F.when(two_cum >= F.col("__n"), F.col("__v"))).alias("__lo"),
        F.min(F.when(two_cum >= F.col("__n") + 2, F.col("__v"))).alias("__hi"),
        F.max("__n").alias("__nn"),
    )
    med2 = F.when(
        F.col("__nn") % 2 == 1, F.lit(2) * F.col("__lo")
    ).otherwise(F.col("__lo") + F.col("__hi"))
    med = med.select(
        *[F.col(g).alias(f"__m_{g}") for g in group_cols],
        F.col("__t").alias("__m_t"),
        med2.alias("__med2"),
    )
    if broadcast_medians:
        med = F.broadcast(med)
    import functools as _ft
    import operator as _op

    cond = _ft.reduce(
        _op.and_,
        [base[g].eqNullSafe(med[f"__m_{g}"]) for g in group_cols]
        + [base["__t"] == med["__m_t"]],
    )
    z2 = F.abs(F.lit(2) * F.col("__v") - F.col("__med2")).alias("__z2")
    dev = base.join(med, cond).select(*group_cols, "__t", z2)
    return grouped_anova(
        dev, group_cols, "__t", "__z2", term_scale=term_scale
    )


def brown_forsythe_sql(
    table: str, group: str, treat: str, value: str, *, term_scale: int = 1_000_000
) -> str:
    """DuckDB twin of :func:`brown_forsythe` (same doubled-median
    crossing construction, IS NOT DISTINCT FROM group join, then the
    grouped_anova twin over the deviation table)."""
    dev = f"""(
        WITH __bf_h AS (
            SELECT {group} AS g, {treat} AS t, ({value})::BIGINT AS v,
                   count(*)::BIGINT AS cnt
            FROM {table}
            WHERE ({treat}) IS NOT NULL AND ({value}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        __bf_c AS (
            SELECT g, t, v, cnt,
                   sum(cnt) OVER (PARTITION BY g, t ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
                   sum(cnt) OVER (PARTITION BY g, t) AS n
            FROM __bf_h
        ),
        __bf_m AS (
            SELECT g, t,
                   min(CASE WHEN 2 * cum >= n THEN v END) AS lo,
                   min(CASE WHEN 2 * cum >= n + 2 THEN v END) AS hi,
                   any_value(n) AS n
            FROM __bf_c GROUP BY g, t
        )
        SELECT r.g AS {group}, r.t AS __bf_t,
               abs(2 * r.v - CASE WHEN m.n % 2 = 1 THEN 2 * m.lo
                                  ELSE m.lo + m.hi END) AS __bf_z2
        FROM (SELECT {group} AS g, {treat} AS t, ({value})::BIGINT AS v
              FROM {table}
              WHERE ({treat}) IS NOT NULL AND ({value}) IS NOT NULL) r
        JOIN __bf_m m ON r.g IS NOT DISTINCT FROM m.g AND r.t = m.t
    )"""
    return grouped_anova_sql(
        dev, group, "__bf_t", "__bf_z2", term_scale=term_scale
    )


def grouped_mcnemar(
    df: DataFrame,
    group_cols: list[str],
    x_col,
    y_col,
) -> DataFrame:
    """(group…, n, n11, n00, b, c, stat, stat_cc, odds_ratio) — exact
    McNemar test of marginal homogeneity per group: for PAIRED binary
    flags on the same subject (did the user click vs did they
    purchase; did the doc pass filter A vs filter B), is one flag
    systematically more common than the other?  The paired completion
    of the two-proportion kit — grouped_proportion_ci treats cohorts
    as independent; McNemar conditions on the discordant pairs, which
    is the only correct test when both flags are measured on the SAME
    subject.

    Only the discordant counts matter:

        b/c     = count(x ∧ ¬y) / count(¬x ∧ y)     (exact longs)
        stat    = (b − c)² / (b + c)                 (ONE division;
                                                      ~χ²₁ under H₀)
        stat_cc = (max(|b−c|−1, 0))² / (b + c)       (Edwards
                                                      continuity
                                                      correction)
        odds_ratio = b / c                           (the direction;
                                                      NULL when c = 0)

    — every operand an exact integer, each double ONE division:
    engine-identical, hash-oracle-able.  stat/stat_cc are NULL when
    b + c = 0 (no discordant pairs — the test is undefined, not 0).
    x/y must be boolean or 0/1 integers (anything else raises
    in-plan); a NULL in either flag drops the row.

    Scale shape: ONE map-side-combined four-counter aggregate per
    group; nothing after it.
    """
    def _flag(col, name):
        c = F.col(col) if isinstance(col, str) else col
        dt = df.select(c.alias("__probe")).schema[0].dataType.simpleString()
        if dt == "boolean":
            return c.cast("long")
        return F.when(c.isin(0, 1), c.cast("long")).otherwise(
            F.raise_error(F.lit(f"grouped_mcnemar: {name} must be 0/1 or boolean"))
        )

    xr = F.col(x_col) if isinstance(x_col, str) else x_col
    yr = F.col(y_col) if isinstance(y_col, str) else y_col
    x = _flag(x_col, "x_col")
    y = _flag(y_col, "y_col")
    agg = (
        df.where(xr.isNotNull() & yr.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x * y).alias("n11"),
            F.sum((1 - x) * (1 - y)).alias("n00"),
            F.sum(x * (1 - y)).alias("b"),
            F.sum((1 - x) * y).alias("c"),
        )
    )
    b, c = F.col("b"), F.col("c")
    dev = b - c
    cc = F.greatest(F.abs(dev) - 1, F.lit(0).cast("long"))
    return agg.select(
        *group_cols,
        "n",
        "n11",
        "n00",
        "b",
        "c",
        F.when(
            b + c > 0, (dev * dev).cast("double") / (b + c).cast("double")
        ).alias("stat"),
        F.when(
            b + c > 0, (cc * cc).cast("double") / (b + c).cast("double")
        ).alias("stat_cc"),
        F.when(c > 0, b.cast("double") / c.cast("double")).alias("odds_ratio"),
    )


def grouped_mcnemar_sql(table: str, group: str, x: str, y: str) -> str:
    """DuckDB twin of :func:`grouped_mcnemar` (identical counter and
    single-division shapes; x/y interpreted as 0/1 via the same
    integer arithmetic)."""
    xi = f"(CASE WHEN ({x}) IN (0, 1) OR typeof({x}) = 'BOOLEAN' THEN ({x})::BIGINT ELSE CAST(error('grouped_mcnemar: x must be 0/1 or boolean') AS BIGINT) END)"
    yi = f"(CASE WHEN ({y}) IN (0, 1) OR typeof({y}) = 'BOOLEAN' THEN ({y})::BIGINT ELSE CAST(error('grouped_mcnemar: y must be 0/1 or boolean') AS BIGINT) END)"
    return f"""
        WITH __mcn AS (
            SELECT {group} AS g, count(*)::BIGINT AS n,
                   sum({xi} * {yi})::BIGINT AS n11,
                   sum((1 - {xi}) * (1 - {yi}))::BIGINT AS n00,
                   sum({xi} * (1 - {yi}))::BIGINT AS b,
                   sum((1 - {xi}) * {yi})::BIGINT AS c
            FROM {table}
            WHERE ({x}) IS NOT NULL AND ({y}) IS NOT NULL
            GROUP BY 1
        )
        SELECT g AS {group}, n, n11, n00, b, c,
               CASE WHEN b + c > 0 THEN
                   CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE)
               END AS stat,
               CASE WHEN b + c > 0 THEN
                   CAST(greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0)
                        AS DOUBLE) / CAST(b + c AS DOUBLE)
               END AS stat_cc,
               CASE WHEN c > 0 THEN b::DOUBLE / c::DOUBLE END AS odds_ratio
        FROM __mcn
    """


def krippendorff_alpha(
    df: DataFrame,
    group_cols: list[str],
    unit_col,
    cat_col,
    *,
    term_scale: int = 1_000_000,
) -> DataFrame:
    """(group…, n_units, n_units_pairable, n, k, do_fp, de_fp,
    alpha) — exact-fixed-point Krippendorff's alpha (nominal) per
    group: the agreement coefficient that finishes the kit —
    grouped_cohens_kappa needs exactly two raters, fleiss_kappa
    requires EQUAL panels and excludes mismatched units loudly;
    alpha is defined for ANY number of raters with missing ratings,
    weighting each unit by what it actually received.  Rows are
    individual ratings (one per (unit, rating)); rater identity is
    irrelevant for alpha (exchangeability is the point).

    The disagreement identity: with per-unit category counts o_uc,
    m_u = Σ_c o_uc (units with m_u ≥ 2 are "pairable"; singletons
    carry no pair information and are dropped, their count reported),
    margins n_c over pairable units and n = Σ n_c:

        D_o ∝ Σ_u (m_u² − Σ_c o_uc²)/(m_u − 1)   (within-unit
                                                  disagreeing ordered
                                                  pairs, pair-
                                                  normalized)
        D_e ∝ (n² − Σ_c n_c²)/(n(n−1))           (chance)

        t_u    = ((m_u² − Σo²)·TS) div (m_u − 1)  (quantized ONCE per
                                                   unit, nonnegative
                                                   operands)
        alpha  = (TS·(n²−Σn_c²) − (n−1)·Σt_u)
                 / (TS·(n²−Σn_c²))                (ONE division of
                                                   exact integers)

    — engine-identical, hash-oracle-able including the double.
    Perfect agreement ⇒ Σt_u = 0 ⇒ alpha == 1.0 EXACTLY; alpha < 0
    (worse than chance) is legitimate and not clamped.  NULL when
    D_e = 0 (every pairable rating one category) or n < 2.  NULL
    unit or category drops the rating; NULL GROUP keys keep their
    rows (null-safe join).  Groups whose every unit is a singleton
    keep their row (n = 0, alpha NULL) — the fleiss_kappa review
    lesson.  OVERFLOW: m_u²·TS and n² on decimal(38,0) → n per
    group ≲ 10¹⁵.

    Scale shape: one map-side-combined (group, unit, cat) cell
    histogram is the row-scale stage; TWO cell-scale branches consume
    it (the unit-level cascade and the pairable-margin cascade — the
    cell lineage is recomputed once per branch unless the caller
    persists upstream), then one group-sized null-safe LEFT join.
    """
    if term_scale < 1:
        raise ValueError(f"term_scale must be >= 1, got {term_scale}")
    from pyspark.sql import Window

    u = F.col(unit_col) if isinstance(unit_col, str) else unit_col
    cat = F.col(cat_col) if isinstance(cat_col, str) else cat_col
    cells = (
        df.where(u.isNotNull() & cat.isNotNull())
        .groupBy(*group_cols, u.alias("__u"), cat.alias("__cat"))
        .agg(F.count(F.lit(1)).cast(_D).alias("__o"))
    )
    o = F.col("__o")
    unit_lvl = cells.groupBy(*group_cols, "__u").agg(
        F.sum(o).alias("__m"),
        F.sum(o * o).alias("__so2"),
    )
    m = F.col("__m")
    t_u = F.expr(
        f"CAST(((__m * __m - __so2) * CAST({term_scale} AS DECIMAL(38,0)))"
        f" div (__m - 1) AS DECIMAL(38,0))"
    )
    zd = F.lit(0).cast("decimal(38,0)")
    ga = unit_lvl.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(F.when(m >= 2, 1).otherwise(0)).alias("n_units_pairable"),
        F.sum(F.when(m >= 2, m).otherwise(zd)).alias("__n"),
        F.sum(F.when(m >= 2, t_u).otherwise(zd)).alias("__do"),
    )
    wu = Window.partitionBy(*group_cols, "__u")
    marg = (
        cells.withColumn("__mu", F.sum("__o").over(wu))
        .where(F.col("__mu") >= 2)
        .groupBy(*group_cols, "__cat")
        .agg(F.sum("__o").alias("__nc"))
    )
    gb = marg.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("__nc") * F.col("__nc")).alias("__snc2"),
    )
    j = _nullsafe_join(ga, gb, group_cols)
    n = F.col("__n")
    ts = F.lit(term_scale).cast("decimal(38,0)")
    de = n * n - F.coalesce(F.col("__snc2"), zd)
    j = j.withColumn("__de", de)
    dec, doc = F.col("__de"), F.col("__do")
    return j.select(
        *group_cols,
        "n_units",
        "n_units_pairable",
        n.cast("long").alias("n"),
        F.coalesce(F.col("k"), F.lit(0)).alias("k"),
        doc.cast("string").alias("do_fp"),
        dec.cast("string").alias("de_fp"),
        F.when(
            (dec > 0) & (n >= 2),
            (ts * dec - (n - 1) * doc).cast("double")
            / (ts * dec).cast("double"),
        ).alias("alpha"),
    )


def krippendorff_alpha_sql(
    table: str, group: str, unit: str, cat: str, *, term_scale: int = 1_000_000
) -> str:
    """DuckDB twin of :func:`krippendorff_alpha` (hugeint counts, `//`
    on nonnegative operands, identical LEFT join via IS NOT DISTINCT
    FROM and single-division shape)."""
    return f"""
        WITH __ka_cells AS (
            SELECT {group} AS g, {unit} AS u, {cat} AS cat,
                   count(*)::HUGEINT AS o
            FROM {table}
            WHERE ({unit}) IS NOT NULL AND ({cat}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        __ka_unit AS (
            SELECT g, u, sum(o) AS m, sum(o * o) AS so2
            FROM __ka_cells GROUP BY g, u
        ),
        __ka_a AS (
            SELECT g, count(*)::BIGINT AS n_units,
                   sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END)::BIGINT
                       AS n_units_pairable,
                   sum(CASE WHEN m >= 2 THEN m ELSE 0 END) AS n,
                   sum(CASE WHEN m >= 2 THEN
                       ((m * m - so2) * {term_scale}::HUGEINT) // (m - 1)
                       ELSE 0 END) AS do_
            FROM __ka_unit GROUP BY g
        ),
        __ka_marg AS (
            SELECT g, cat, sum(o) AS nc
            FROM (SELECT g, u, cat, o,
                         sum(o) OVER (PARTITION BY g, u) AS mu
                  FROM __ka_cells)
            WHERE mu >= 2 GROUP BY g, cat
        ),
        __ka_b AS (
            SELECT g, count(*)::BIGINT AS k, sum(nc * nc) AS snc2
            FROM __ka_marg GROUP BY g
        )
        SELECT a.g AS {group}, a.n_units, a.n_units_pairable,
               CAST(a.n AS BIGINT) AS n, coalesce(b.k, 0) AS k,
               a.do_::VARCHAR AS do_fp,
               (a.n * a.n - coalesce(b.snc2, 0::HUGEINT))::VARCHAR AS de_fp,
               CASE WHEN a.n * a.n - coalesce(b.snc2, 0::HUGEINT) > 0
                         AND a.n >= 2 THEN
                   CAST({term_scale}::HUGEINT
                            * (a.n * a.n - coalesce(b.snc2, 0::HUGEINT))
                        - (a.n - 1) * a.do_ AS DOUBLE)
                   / CAST({term_scale}::HUGEINT
                            * (a.n * a.n - coalesce(b.snc2, 0::HUGEINT))
                       AS DOUBLE)
               END AS alpha
        FROM __ka_a a LEFT JOIN __ka_b b ON a.g IS NOT DISTINCT FROM b.g
    """


def cochran_q(
    df: DataFrame,
    group_cols: list[str],
    subject_col,
    treat_col,
    flag_col,
) -> DataFrame:
    """(group…, n_subjects, n_excluded, n_used, k, df, q_stat) —
    exact Cochran's Q per group: for k binary flags measured on the
    SAME subject (did the doc pass each of k filters; did the user
    touch each of k features), is any flag systematically more common?
    The k-treatment completion of grouped_mcnemar exactly as
    grouped_kruskal_wallis completes grouped_mannwhitney — and for
    k = 2, Q equals McNemar's (b−c)²/(b+c) EXACTLY (pinned by test).

    Algebra (Cochran 1950), cleared to ONE division: with
    per-treatment success totals T_j, per-subject totals R_i, and
    N = ΣT_j = ΣR_i over COMPLETE subjects only,

        Q = (k−1)·(k·ΣT_j² − N²) / (k·N − ΣR_i²)

    — every operand an exact decimal(38,0)/hugeint integer:
    engine-identical, hash-oracle-able.  Q is NULL when the
    denominator is 0 (every subject all-0 or all-1 — no discordance,
    the test is undefined).  ~χ²_{k−1} under H₀.

    Completeness: k is the number of DISTINCT treatments observed in
    the group; subjects missing any treatment are excluded (their
    count reported in ``n_excluded`` — the fleiss_kappa convention).
    Duplicate (subject, treatment) rows canonicalize to max(flag)
    (the ranking_metrics convention).  Flags must be boolean or 0/1
    (anything else raises in-plan); NULL subject/treatment/flag drops
    the row.

    Scale shape: one map-side-combined (group, subject, treat) cell
    histogram; a collect_set window for k; then the per-subject and
    per-treatment cascades (two cell-scale branches) joined
    group-sized and null-safe.
    """
    from pyspark.sql import Window

    s = F.col(subject_col) if isinstance(subject_col, str) else subject_col
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    fr = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    dt = df.select(fr.alias("__probe")).schema[0].dataType.simpleString()
    if dt == "boolean":
        x = fr.cast("long")
    else:
        x = F.when(fr.isin(0, 1), fr.cast("long")).otherwise(
            F.raise_error(F.lit("cochran_q: flag must be 0/1 or boolean"))
        )
    cells = (
        df.where(s.isNotNull() & t.isNotNull() & fr.isNotNull())
        .groupBy(*group_cols, s.alias("__s"), t.alias("__t"))
        .agg(F.max(x).alias("__x"))
    )
    wg = Window.partitionBy(*group_cols)
    ws = Window.partitionBy(*group_cols, "__s")
    w = cells.withColumn(
        "__k", F.size(F.collect_set("__t").over(wg))
    ).withColumn("__m", F.count(F.lit(1)).over(ws))
    complete = w.where(F.col("__m") == F.col("__k"))
    subj = complete.groupBy(*group_cols, "__s").agg(
        F.sum("__x").cast(_D).alias("__r"),
        F.max("__k").alias("__k"),
    )
    ga = subj.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.max("__k").alias("k"),
        F.sum("__r").alias("__N"),
        F.sum(F.col("__r") * F.col("__r")).alias("__sr2"),
    )
    treat = complete.groupBy(*group_cols, "__t").agg(
        F.sum("__x").cast(_D).alias("__tj")
    )
    gb = treat.groupBy(*group_cols).agg(
        F.sum(F.col("__tj") * F.col("__tj")).alias("__st2")
    )
    tot = cells.groupBy(*group_cols).agg(
        F.countDistinct("__s").alias("n_subjects")
    )
    j = _nullsafe_join(_nullsafe_join(tot, ga, group_cols), gb, group_cols)
    n, sr2, st2, k = (
        F.col("__N"),
        F.col("__sr2"),
        F.col("__st2"),
        F.col("k").cast(_D),
    )
    num = (k - 1) * (k * st2 - n * n)
    den = k * n - sr2
    zd = F.lit(0).cast("decimal(38,0)")
    nu = F.coalesce(F.col("n_used"), F.lit(0))
    return j.select(
        *group_cols,
        "n_subjects",
        (F.col("n_subjects") - nu).alias("n_excluded"),
        nu.alias("n_used"),
        F.coalesce(F.col("k"), F.lit(0)).alias("k"),
        (F.coalesce(F.col("k"), F.lit(1)) - 1).alias("df"),
        F.when(
            den > zd, num.cast("double") / den.cast("double")
        ).alias("q_stat"),
    )


def cochran_q_sql(
    table: str, group: str, subject: str, treat: str, flag: str
) -> str:
    """DuckDB twin of :func:`cochran_q` (hugeint totals, identical
    completeness rule, single-division shape)."""
    xi = (
        f"(CASE WHEN ({flag}) IN (0, 1) OR typeof({flag}) = 'BOOLEAN'"
        f" THEN ({flag})::BIGINT"
        f" ELSE CAST(error('cochran_q: flag must be 0/1 or boolean')"
        f" AS BIGINT) END)"
    )
    return f"""
        WITH __cq_cells AS (
            SELECT {group} AS g, {subject} AS s, {treat} AS t,
                   max({xi})::BIGINT AS x
            FROM {table}
            WHERE ({subject}) IS NOT NULL AND ({treat}) IS NOT NULL
              AND ({flag}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        __cq_w AS (
            SELECT g, s, t, x,
                   count(DISTINCT t) OVER (PARTITION BY g) AS k,
                   count(*) OVER (PARTITION BY g, s) AS m
            FROM __cq_cells
        ),
        __cq_subj AS (
            SELECT g, s, sum(x)::HUGEINT AS r, any_value(k) AS k
            FROM __cq_w WHERE m = k GROUP BY g, s
        ),
        __cq_a AS (
            SELECT g, count(*)::BIGINT AS n_used, any_value(k) AS k,
                   sum(r) AS n, sum(r * r) AS sr2
            FROM __cq_subj GROUP BY g
        ),
        __cq_b AS (
            SELECT g, sum(tj * tj) AS st2
            FROM (SELECT g, t, sum(x)::HUGEINT AS tj
                  FROM __cq_w WHERE m = k GROUP BY g, t)
            GROUP BY g
        ),
        __cq_tot AS (
            SELECT g, count(DISTINCT s)::BIGINT AS n_subjects
            FROM __cq_cells GROUP BY g
        )
        SELECT tot.g AS {group}, tot.n_subjects,
               tot.n_subjects - coalesce(a.n_used, 0) AS n_excluded,
               coalesce(a.n_used, 0) AS n_used,
               coalesce(a.k, 0)::BIGINT AS k,
               (coalesce(a.k, 1) - 1)::BIGINT AS df,
               CASE WHEN a.k::HUGEINT * a.n - a.sr2 > 0 THEN
                   CAST((a.k::HUGEINT - 1)
                        * (a.k::HUGEINT * b.st2 - a.n * a.n) AS DOUBLE)
                   / CAST(a.k::HUGEINT * a.n - a.sr2 AS DOUBLE)
               END AS q_stat
        FROM __cq_tot tot
        LEFT JOIN __cq_a a ON tot.g IS NOT DISTINCT FROM a.g
        LEFT JOIN __cq_b b ON tot.g IS NOT DISTINCT FROM b.g
    """


def friedman(
    df: DataFrame,
    group_cols: list[str],
    subject_col,
    treat_col,
    value_col,
) -> DataFrame:
    """(group…, n_blocks, n_excluded, n_used, k, df, ties_t, chi2,
    chi2_corrected, kendall_w) — exact Friedman test per group: k
    treatments measured on the SAME subject, compared by WITHIN-
    subject ranks.  Completes the blocked-design corner the way the
    independent-sample kit is completed: ANOVA→KW (independent,
    means→ranks), McNemar→Cochran Q (paired, binary) — Friedman is
    the paired-ordinal cell (repeated measures without normality),
    and Kendall's W = χ²_F/(n(k−1)) is its [0,1] concordance effect
    size.

    Ranks never touch floats: within each complete block the DOUBLED
    midrank is 2·cum − ct + 1 (exact integers off two block-local
    windows; values COMPARE, never compute — doubles welcome).  With
    R₂ⱼ = Σ doubled ranks per treatment over n complete blocks:

        chi2 = 3·(ΣR₂ⱼ² − n²·k·(k+1)²) / (n·k·(k+1))
                                    (ONE division of exact integers;
                                     ≥ 0 by Cauchy–Schwarz since
                                     midranks preserve the block rank
                                     sum — NO quantization anywhere)
        chi2_corrected = chi2 / ((n·k·(k²−1) − T) / (n·k·(k²−1)))
                                    (tie correction, T = Σ_blocks
                                     Σ(t³−t) exact; fixed 3-division
                                     shape; NULL when every block is
                                     all-tied)
        kendall_w = 3·(ΣR₂ⱼ² − n²·k·(k+1)²)
                    / (n·k·(k+1)·n·(k−1))   (one division; == 1.0
                                             EXACTLY under perfect
                                             concordance)

    — engine-identical, hash-oracle-able including all three doubles.
    Completeness: k = DISTINCT treatments observed in the group;
    blocks missing any treatment are excluded loudly (n_excluded).
    Duplicate (subject, treatment) rows canonicalize to max(value)
    (the ranking_metrics convention).  NULL/NaN values and NULL
    subject/treatment drop the row (possibly incompleting the block).
    chi2 is NULL when k < 2 or n = 0.  OVERFLOW: ΣR₂ⱼ² ≲ 4k³n² on
    decimal(38,0).  The reported ties_t DIAGNOSTIC is NULL (TRY_CAST, both
    engines) past BIGINT — ≥ ~2.1M rows sharing one value —
    while every statistic keeps its exact wide arithmetic.

    Scale shape: the canonicalized panel (one row per (subject,
    treatment)) is the row-scale stage; ranks are two block-local
    windows over one (group, subject) exchange; the treatment and
    group cascades are cell-scale.  One null-safe LEFT join keeps
    groups with zero complete blocks.
    """
    from pyspark.sql import Window

    s = F.col(subject_col) if isinstance(subject_col, str) else subject_col
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    panel = (
        df.where(
            s.isNotNull()
            & t.isNotNull()
            & v.isNotNull()
            & ~F.isnan(v.cast("double"))
        )
        .groupBy(*group_cols, s.alias("__s"), t.alias("__t"))
        .agg(F.max(v).alias("__v"))
    )
    wg = Window.partitionBy(*group_cols)
    ws = Window.partitionBy(*group_cols, "__s")
    wsv = Window.partitionBy(*group_cols, "__s", "__v")
    wcum = ws.orderBy("__v").rangeBetween(Window.unboundedPreceding, 0)
    w = (
        panel.withColumn("__k", F.size(F.collect_set("__t").over(wg)))
        .withColumn("__m", F.count(F.lit(1)).over(ws))
        .withColumn("__ct", F.count(F.lit(1)).over(wsv))
        .withColumn("__cum", F.count(F.lit(1)).over(wcum))
        # per-block tie term: each distinct tied value contributes
        # ct^3 - ct once (first-row indicator within (g,s,v) —
        # materialized here: a window inside an aggregate is illegal)
        .withColumn(
            "__first",
            (F.row_number().over(wsv.orderBy("__t")) == 1).cast("long"),
        )
    )
    tot = panel.groupBy(*group_cols).agg(
        F.countDistinct("__s").alias("n_blocks")
    )
    complete = w.where(F.col("__m") == F.col("__k"))
    r2 = (F.lit(2) * F.col("__cum") - F.col("__ct") + 1).cast(_D)
    first = F.col("__first")
    ct = F.col("__ct").cast(_D)
    per_t = complete.groupBy(*group_cols, "__t").agg(
        F.sum(r2).alias("__r2j"),
        F.count(F.lit(1)).alias("__nb"),
        F.max("__k").alias("__k"),
        F.sum(first * (ct * ct * ct - ct)).alias("__tp"),
    )
    ga = per_t.groupBy(*group_cols).agg(
        F.max("__nb").alias("n_used"),
        F.max("__k").alias("k"),
        F.sum(F.col("__r2j") * F.col("__r2j")).alias("__sr2"),
        F.sum("__tp").alias("__T"),
    )
    j = _nullsafe_join(tot, ga, group_cols)
    n = F.col("n_used").cast(_D)
    k = F.col("k").cast(_D)
    sr2, tt = F.col("__sr2"), F.col("__T")
    num = F.lit(3).cast(_D) * (sr2 - n * n * k * (k + 1) * (k + 1))
    den = n * k * (k + 1)
    tden = n * k * (k * k - 1)
    chi = num.cast("double") / den.cast("double")
    ok = (F.col("k") >= 2) & (F.col("n_used") > 0)
    nu = F.coalesce(F.col("n_used"), F.lit(0)).cast("long")
    return j.select(
        *group_cols,
        "n_blocks",
        (F.col("n_blocks") - nu).alias("n_excluded"),
        nu.alias("n_used"),
        F.coalesce(F.col("k"), F.lit(0)).cast("long").alias("k"),
        (F.coalesce(F.col("k"), F.lit(1)) - 1).cast("long").alias("df"),
        F.coalesce(tt, F.lit(0).cast(_D)).try_cast("long").alias("ties_t"),
        F.when(ok, chi).alias("chi2"),
        F.when(
            ok & (tden - tt > F.lit(0).cast(_D)),
            chi / ((tden - tt).cast("double") / tden.cast("double")),
        ).alias("chi2_corrected"),
        F.when(
            ok & (F.col("k") >= 2),
            num.cast("double") / (den * n * (k - 1)).cast("double"),
        ).alias("kendall_w"),
    )


def friedman_sql(
    table: str, group: str, subject: str, treat: str, value: str
) -> str:
    """DuckDB twin of :func:`friedman` (hugeint rank sums, identical
    completeness/canonicalization rules and division shapes)."""
    return f"""
        WITH __fr_panel AS (
            SELECT {group} AS g, {subject} AS s, {treat} AS t,
                   max({value}) AS v
            FROM {table}
            WHERE ({subject}) IS NOT NULL AND ({treat}) IS NOT NULL
              AND ({value}) IS NOT NULL
              AND NOT isnan(CAST({value} AS DOUBLE))
            GROUP BY 1, 2, 3
        ),
        __fr_w AS (
            SELECT g, s, t, v,
                   count(DISTINCT t) OVER (PARTITION BY g) AS k,
                   count(*) OVER (PARTITION BY g, s) AS m,
                   count(*) OVER (PARTITION BY g, s, v) AS ct,
                   count(*) OVER (PARTITION BY g, s ORDER BY v
                                  RANGE BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
                   CASE WHEN row_number() OVER (PARTITION BY g, s, v
                                                ORDER BY t) = 1
                        THEN 1 ELSE 0 END AS first
            FROM __fr_panel
        ),
        __fr_t AS (
            SELECT g, t,
                   sum((2 * cum - ct + 1)::HUGEINT) AS r2j,
                   count(*)::BIGINT AS nb,
                   any_value(k) AS k,
                   sum(first::HUGEINT
                       * (ct::HUGEINT * ct::HUGEINT * ct::HUGEINT
                          - ct::HUGEINT)) AS tp
            FROM __fr_w WHERE m = k GROUP BY g, t
        ),
        __fr_a AS (
            SELECT g, max(nb) AS n, any_value(k)::HUGEINT AS k,
                   sum(r2j * r2j) AS sr2, sum(tp) AS tt
            FROM __fr_t GROUP BY g
        ),
        __fr_tot AS (
            SELECT g, count(DISTINCT s)::BIGINT AS n_blocks
            FROM __fr_panel GROUP BY g
        )
        SELECT tot.g AS {group}, tot.n_blocks,
               tot.n_blocks - coalesce(a.n, 0) AS n_excluded,
               coalesce(a.n, 0)::BIGINT AS n_used,
               coalesce(a.k, 0)::BIGINT AS k,
               (coalesce(a.k, 1) - 1)::BIGINT AS df,
               TRY_CAST(coalesce(a.tt, 0) AS BIGINT) AS ties_t,
               CASE WHEN a.k >= 2 AND a.n > 0 THEN
                   CAST(3 * (a.sr2 - a.n::HUGEINT * a.n::HUGEINT * a.k
                             * (a.k + 1) * (a.k + 1)) AS DOUBLE)
                   / CAST(a.n::HUGEINT * a.k * (a.k + 1) AS DOUBLE)
               END AS chi2,
               CASE WHEN a.k >= 2 AND a.n > 0
                         AND a.n::HUGEINT * a.k * (a.k * a.k - 1) - a.tt > 0
               THEN
                   (CAST(3 * (a.sr2 - a.n::HUGEINT * a.n::HUGEINT * a.k
                              * (a.k + 1) * (a.k + 1)) AS DOUBLE)
                    / CAST(a.n::HUGEINT * a.k * (a.k + 1) AS DOUBLE))
                   / (CAST(a.n::HUGEINT * a.k * (a.k * a.k - 1) - a.tt
                           AS DOUBLE)
                      / CAST(a.n::HUGEINT * a.k * (a.k * a.k - 1) AS DOUBLE))
               END AS chi2_corrected,
               CASE WHEN a.k >= 2 AND a.n > 0 THEN
                   CAST(3 * (a.sr2 - a.n::HUGEINT * a.n::HUGEINT * a.k
                             * (a.k + 1) * (a.k + 1)) AS DOUBLE)
                   / CAST(a.n::HUGEINT * a.k * (a.k + 1)
                          * a.n::HUGEINT * (a.k - 1) AS DOUBLE)
               END AS kendall_w
        FROM __fr_tot tot
        LEFT JOIN __fr_a a ON tot.g IS NOT DISTINCT FROM a.g
    """


def cronbach_alpha(
    df: DataFrame,
    group_cols: list[str],
    subject_col,
    item_col,
    value_col,
) -> DataFrame:
    """(group…, n_subjects, n_excluded, n_used, k, vt_fp, svi_fp,
    alpha) — exact Cronbach's alpha per group: do k item scores
    measured on the same subject hang together as ONE scale (the
    internal-consistency question for composite quality scores,
    multi-signal rankers, judge panels scoring the same docs)?
    Completes the agreement kit along the third axis: kappa/alpha-K
    ask "do raters agree on categories", Friedman asks "do treatments
    differ", Cronbach asks "do these k signals measure the same
    latent thing".

    The variance identity, cleared to ONE division: with per-item
    sums S_i / squares Q_i and per-subject totals t over the n
    COMPLETE subjects,

        V_i = n·Q_i − S_i²        (item variance numerators, the
                                   common n² denominator cancels)
        V_T = n·Σt² − (Σt)²       (total-score variance numerator)
        alpha = k·(V_T − ΣV_i) / ((k−1)·V_T)

    — every operand an exact decimal(38,0)/hugeint integer:
    engine-identical, hash-oracle-able.  Perfectly redundant items
    (every item a copy) give alpha == 1.0 EXACTLY (V_T = k²·V,
    ΣV_i = k·V — integer algebra, pinned); negative alpha is
    legitimate and not clamped.  NULL when V_T = 0 (every subject the
    same total) or k < 2.

    Completeness: k = DISTINCT items observed in the group; subjects
    missing any item are excluded loudly (n_excluded).  Duplicate
    (subject, item) rows canonicalize to max(value).  Values must be
    integral (floats REJECTED — quantize explicitly); NULL drops the
    row.  OVERFLOW: n·Σt² ≤ n²·(k·max|x|)² < 10³⁸.

    Scale shape: the canonicalized panel is the row-scale stage; the
    item and subject cascades are cell-scale; one null-safe LEFT join
    keeps groups with zero complete subjects.
    """
    from pyspark.sql import Window

    s = F.col(subject_col) if isinstance(subject_col, str) else subject_col
    it = F.col(item_col) if isinstance(item_col, str) else item_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    dt = df.select(v.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"value_col must be integral, got {dt}; quantize explicitly first"
        )
    panel = (
        df.where(s.isNotNull() & it.isNotNull() & v.isNotNull())
        .groupBy(*group_cols, s.alias("__s"), it.alias("__i"))
        .agg(F.max(v.cast("long")).alias("__v"))
    )
    wg = Window.partitionBy(*group_cols)
    ws = Window.partitionBy(*group_cols, "__s")
    w = panel.withColumn(
        "__k", F.size(F.collect_set("__i").over(wg))
    ).withColumn("__m", F.count(F.lit(1)).over(ws))
    tot = panel.groupBy(*group_cols).agg(
        F.countDistinct("__s").alias("n_subjects")
    )
    complete = w.where(F.col("__m") == F.col("__k"))
    x = F.col("__v").cast(_D)
    item = complete.groupBy(*group_cols, "__i").agg(
        F.count(F.lit(1)).cast(_D).alias("__n"),
        F.sum(x).alias("__si"),
        F.sum(x * x).alias("__qi"),
        F.max("__k").alias("__k"),
    )
    ga = item.groupBy(*group_cols).agg(
        F.max("__k").alias("k"),
        F.max("__n").alias("__nc"),
        F.sum(
            F.col("__n") * F.col("__qi") - F.col("__si") * F.col("__si")
        ).alias("__svi"),
    )
    subj = complete.groupBy(*group_cols, "__s").agg(F.sum(x).alias("__t"))
    gb = subj.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_D).alias("__n2"),
        F.sum("__t").alias("__st"),
        F.sum(F.col("__t") * F.col("__t")).alias("__qt"),
    )
    j = _nullsafe_join(_nullsafe_join(tot, ga, group_cols), gb, group_cols)
    vt = F.col("__n2") * F.col("__qt") - F.col("__st") * F.col("__st")
    j = j.withColumn("__vt", vt)
    vtc, svi = F.col("__vt"), F.col("__svi")
    k = F.col("k").cast(_D)
    zd = F.lit(0).cast("decimal(38,0)")
    nu = F.coalesce(F.col("__nc").cast("long"), F.lit(0))
    return j.select(
        *group_cols,
        "n_subjects",
        (F.col("n_subjects") - nu).alias("n_excluded"),
        nu.alias("n_used"),
        F.coalesce(F.col("k"), F.lit(0)).alias("k"),
        vtc.cast("string").alias("vt_fp"),
        svi.cast("string").alias("svi_fp"),
        F.when(
            (F.col("k") >= 2) & (vtc > zd),
            (k * (vtc - svi)).cast("double")
            / ((k - 1) * vtc).cast("double"),
        ).alias("alpha"),
    )


def cronbach_alpha_sql(
    table: str, group: str, subject: str, item: str, value: str
) -> str:
    """DuckDB twin of :func:`cronbach_alpha` (hugeint moments,
    identical completeness/canonicalization rules and single-division
    shape)."""
    return f"""
        WITH __cr_panel AS (
            SELECT {group} AS g, {subject} AS s, {item} AS i,
                   max(({value})::BIGINT) AS v
            FROM {table}
            WHERE ({subject}) IS NOT NULL AND ({item}) IS NOT NULL
              AND ({value}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        __cr_w AS (
            SELECT g, s, i, v,
                   count(DISTINCT i) OVER (PARTITION BY g) AS k,
                   count(*) OVER (PARTITION BY g, s) AS m
            FROM __cr_panel
        ),
        __cr_item AS (
            SELECT g, i, count(*)::HUGEINT AS n,
                   sum(v::HUGEINT) AS si, sum(v::HUGEINT * v::HUGEINT) AS qi,
                   any_value(k) AS k
            FROM __cr_w WHERE m = k GROUP BY g, i
        ),
        __cr_a AS (
            SELECT g, any_value(k)::HUGEINT AS k, max(n) AS nc,
                   sum(n * qi - si * si) AS svi
            FROM __cr_item GROUP BY g
        ),
        __cr_subj AS (
            SELECT g, s, sum(v::HUGEINT) AS t
            FROM __cr_w WHERE m = k GROUP BY g, s
        ),
        __cr_b AS (
            SELECT g, count(*)::HUGEINT AS n2, sum(t) AS st,
                   sum(t * t) AS qt
            FROM __cr_subj GROUP BY g
        ),
        __cr_tot AS (
            SELECT g, count(DISTINCT s)::BIGINT AS n_subjects
            FROM __cr_panel GROUP BY g
        )
        SELECT tot.g AS {group}, tot.n_subjects,
               tot.n_subjects - coalesce(a.nc, 0) AS n_excluded,
               coalesce(a.nc, 0)::BIGINT AS n_used,
               coalesce(a.k, 0)::BIGINT AS k,
               (b.n2 * b.qt - b.st * b.st)::VARCHAR AS vt_fp,
               a.svi::VARCHAR AS svi_fp,
               CASE WHEN a.k >= 2 AND b.n2 * b.qt - b.st * b.st > 0 THEN
                   CAST(a.k * (b.n2 * b.qt - b.st * b.st - a.svi) AS DOUBLE)
                   / CAST((a.k - 1) * (b.n2 * b.qt - b.st * b.st) AS DOUBLE)
               END AS alpha
        FROM __cr_tot tot
        LEFT JOIN __cr_a a ON tot.g IS NOT DISTINCT FROM a.g
        LEFT JOIN __cr_b b ON tot.g IS NOT DISTINCT FROM b.g
    """


def wilcoxon_signed_rank(
    df: DataFrame,
    group_cols: list[str],
    a_col,
    b_col,
) -> DataFrame:
    """(group…, n_pairs, n_zero, n_used, ties_t, w2_fp, w_plus,
    rank_biserial, z) — exact Wilcoxon signed-rank test per group:
    for PAIRED measurements (a, b) on the same subject, is the
    distribution of differences shifted from zero?  The paired-ranks
    cell of the design grid — Friedman (k treatments, ordinal) and
    McNemar (paired binary) bracket it; this is the two-treatment
    CONTINUOUS paired test, the within-subject counterpart of
    Mann–Whitney exactly as the paired t is of Welch.

    d = a − b is the only computation on values (IEEE subtraction is
    correctly rounded, engine-identical; integral inputs stay exact).
    Zero differences are DROPPED (the Wilcoxon convention) and
    reported as n_zero; the |d| histogram then COMPARES values, never
    computes with them.  With doubled midranks r₂ = 2·cum + t + 1
    over distinct |d| (t the tie count) and per-value positive
    counts p:

        W₂   = Σ p·r₂                 (doubled W⁺, exact integer;
                                       W⁺ + W⁻ = n(n+1)/2 so
                                       W₂⁺ + W₂⁻ = 2·n(n+1)/2)
        w_plus        = W₂ / 2        (exact halving)
        rank_biserial = (W₂ − S) / S  (ONE division; S = n(n+1)/2 —
                                       the matched-pairs effect size
                                       (W⁺−W⁻)/(W⁺+W⁻), +1 when every
                                       difference is positive)
        z = (2·W₂ − 2·S) / √( (2n(n+1)(2n+1) − T) / 3 )
                                      (tie-corrected normal approx,
                                       T = Σ_|d| t³−t; numerator is
                                       4·(W⁺−μ), denominator √(16·σ²);
                                       fixed div→sqrt→div shape)

    — every count an exact decimal(38,0)/hugeint integer, each double
    a single correctly-rounded shape: engine-identical,
    hash-oracle-able.  2n(n+1)(2n+1) − T ≥ 3n(n+1)² > 0 for n ≥ 1
    (even all-tied-|d| groups have positive variance), so z is NULL
    only when n_used = 0.  No continuity correction (same documented
    choice as grouped_mannwhitney).  NULL or NaN in either value
    drops the pair.  OVERFLOW: n(n+1)(2n+1) < 1e38 → n per group
    ≲ 3·10¹².  The reported ties_t DIAGNOSTIC is NULL (TRY_CAST, both
    engines) past BIGINT — ≥ ~2.1M rows sharing one value —
    while every statistic keeps its exact wide arithmetic.

    Scale shape: one map-side-combined (group, |d|) histogram with
    sign-split counts (the zero cell included; pair totals derive
    from the same histogram, ReusedExchange), one per-GROUP
    cumulative window over compressed |d|, one group-sized
    aggregate — the grouped_ks /
    grouped_mannwhitney shape with the cohort axis replaced by the
    sign split.
    """
    from pyspark.sql import Window

    a = F.col(a_col) if isinstance(a_col, str) else a_col
    b = F.col(b_col) if isinstance(b_col, str) else b_col
    d = (a - b).alias("__d")
    base = df.where(a.isNotNull() & b.isNotNull()).select(*group_cols, d)
    dt = base.schema["__d"].dataType.simpleString()
    dc = F.col("__d")
    if dt in ("float", "double"):
        base = base.where(~F.isnan(dc))
    # ONE row-scale |d| histogram INCLUDING the zero cell; the pair
    # totals and the nonzero rank branch both derive from it, so the
    # planner emits the row-scale shuffle once and reuses it
    # (ReusedExchange — the kendall/jonckheere/theil rewrite) instead
    # of aggregating the raw pairs twice with different keys
    hall = base.groupBy(*group_cols, F.abs(dc).alias("__v")).agg(
        F.count(F.lit(1)).cast(_D).alias("__t"),
        F.sum((dc > 0).cast("long")).cast(_D).alias("__p"),
    )
    zd0 = F.lit(0).cast(_D)
    n_pairs = hall.groupBy(*group_cols).agg(
        F.sum("__t").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("__v") == 0, F.col("__t")).otherwise(zd0))
        .cast("long")
        .alias("n_zero"),
    )
    h = hall.where(F.col("__v") != 0)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = h.withColumn(
        "__cum", F.coalesce(F.sum("__t").over(w), F.lit(0).cast(_D))
    )
    t = F.col("__t")
    r2 = F.lit(2).cast(_D) * F.col("__cum") + t + 1
    agg = c.groupBy(*group_cols).agg(
        F.sum(t).alias("__n"),
        F.sum(F.col("__p") * r2).alias("__w2"),
        F.sum(t * t * t - t).alias("__T"),
    )
    j = _nullsafe_join(n_pairs, agg, group_cols)
    n = F.coalesce(F.col("__n"), F.lit(0).cast(_D))
    w2, tt = F.col("__w2"), F.col("__T")
    s = n * (n + 1)  # 2·S, i.e. doubled rank sum
    den = F.lit(2).cast(_D) * n * (n + 1) * (2 * n + 1) - tt
    return j.select(
        *group_cols,
        "n_pairs",
        "n_zero",
        n.cast("long").alias("n_used"),
        F.coalesce(tt, F.lit(0).cast(_D)).try_cast("long").alias("ties_t"),
        w2.cast("string").alias("w2_fp"),
        (w2.cast("double") / F.lit(2.0)).alias("w_plus"),
        F.when(
            n > 0, (F.lit(2).cast(_D) * w2 - s).cast("double") / s.cast("double")
        ).alias("rank_biserial"),
        F.when(
            n > 0,
            (F.lit(2).cast(_D) * w2 - s).cast("double")
            / F.sqrt(den.cast("double") / F.lit(3.0)),
        ).alias("z"),
    )


def wilcoxon_signed_rank_sql(table: str, group: str, a: str, b: str) -> str:
    """DuckDB twin of :func:`wilcoxon_signed_rank` (hugeint counts,
    identical doubled-midrank / single-division / div→sqrt→div
    shapes)."""
    return f"""
        WITH __wsr_d AS (
            SELECT {group} AS g, ({a}) - ({b}) AS d
            FROM {table}
            WHERE ({a}) IS NOT NULL AND ({b}) IS NOT NULL
              AND NOT isnan((({a}) - ({b}))::DOUBLE)
        ),
        __wsr_hall AS (
            -- one |d| histogram INCLUDING the zero cell; totals +
            -- rank branch both derive (the Spark ReusedExchange shape)
            SELECT g, abs(d) AS v, count(*)::HUGEINT AS t,
                   sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::HUGEINT AS p
            FROM __wsr_d GROUP BY g, abs(d)
        ),
        __wsr_np AS (
            SELECT g, sum(t)::BIGINT AS n_pairs,
                   sum(CASE WHEN v = 0 THEN t ELSE 0::HUGEINT END)::BIGINT
                       AS n_zero
            FROM __wsr_hall GROUP BY g
        ),
        __wsr_h AS (
            SELECT g, v, t, p FROM __wsr_hall WHERE v <> 0
        ),
        __wsr_c AS (
            SELECT g, v, t, p,
                   coalesce(sum(t) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum
            FROM __wsr_h
        ),
        __wsr_a AS (
            SELECT g, sum(t) AS n, sum(p * (2 * cum + t + 1)) AS w2,
                   sum(t * t * t - t) AS tt
            FROM __wsr_c GROUP BY g
        )
        SELECT np.g AS {group}, np.n_pairs, np.n_zero,
               coalesce(a.n, 0)::BIGINT AS n_used,
               TRY_CAST(coalesce(a.tt, 0) AS BIGINT) AS ties_t,
               a.w2::VARCHAR AS w2_fp,
               a.w2::DOUBLE / 2.0 AS w_plus,
               CASE WHEN a.n > 0 THEN
                   CAST(2 * a.w2 - a.n * (a.n + 1) AS DOUBLE)
                   / CAST(a.n * (a.n + 1) AS DOUBLE)
               END AS rank_biserial,
               CASE WHEN a.n > 0 THEN
                   CAST(2 * a.w2 - a.n * (a.n + 1) AS DOUBLE)
                   / sqrt(CAST(2 * a.n * (a.n + 1) * (2 * a.n + 1) - a.tt
                               AS DOUBLE) / 3.0)
               END AS z
        FROM __wsr_np np
        LEFT JOIN __wsr_a a ON np.g IS NOT DISTINCT FROM a.g
    """


def paired_t(
    df: DataFrame,
    group_cols: list[str],
    a_col,
    b_col,
) -> DataFrame:
    """(group…, n, s_fp, vd_fp, mean_diff, t, dof, cohens_dz) — exact
    paired t-test per group: for PAIRED integral measurements (a, b)
    on the same subject, is the MEAN difference nonzero?  The paired
    means cell of the design grid (grouped_welch assumes independent
    cohorts; pairing removes between-subject variance, which is the
    whole point of a within-subject design) and the parametric
    counterpart of wilcoxon_signed_rank.

    With d = a − b (exact on integers), S = Σd and Q = Σd² exact
    decimal(38,0)/hugeint moments over the n pairs:

        V_d       = n·Q − S²          (variance numerator, exact;
                                       ≥ 0 by Cauchy–Schwarz)
        mean_diff = S / n             (ONE division)
        t         = S / √( V_d / (n−1) )      (fixed div→sqrt→div;
                                               algebra: d̄/(s_d/√n)
                                               with the n's cleared)
        cohens_dz = S / √( n·V_d / (n−1) )    (d̄/s_d = t/√n, same
                                               fixed shape)

    — engine-identical, hash-oracle-able.  t/dz are NULL when n < 2
    or V_d = 0 (constant difference — infinite t is reported as NULL
    with vd_fp = 0 observable, not as a sentinel).  Zero differences
    are KEPT (unlike Wilcoxon — the t-test uses them as evidence for
    the null).  Values must be integral (floats REJECTED — quantize
    explicitly); NULL in either drops the pair.  OVERFLOW:
    n·Σd² < 1e38 → n·max(d)² ≲ 1e38.

    Scale shape: ONE map-side-combined three-moment aggregate per
    group; nothing after it.
    """
    a = F.col(a_col) if isinstance(a_col, str) else a_col
    b = F.col(b_col) if isinstance(b_col, str) else b_col
    for col, name in ((a, "a_col"), (b, "b_col")):
        dt = df.select(col.alias("__probe")).schema[0].dataType.simpleString()
        if dt in ("float", "double") or dt.startswith("decimal"):
            raise ValueError(
                f"paired_t: {name} must be integral, got {dt};"
                " quantize explicitly first"
            )
    d = (a.cast("long") - b.cast("long")).cast(_D)
    agg = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast(_D).alias("__n"),
            F.sum(d).alias("__s"),
            F.sum(d * d).alias("__q"),
        )
    )
    n, s, q = F.col("__n"), F.col("__s"), F.col("__q")
    vd = n * q - s * s
    agg = agg.withColumn("__vd", vd)
    vdc = F.col("__vd")
    ok = (n >= 2) & (vdc > 0)
    return agg.select(
        *group_cols,
        n.cast("long").alias("n"),
        s.cast("string").alias("s_fp"),
        vdc.cast("string").alias("vd_fp"),
        (s.cast("double") / n.cast("double")).alias("mean_diff"),
        F.when(
            ok,
            s.cast("double") / F.sqrt(vdc.cast("double") / (n - 1).cast("double")),
        ).alias("t"),
        (n - 1).cast("long").alias("dof"),
        F.when(
            ok,
            s.cast("double")
            / F.sqrt((n * vdc).cast("double") / (n - 1).cast("double")),
        ).alias("cohens_dz"),
    )


def paired_t_sql(table: str, group: str, a: str, b: str) -> str:
    """DuckDB twin of :func:`paired_t` (hugeint moments, identical
    single-division / div→sqrt→div shapes)."""
    return f"""
        WITH __pt AS (
            SELECT {group} AS g, count(*)::HUGEINT AS n,
                   sum((({a})::BIGINT - ({b})::BIGINT)::HUGEINT) AS s,
                   sum((({a})::BIGINT - ({b})::BIGINT)::HUGEINT
                       * (({a})::BIGINT - ({b})::BIGINT)::HUGEINT) AS q
            FROM {table}
            WHERE ({a}) IS NOT NULL AND ({b}) IS NOT NULL
            GROUP BY 1
        )
        SELECT g AS {group}, n::BIGINT AS n, s::VARCHAR AS s_fp,
               (n * q - s * s)::VARCHAR AS vd_fp,
               s::DOUBLE / n::DOUBLE AS mean_diff,
               CASE WHEN n >= 2 AND n * q - s * s > 0 THEN
                   s::DOUBLE / sqrt(CAST(n * q - s * s AS DOUBLE)
                                    / CAST(n - 1 AS DOUBLE))
               END AS t,
               (n - 1)::BIGINT AS dof,
               CASE WHEN n >= 2 AND n * q - s * s > 0 THEN
                   s::DOUBLE / sqrt(CAST(n * (n * q - s * s) AS DOUBLE)
                                    / CAST(n - 1 AS DOUBLE))
               END AS cohens_dz
        FROM __pt
    """


def grouped_theil(
    df: DataFrame,
    group_cols: list[str],
    value_col,
) -> DataFrame:
    """(group…, n_rows, n_nonpos, n, sum_fp, theil_t_micro, theil_t,
    theil_l_micro, theil_l) — exact-fixed-point Theil T and Theil L
    (mean log deviation) inequality indices per group: how unevenly
    is a positive quantity (tokens per document, spend per customer,
    events per user) distributed over its holders?  The
    ENTROPY-based inequality pair next to grouped_gini — Gini weights
    transfers near the middle, T is top-sensitive, L is
    bottom-sensitive, and both belong to the additively-decomposable
    generalized-entropy family Gini does not.

    With the (group, v) histogram (c rows at value v) and N = Σc,
    S = Σc·v, the identities

        T = (1/S)·Σ c·v·ln v − ln S + ln N     (= (1/N)Σ (x/μ)ln(x/μ))
        L = ln S − ln N − (1/N)·Σ c·ln v       (= (1/N)Σ ln(μ/x))

    ride the proven micro-nat machinery: every ln quantized ONCE per
    distinct operand to micro-nat longs (positive args, HALF_UP ==
    half-away), Σ-terms exact order-independent decimal(38,0)/hugeint
    integers, the divisions integral (nonnegative operands, div ==
    //), both results clamped at the Jensen floor 0 (quantization can
    undershoot by ~2 micro-nats; all-equal groups land within that of
    0 — pinned).  theil_t/theil_l are the micro integers / 10⁶ —
    engine-identical, hash-oracle-able.

    Values must be positive integers: floats REJECTED (quantize
    explicitly), NULL drops the row, values ≤ 0 are excluded loudly
    (n_nonpos — ln is undefined there; callers who want zeros to
    count must shift or bucket first).  Groups with no positive rows
    keep their row with NULL indices (null-safe LEFT join).
    OVERFLOW: Σ c·v·ln_micro(v) ≤ S·ln_micro(v_max) < 10³⁸ → S ≲ 10²⁹.

    Scale shape: one map-side-combined (group, v) histogram over ALL
    values — the only row-scale stage, its shuffle emitted once and
    reused by the totals and the positive-only entropy branch
    (ReusedExchange) — then cell-scale aggregates and a group-sized
    null-safe join.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    dt = df.select(v.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"grouped_theil: value_col must be integral, got {dt};"
            " quantize explicitly first"
        )
    ln_micro = _ln_micro
    base = df.where(v.isNotNull()).select(*group_cols, v.cast("long").alias("__x"))
    # ONE row-scale histogram over ALL values (nonpositives included);
    # the totals and the positive-only entropy branch both derive from
    # it, so the planner emits the row-scale shuffle once and reuses
    # it (ReusedExchange — the kendall/jonckheere rewrite) instead of
    # aggregating the raw rows twice with different keys
    cells = base.groupBy(*group_cols, F.col("__x").alias("__v")).agg(
        F.count(F.lit(1)).cast(_D).alias("__c")
    )
    tot = cells.groupBy(*group_cols).agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("__v") <= 0, F.col("__c")).otherwise(F.lit(0).cast(_D)))
        .cast("long")
        .alias("n_nonpos"),
    )
    h = cells.where(F.col("__v") > 0)
    c, vv = F.col("__c"), F.col("__v").cast(_D)
    lnv = ln_micro(F.col("__v")).cast(_D)
    agg = h.groupBy(*group_cols).agg(
        F.sum(c).alias("__n"),
        F.sum(c * vv).alias("__s"),
        F.sum(c * lnv).alias("__sl"),
        F.sum(c * vv * lnv).alias("__svl"),
    )
    j = _nullsafe_join(tot, agg, group_cols)
    n, s = F.col("__n"), F.col("__s")
    zl = F.lit(0).cast("long")
    t_micro = F.greatest(
        F.expr("__svl div __s").cast("long") - ln_micro(s) + ln_micro(n), zl
    )
    l_micro = F.greatest(
        ln_micro(s) - ln_micro(n) - F.expr("__sl div __n").cast("long"), zl
    )
    j = j.withColumn("__t", F.when(n > 0, t_micro)).withColumn(
        "__l", F.when(n > 0, l_micro)
    )
    tm, lm = F.col("__t"), F.col("__l")
    return j.select(
        *group_cols,
        "n_rows",
        "n_nonpos",
        F.coalesce(n.cast("long"), F.lit(0)).alias("n"),
        s.cast("string").alias("sum_fp"),
        tm.alias("theil_t_micro"),
        (tm.cast("double") / F.lit(1000000.0)).alias("theil_t"),
        lm.alias("theil_l_micro"),
        (lm.cast("double") / F.lit(1000000.0)).alias("theil_l"),
    )


def grouped_theil_sql(table: str, group: str, value: str) -> str:
    """DuckDB twin of :func:`grouped_theil` (hugeint moments, same
    micro-nat quantization, `//` integral division, identical clamp
    and double shapes)."""
    lnm = "round(ln({x}) * 1000000)::BIGINT"
    return f"""
        WITH __th_b AS (
            SELECT {group} AS g, ({value})::BIGINT AS x
            FROM {table} WHERE ({value}) IS NOT NULL
        ),
        __th_c AS (
            -- one histogram over ALL values; totals + entropy branch
            -- both derive from it (the Spark ReusedExchange shape)
            SELECT g, x AS v, count(*)::HUGEINT AS c
            FROM __th_b GROUP BY g, x
        ),
        __th_tot AS (
            SELECT g, sum(c)::BIGINT AS n_rows,
                   sum(CASE WHEN v <= 0 THEN c ELSE 0::HUGEINT END)::BIGINT
                       AS n_nonpos
            FROM __th_c GROUP BY g
        ),
        __th_h AS (
            SELECT g, v, c FROM __th_c WHERE v > 0
        ),
        __th_a AS (
            SELECT g, sum(c) AS n, sum(c * v::HUGEINT) AS s,
                   sum(c * ({lnm.format(x='v')})::HUGEINT) AS sl,
                   sum(c * v::HUGEINT * ({lnm.format(x='v')})::HUGEINT) AS svl
            FROM __th_h GROUP BY g
        ),
        __th_m AS (
            SELECT g, n, s, sl, svl,
                   greatest((svl // s)::BIGINT - {lnm.format(x='s')}
                            + {lnm.format(x='n')}, 0::BIGINT) AS tm,
                   greatest({lnm.format(x='s')} - {lnm.format(x='n')}
                            - (sl // n)::BIGINT, 0::BIGINT) AS lm
            FROM __th_a
        )
        SELECT tot.g AS {group}, tot.n_rows, tot.n_nonpos,
               coalesce(m.n, 0)::BIGINT AS n,
               m.s::VARCHAR AS sum_fp,
               m.tm AS theil_t_micro,
               m.tm::DOUBLE / 1000000.0 AS theil_t,
               m.lm AS theil_l_micro,
               m.lm::DOUBLE / 1000000.0 AS theil_l
        FROM __th_tot tot
        LEFT JOIN __th_m m ON tot.g IS NOT DISTINCT FROM m.g
    """


def two_by_two_effects(
    df: DataFrame,
    group_cols: list[str],
    exposed_col,
    outcome_col,
) -> DataFrame:
    """(group…, n, a, b, c, d, risk_exposed, risk_unexposed,
    risk_diff, risk_ratio, odds_ratio, ln_or_micro, ln_or, se_ln_or,
    ci_lo, ci_hi) — exact per-group 2×2 effect measures: for an
    exposure flag and an outcome flag on INDEPENDENT subjects (did
    treatment-arm users purchase more; do docs from source X fail the
    quality filter more), the A/B-test effect kit.  Completes the
    2×2 corner: chi2_independence answers "is the association real",
    grouped_mcnemar handles the PAIRED design — this sizes the effect
    with the epidemiology standard measures and their Woolf
    confidence interval.

    With a/b/c/d = exposed∧outcome, exposed∧¬outcome, ¬exposed∧
    outcome, ¬exposed∧¬outcome (exact longs, one four-counter
    map-side-combined aggregate):

        risk_exposed   = a/(a+b)            risk_unexposed = c/(c+d)
        risk_diff      = a/(a+b) − c/(c+d)  (two correctly-rounded
                                             divisions, one subtract)
        risk_ratio     = a·(c+d) / (c·(a+b))   (ONE division of
                                                exact integers)
        odds_ratio     = a·d / (b·c)           (ONE division)
        ln_or_micro    = lnm(a·d) − lnm(b·c)   (micro-nat longs,
                                                quantized ONCE per
                                                product — swapping the
                                                outcome flag negates
                                                it EXACTLY, pinned)
        se_ln_or       = √( (Σ 10¹² div x) / 10¹² )  over x ∈
                         {a,b,c,d}           (Woolf; each reciprocal
                                              quantized ONCE to
                                              pico-units, exact sum,
                                              div→sqrt shape)
        ci_lo/ci_hi    = ln_or ∓ 1.959964·se_ln_or   (the 95% log-OR
                         interval; IEEE multiply + subtract of
                         engine-identical doubles — consumers exp()
                         at presentation, the survival-curve
                         convention, because exp is libm-divergent)

    — engine-identical, hash-oracle-able including every double.
    NULL policy: risk fields NULL when their denominator is 0;
    odds_ratio NULL when b·c = 0; ln/se/ci NULL unless ALL of
    a,b,c,d > 0 (no Haldane–Anscombe +½ smoothing — it would break
    integrality; documented, callers can pre-smooth).  Flags must be
    boolean or 0/1 integers (anything else raises in-plan); NULL in
    either drops the row.  OVERFLOW: a·d < 1e38 — unreachable before
    the long counts themselves overflow.

    Scale shape: ONE map-side-combined four-counter aggregate per
    group; nothing after it.
    """
    def _flag(col, name):
        c = F.col(col) if isinstance(col, str) else col
        dt = df.select(c.alias("__probe")).schema[0].dataType.simpleString()
        if dt == "boolean":
            return c.cast("long")
        return F.when(c.isin(0, 1), c.cast("long")).otherwise(
            F.raise_error(
                F.lit(f"two_by_two_effects: {name} must be 0/1 or boolean")
            )
        )

    er = F.col(exposed_col) if isinstance(exposed_col, str) else exposed_col
    orr = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    e = _flag(exposed_col, "exposed_col")
    o = _flag(outcome_col, "outcome_col")
    agg = (
        df.where(er.isNotNull() & orr.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(e * o).alias("a"),
            F.sum(e * (1 - o)).alias("b"),
            F.sum((1 - e) * o).alias("c"),
            F.sum((1 - e) * (1 - o)).alias("d"),
        )
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    ad = a.cast(_D) * d.cast(_D)
    bc = b.cast(_D) * c.cast(_D)
    lnm = _ln_micro
    rec = lambda x: F.expr(f"1000000000000 div {x}")  # noqa: E731
    all_pos = (a > 0) & (b > 0) & (c > 0) & (d > 0)
    lnor_m = F.when(all_pos, lnm(ad) - lnm(bc))
    se = F.when(
        all_pos,
        F.sqrt(
            (rec("a") + rec("b") + rec("c") + rec("d")).cast("double")
            / F.lit(1.0e12)
        ),
    )
    agg = (
        agg.withColumn("__lnm", lnor_m)
        .withColumn("__se", se)
        .withColumn("__lnor", F.col("__lnm").cast("double") / F.lit(1000000.0))
    )
    lnor, sec = F.col("__lnor"), F.col("__se")
    z = F.lit(1.959964)
    return agg.select(
        *group_cols,
        "n",
        "a",
        "b",
        "c",
        "d",
        F.when(a + b > 0, a.cast("double") / (a + b).cast("double")).alias(
            "risk_exposed"
        ),
        F.when(c + d > 0, c.cast("double") / (c + d).cast("double")).alias(
            "risk_unexposed"
        ),
        F.when(
            (a + b > 0) & (c + d > 0),
            a.cast("double") / (a + b).cast("double")
            - c.cast("double") / (c + d).cast("double"),
        ).alias("risk_diff"),
        F.when(
            c.cast(_D) * (a + b).cast(_D) > 0,
            (a.cast(_D) * (c + d).cast(_D)).cast("double")
            / (c.cast(_D) * (a + b).cast(_D)).cast("double"),
        ).alias("risk_ratio"),
        F.when(bc > 0, ad.cast("double") / bc.cast("double")).alias(
            "odds_ratio"
        ),
        F.col("__lnm").alias("ln_or_micro"),
        lnor.alias("ln_or"),
        sec.alias("se_ln_or"),
        (lnor - z * sec).alias("ci_lo"),
        (lnor + z * sec).alias("ci_hi"),
    )


def two_by_two_effects_sql(
    table: str, group: str, exposed: str, outcome: str
) -> str:
    """DuckDB twin of :func:`two_by_two_effects` (identical counter,
    quantize-once reciprocal/micro-nat, and double shapes)."""
    ei = f"(CASE WHEN ({exposed}) IN (0, 1) OR typeof({exposed}) = 'BOOLEAN' THEN ({exposed})::BIGINT ELSE CAST(error('two_by_two_effects: exposed must be 0/1 or boolean') AS BIGINT) END)"
    oi = f"(CASE WHEN ({outcome}) IN (0, 1) OR typeof({outcome}) = 'BOOLEAN' THEN ({outcome})::BIGINT ELSE CAST(error('two_by_two_effects: outcome must be 0/1 or boolean') AS BIGINT) END)"
    lnm = "round(ln({x}) * 1000000)::BIGINT"
    return f"""
        WITH __tbt AS (
            SELECT {group} AS g, count(*)::BIGINT AS n,
                   sum({ei} * {oi})::BIGINT AS a,
                   sum({ei} * (1 - {oi}))::BIGINT AS b,
                   sum((1 - {ei}) * {oi})::BIGINT AS c,
                   sum((1 - {ei}) * (1 - {oi}))::BIGINT AS d
            FROM {table}
            WHERE ({exposed}) IS NOT NULL AND ({outcome}) IS NOT NULL
            GROUP BY 1
        ),
        __tbt_m AS (
            SELECT g, n, a, b, c, d,
                   CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
                       {lnm.format(x='a::HUGEINT * d::HUGEINT')}
                       - {lnm.format(x='b::HUGEINT * c::HUGEINT')}
                   END AS lnm_or,
                   CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
                       sqrt((1000000000000 // a + 1000000000000 // b
                             + 1000000000000 // c + 1000000000000 // d)
                            ::DOUBLE / 1.0e12)
                   END AS se
            FROM __tbt
        )
        SELECT g AS {group}, n, a, b, c, d,
               CASE WHEN a + b > 0 THEN a::DOUBLE / (a + b)::DOUBLE
               END AS risk_exposed,
               CASE WHEN c + d > 0 THEN c::DOUBLE / (c + d)::DOUBLE
               END AS risk_unexposed,
               CASE WHEN a + b > 0 AND c + d > 0 THEN
                   a::DOUBLE / (a + b)::DOUBLE - c::DOUBLE / (c + d)::DOUBLE
               END AS risk_diff,
               CASE WHEN c::HUGEINT * (a + b)::HUGEINT > 0 THEN
                   CAST(a::HUGEINT * (c + d)::HUGEINT AS DOUBLE)
                   / CAST(c::HUGEINT * (a + b)::HUGEINT AS DOUBLE)
               END AS risk_ratio,
               CASE WHEN b::HUGEINT * c::HUGEINT > 0 THEN
                   CAST(a::HUGEINT * d::HUGEINT AS DOUBLE)
                   / CAST(b::HUGEINT * c::HUGEINT AS DOUBLE)
               END AS odds_ratio,
               lnm_or AS ln_or_micro,
               lnm_or::DOUBLE / 1000000.0 AS ln_or,
               se AS se_ln_or,
               lnm_or::DOUBLE / 1000000.0 - 1.959964 * se AS ci_lo,
               lnm_or::DOUBLE / 1000000.0 + 1.959964 * se AS ci_hi
        FROM __tbt_m
    """


def cochran_armitage(
    df: DataFrame,
    group_cols: list[str],
    dose_col,
    flag_col,
) -> DataFrame:
    """(group…, k, n, r, t_fp, z, chi2) — exact Cochran–Armitage
    trend test per group: across ORDERED exposure levels (dose,
    variant arm index, bucket of context length), does a binary
    outcome's proportion trend monotonically?  The ordered-
    alternative completion of the 2×k corner: chi2_independence asks
    "any association at all" and spends k−1 degrees of freedom;
    Cochran–Armitage spends ONE on the linear-in-dose alternative,
    which is the question dose-response and A/B/n-arm designs
    actually pose (Armitage 1955; Agresti, *Categorical Data
    Analysis* §5.3.5).  two_by_two_effects is its k = 2 special
    case (z² == the 2×2 score χ², pinned by test).

    Scores are the dose values themselves (the canonical choice;
    integral required — floats raise, quantize/bucket explicitly
    first, the fixed-point policy).  With per-dose cells (n_i rows,
    r_i successes), N = Σn_i, R = Σr_i and everything on
    decimal(38,0)/hugeint:

        T·N   = N·Σd_i·r_i − R·Σd_i·n_i          (exact integer)
        V·N³  = R·(N−R)·(N·Σd_i²·n_i − (Σd_i·n_i)²)   (exact integer)
        z     = (TN/N) / sqrt(VN3/N³)             (the kit's fixed
                                                   div→√→div shape —
                                                   every step IEEE
                                                   correctly rounded,
                                                   engine-identical)
        chi2  = z·z                                (~χ²₁ under H₀)

    z > 0 ⟺ the success proportion increases with dose.  z/chi2 are
    NULL when VN3 ≤ 0 (R = 0, R = N, or a single/constant dose —
    no trend is testable); the group keeps its row.  flag must be
    0/1 or boolean (else an in-plan raise, both engines); NULL dose
    or flag drops the row.  OVERFLOW: R(N−R)·N·Σd²n < 10³⁸ →
    N ≲ 10⁸ at |dose| ≤ 10³.

    Scale shape: ONE map-side-combined (group, dose) cell histogram
    — the only row-scale stage — then one cell-scale aggregate per
    group; no joins, no windows.
    """
    d = F.col(dose_col) if isinstance(dose_col, str) else dose_col
    dt = df.select(d.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"cochran_armitage: dose_col must be integral, got {dt};"
            " bucket/quantize explicitly first"
        )
    fr = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    fdt = df.select(fr.alias("__probe")).schema[0].dataType.simpleString()
    if fdt == "boolean":
        fl = fr.cast("long")
    else:
        fl = F.when(fr.isin(0, 1), fr.cast("long")).otherwise(
            F.raise_error(
                F.lit("cochran_armitage: flag_col must be 0/1 or boolean")
            )
        )
    cells = (
        df.where(d.isNotNull() & fr.isNotNull())
        .groupBy(*group_cols, d.cast("long").alias("__d"))
        .agg(
            F.count(F.lit(1)).cast(_D).alias("__n"),
            F.sum(fl).cast(_D).alias("__r"),
        )
    )
    dd = F.col("__d").cast(_D)
    agg = cells.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("__n").alias("__N"),
        F.sum("__r").alias("__R"),
        F.sum(dd * F.col("__n")).alias("__swn"),
        F.sum(dd * F.col("__r")).alias("__swr"),
        F.sum(dd * dd * F.col("__n")).alias("__swwn"),
    )
    n, r = F.col("__N"), F.col("__R")
    tn = n * F.col("__swr") - r * F.col("__swn")
    vn3 = r * (n - r) * (n * F.col("__swwn") - F.col("__swn") * F.col("__swn"))
    zexp = (tn.cast("double") / n.cast("double")) / F.sqrt(
        vn3.cast("double") / (n * n * n).cast("double")
    )
    zc = F.when(vn3 > 0, zexp)
    return agg.select(
        *group_cols,
        F.col("k").cast("long").alias("k"),
        n.cast("long").alias("n"),
        r.cast("long").alias("r"),
        tn.cast("string").alias("t_fp"),
        zc.alias("z"),
        (zc * zc).alias("chi2"),
    )


def cochran_armitage_sql(table: str, group: str, dose: str, flag: str) -> str:
    """DuckDB twin of :func:`cochran_armitage` (hugeint arithmetic,
    identical cell-histogram + single div→√→div shape)."""
    fi = (
        f"(CASE WHEN ({flag}) IN (0, 1) OR typeof({flag}) = 'BOOLEAN'"
        f" THEN ({flag})::BIGINT ELSE CAST(error("
        f"'cochran_armitage: flag must be 0/1 or boolean') AS BIGINT) END)"
    )
    return f"""
        WITH __ca_c AS (
            SELECT {group} AS g, CAST({dose} AS BIGINT) AS d,
                   count(*)::HUGEINT AS n, sum({fi})::HUGEINT AS r
            FROM {table}
            WHERE ({dose}) IS NOT NULL AND ({flag}) IS NOT NULL
            GROUP BY 1, 2
        ),
        __ca_a AS (
            SELECT g, count(*)::HUGEINT AS k, sum(n) AS nn, sum(r) AS rr,
                   sum(d::HUGEINT * n) AS swn, sum(d::HUGEINT * r) AS swr,
                   sum(d::HUGEINT * d::HUGEINT * n) AS swwn
            FROM __ca_c GROUP BY g
        )
        SELECT g AS {group}, CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
               CAST(rr AS BIGINT) AS r,
               (nn * swr - rr * swn)::VARCHAR AS t_fp,
               CASE WHEN rr * (nn - rr) * (nn * swwn - swn * swn) > 0 THEN
                   (CAST(nn * swr - rr * swn AS DOUBLE) / CAST(nn AS DOUBLE))
                   / sqrt(CAST(rr * (nn - rr) * (nn * swwn - swn * swn)
                               AS DOUBLE)
                          / CAST(nn * nn * nn AS DOUBLE))
               END AS z,
               CASE WHEN rr * (nn - rr) * (nn * swwn - swn * swn) > 0 THEN
                   ((CAST(nn * swr - rr * swn AS DOUBLE) / CAST(nn AS DOUBLE))
                    / sqrt(CAST(rr * (nn - rr) * (nn * swwn - swn * swn)
                                AS DOUBLE)
                           / CAST(nn * nn * nn AS DOUBLE)))
                   * ((CAST(nn * swr - rr * swn AS DOUBLE) / CAST(nn AS DOUBLE))
                      / sqrt(CAST(rr * (nn - rr) * (nn * swwn - swn * swn)
                                  AS DOUBLE)
                             / CAST(nn * nn * nn AS DOUBLE)))
               END AS chi2
        FROM __ca_a
    """


def jonckheere_terpstra(
    df: DataFrame,
    group_cols: list[str],
    dose_col,
    value_col,
) -> DataFrame:
    """(group…, k, n, jt2_fp, jt, z) — exact Jonckheere–Terpstra
    trend test per group: across ORDERED treatment levels, do VALUES
    shift monotonically?  The ordered-alternative companion to
    grouped_kruskal_wallis the way cochran_armitage is to
    chi2_independence — KW spends k−1 df on "any difference"; JT
    spends one on the ordered alternative θ₁ ≤ … ≤ θ_k (Jonckheere
    1954; Terpstra 1952; tie-corrected null variance per Hollander &
    Wolfe §6.2 — the SAS/StatXact formula).

    JT = Σ_{i<j} U_ij is the sum of pairwise Mann–Whitney counts
    between dose-ordered samples, i.e. exactly grouped_kendall's
    concordance on (dose, value) plus half the cross-dose value
    ties, so it rides the same VALUE-COMPRESSED cell self-join
    (cells (d, v, w); a pair with d_a < d_b contributes w_a·w_b to
    C/E/D by sign(v_b − v_a)) and inherits its COST CONTRACT: the
    join is O(cells²) per group — the design point is low-cardinality
    doses × low-cardinality-or-pre-quantized values (values COMPARE,
    never compute: doubles welcome, but quantize high-cardinality
    columns first).  All counts exact on decimal(38,0)/hugeint:

        JT2      = 2C + E                       (doubled JT, exact)
        4·(JT−μ) = 2·JT2 − (N² − Σn_i²)         (exact; μ is the null
                                                 mean (N²−Σn_i²)/4)
        Var·D    = A·N(N−1)(N−2) + 2B + 9·Cp·(N−2)
                   over D = 72·N(N−1)(N−2)      (the three-term tie-
                                                 corrected variance on
                                                 the common
                                                 denominator, exact:
          A  = N(N−1)(2N+5) − Σᵢnᵢ(nᵢ−1)(2nᵢ+5) − Σⱼtⱼ(tⱼ−1)(2tⱼ+5)
          B  = Σᵢnᵢ(nᵢ−1)(nᵢ−2) · Σⱼtⱼ(tⱼ−1)(tⱼ−2)
          Cp = Σᵢnᵢ(nᵢ−1) · Σⱼtⱼ(tⱼ−1),
          nᵢ = dose-sample sizes, tⱼ = pooled value-tie sizes)
        z        = (num4/4) / sqrt(VarD/D)      (num4/4 is an exact
                                                 binary halving twice;
                                                 then the fixed
                                                 div→√→div shape —
                                                 engine-identical)

    z > 0 ⟺ values increase with dose.  z is NULL when N < 3 or
    VarD ≤ 0 (degenerate: everything tied).  Dose must be integral
    (floats raise — bucket first); NULL/NaN in either column drops
    the row.  Groups with a single dose level report jt = 0 pairs
    and NULL z.  OVERFLOW: A·N(N−1)(N−2) ~ N⁶ and B ~ N⁶ < 10³⁸ →
    N ≲ 2·10⁶ per group.

    Scale shape: one map-side-combined (group, dose, value) cell
    histogram (the only row-scale stage), the cell-scale self-join
    on the group key, two cell-scale marginals, one group-sized
    null-safe join tree.
    """
    d = F.col(dose_col) if isinstance(dose_col, str) else dose_col
    dt = df.select(d.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"jonckheere_terpstra: dose_col must be integral, got {dt};"
            " bucket/quantize explicitly first"
        )
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    q = df.where(
        d.isNotNull() & v.isNotNull() & ~F.isnan(v.cast("double"))
    ).select(*group_cols, d.cast("long").alias("__d"), v.alias("__v"))
    cells = q.groupBy(*group_cols, "__d", "__v").agg(
        F.count(F.lit(1)).cast(_D).alias("__w")
    )
    a, b = cells.alias("a"), cells.alias("b")
    cond = F.col("a.__d") < F.col("b.__d")
    for c in group_cols:
        # eqNullSafe: NULL group keys keep their row with CORRECT
        # statistics (a null-unsafe == dropped their pair rows while
        # the marginals survived — jt reported 0 with a fabricated
        # negative z; review catch, pinned by test_null_group_key)
        cond = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) & cond
    ww = F.col("a.__w") * F.col("b.__w")
    zd = F.lit(0).cast(_D)
    pairs = a.join(b, cond).groupBy(
        *[F.col(f"a.{c}").alias(c) for c in group_cols]
    ).agg(
        F.sum(F.when(F.col("a.__v") < F.col("b.__v"), ww).otherwise(zd)).alias(
            "__C"
        ),
        F.sum(F.when(F.col("a.__v") == F.col("b.__v"), ww).otherwise(zd)).alias(
            "__E"
        ),
    )

    def _tie_terms(col: str, prefix: str):
        # marginals derive from the CELL histogram, not the raw rows:
        # all three consumers then share one identical row-scale
        # aggregate whose shuffle the planner emits once and reuses
        # (ReusedExchange) — one source pass instead of three
        m = cells.groupBy(*group_cols, col).agg(F.sum("__w").alias("__t"))
        t = F.col("__t")
        return m.groupBy(*group_cols).agg(
            F.sum(t).alias(f"{prefix}_n"),
            F.count(F.lit(1)).alias(f"{prefix}_k"),
            F.sum(t * t).alias(f"{prefix}_s2"),
            F.sum(t * (t - 1)).alias(f"{prefix}_p2"),
            F.sum(t * (t - 1) * (t - 2)).alias(f"{prefix}_p3"),
            F.sum(t * (t - 1) * (2 * t + 5)).alias(f"{prefix}_a"),
        )

    md = _tie_terms("__d", "__md")  # dose-sample sizes n_i
    mv = _tie_terms("__v", "__mv")  # pooled value-tie sizes t_j
    j = _nullsafe_join(_nullsafe_join(md, mv, group_cols), pairs, group_cols)
    n = F.col("__md_n")
    jt2 = F.lit(2).cast(_D) * F.coalesce(F.col("__C"), zd) + F.coalesce(
        F.col("__E"), zd
    )
    num4 = F.lit(2).cast(_D) * jt2 - (n * n - F.col("__md_s2"))
    aa = n * (n - 1) * (2 * n + 5) - F.col("__md_a") - F.col("__mv_a")
    bb = F.col("__md_p3") * F.col("__mv_p3")
    cp = F.col("__md_p2") * F.col("__mv_p2")
    vard = (
        aa * n * (n - 1) * (n - 2)
        + F.lit(2).cast(_D) * bb
        + F.lit(9).cast(_D) * cp * (n - 2)
    )
    dden = F.lit(72).cast(_D) * n * (n - 1) * (n - 2)
    zexp = (num4.cast("double") / F.lit(4.0)) / F.sqrt(
        vard.cast("double") / dden.cast("double")
    )
    return j.select(
        *group_cols,
        F.col("__md_k").cast("long").alias("k"),
        n.cast("long").alias("n"),
        jt2.cast("string").alias("jt2_fp"),
        (jt2.cast("double") / F.lit(2.0)).alias("jt"),
        F.when((n >= 3) & (vard > 0), zexp).alias("z"),
    )


def jonckheere_terpstra_sql(table: str, group: str, dose: str, value: str) -> str:
    """DuckDB twin of :func:`jonckheere_terpstra` (hugeint arithmetic,
    identical cell self-join, tie marginals and div→√→div shape)."""
    not_null = (
        f"({dose}) IS NOT NULL AND ({value}) IS NOT NULL"
        f" AND NOT isnan(CAST({value} AS DOUBLE))"
    )
    return f"""
        WITH __jt_q AS (
            SELECT {group} AS g, CAST({dose} AS BIGINT) AS d, {value} AS v
            FROM {table} WHERE {not_null}
        ),
        __jt_c AS (
            SELECT g, d, v, count(*)::HUGEINT AS w
            FROM __jt_q GROUP BY g, d, v
        ),
        __jt_p AS (
            SELECT a.g,
                   sum(CASE WHEN a.v < b.v THEN a.w * b.w
                       ELSE 0::HUGEINT END) AS c,
                   sum(CASE WHEN a.v = b.v THEN a.w * b.w
                       ELSE 0::HUGEINT END) AS e
            FROM __jt_c a JOIN __jt_c b
              ON a.g IS NOT DISTINCT FROM b.g AND a.d < b.d
            GROUP BY a.g
        ),
        __jt_md AS (
            -- marginals off the CELL histogram (the Spark side's
            -- ReusedExchange shape mirrored)
            SELECT g, sum(t) AS n, count(*)::HUGEINT AS k,
                   sum(t * t) AS s2, sum(t * (t - 1)) AS p2,
                   sum(t * (t - 1) * (t - 2)) AS p3,
                   sum(t * (t - 1) * (2 * t + 5)) AS a FROM (
                SELECT g, d, sum(w) AS t FROM __jt_c GROUP BY g, d
            ) GROUP BY g
        ),
        __jt_mv AS (
            SELECT g, sum(t * (t - 1)) AS p2,
                   sum(t * (t - 1) * (t - 2)) AS p3,
                   sum(t * (t - 1) * (2 * t + 5)) AS a FROM (
                SELECT g, v, sum(w) AS t FROM __jt_c GROUP BY g, v
            ) GROUP BY g
        ),
        __jt_j AS (
            SELECT md.g, md.n, md.k,
                   2 * coalesce(p.c, 0::HUGEINT)
                     + coalesce(p.e, 0::HUGEINT) AS jt2,
                   2 * (2 * coalesce(p.c, 0::HUGEINT)
                        + coalesce(p.e, 0::HUGEINT))
                     - (md.n * md.n - md.s2) AS num4,
                   (md.n * (md.n - 1) * (2 * md.n + 5) - md.a - mv.a)
                     * md.n * (md.n - 1) * (md.n - 2)
                     + 2 * md.p3 * mv.p3
                     + 9 * md.p2 * mv.p2 * (md.n - 2) AS vard,
                   72 * md.n * (md.n - 1) * (md.n - 2) AS dden
            FROM __jt_md md
            JOIN __jt_mv mv ON md.g IS NOT DISTINCT FROM mv.g
            LEFT JOIN __jt_p p ON md.g IS NOT DISTINCT FROM p.g
        )
        SELECT g AS {group}, CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
               jt2::VARCHAR AS jt2_fp, jt2::DOUBLE / 2.0 AS jt,
               CASE WHEN n >= 3 AND vard > 0 THEN
                   (CAST(num4 AS DOUBLE) / 4.0)
                   / sqrt(CAST(vard AS DOUBLE) / CAST(dden AS DOUBLE))
               END AS z
        FROM __jt_j
    """


def page_trend(
    df: DataFrame,
    group_cols: list[str],
    subject_col,
    treat_col,
    value_col,
) -> DataFrame:
    """(group…, n_blocks, n_excluded, n_used, k, l2_fp, l, z) — exact
    Page trend test per group: the ordered-alternative member of the
    BLOCKED design row, completing the trend column the way friedman
    completed the omnibus one — Friedman spends k−1 df on "any
    treatment difference within blocks"; Page's L = Σ_j w_j·R_j
    (w_j = the hypothesized order 1..k, taken as the NATURAL sort
    order of the treatment values) spends one df on the monotone
    alternative (Page 1963), exactly as jonckheere_terpstra does for
    the independent-sample row and cochran_armitage for the binary
    one.

    Rides friedman's doubled-midrank machinery (2·cum − ct + 1 exact
    integers off two block-local windows; complete blocks only,
    duplicates canonicalize to max).  The null variance handles
    midrank ties EXACTLY via the per-block permutation identity —
    for a random pairing of fixed scores w and fixed midranks r:
    Var(Σ w_π r) = Σ(w−w̄)²·Σ(r−r̄)²/(k−1), and Σ(w−w̄)² = k(k²−1)/12
    cancels its (k−1) — so with L2/R2 the doubled quantities and
    SS = Σ_entries R2² − n·k·(k+1)² (each block's Σ_j r2_bj = k(k+1)
    makes the centering term a constant):

        num2      = 2·L2 − n·k·(k+1)²        (exact integer,
                                              = 4·(L − E[L]))
        Var(L2)   = k·(k+1)·SS / 12          (exact integer over 12;
                                              reduces to the textbook
                                              n·k²(k+1)²(k−1)/36 when
                                              no block has ties —
                                              pinned by golden test)
        z         = (num2/2) / sqrt(k(k+1)·SS / 12.0)
                                             (exact binary halving,
                                              then the fixed
                                              div→√→div shape —
                                              engine-identical)

    z > 0 ⟺ values increase along the treatment order.  z is NULL
    when k < 2, n = 0, or SS = 0 (every block fully tied).  Ties,
    exclusion, canonicalization and NULL semantics are friedman's
    verbatim.  OVERFLOW: L2 ≲ 2k²·n·k = 2k³n and SS ≲ 4k³n on
    decimal(38,0) — never the binding constraint.

    Scale shape: friedman's — the canonicalized panel is the
    row-scale stage, ranks two block-local windows over one
    (group, subject) exchange; the weight assignment is a
    dense_rank window over the CELL-scale per-treatment frame
    (n_groups·k rows), then one group-sized null-safe join.
    """
    from pyspark.sql import Window

    s = F.col(subject_col) if isinstance(subject_col, str) else subject_col
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    panel = (
        df.where(
            s.isNotNull()
            & t.isNotNull()
            & v.isNotNull()
            & ~F.isnan(v.cast("double"))
        )
        .groupBy(*group_cols, s.alias("__s"), t.alias("__t"))
        .agg(F.max(v).alias("__v"))
    )
    wg = Window.partitionBy(*group_cols)
    ws = Window.partitionBy(*group_cols, "__s")
    wsv = Window.partitionBy(*group_cols, "__s", "__v")
    wcum = ws.orderBy("__v").rangeBetween(Window.unboundedPreceding, 0)
    w = (
        panel.withColumn("__k", F.size(F.collect_set("__t").over(wg)))
        .withColumn("__m", F.count(F.lit(1)).over(ws))
        .withColumn("__ct", F.count(F.lit(1)).over(wsv))
        .withColumn("__cum", F.count(F.lit(1)).over(wcum))
    )
    tot = panel.groupBy(*group_cols).agg(
        F.countDistinct("__s").alias("n_blocks")
    )
    complete = w.where(F.col("__m") == F.col("__k"))
    r2 = (F.lit(2) * F.col("__cum") - F.col("__ct") + 1).cast(_D)
    per_t = complete.groupBy(*group_cols, "__t").agg(
        F.sum(r2).alias("__r2j"),
        F.sum(r2 * r2).alias("__q2j"),
        F.count(F.lit(1)).alias("__nb"),
        F.max("__k").alias("__k"),
    )
    wj = F.dense_rank().over(wg.orderBy("__t")).cast(_D)
    pg = per_t.withColumn("__wj", wj)
    ga = pg.groupBy(*group_cols).agg(
        F.max("__nb").alias("n_used"),
        F.max("__k").alias("k"),
        F.sum(F.col("__wj") * F.col("__r2j")).alias("__l2"),
        F.sum("__q2j").alias("__q2"),
    )
    j = _nullsafe_join(tot, ga, group_cols)
    n = F.col("n_used").cast(_D)
    k = F.col("k").cast(_D)
    l2 = F.col("__l2")
    ss = F.col("__q2") - n * k * (k + 1) * (k + 1)
    num2 = F.lit(2).cast(_D) * l2 - n * k * (k + 1) * (k + 1)
    var12 = k * (k + 1) * ss
    zexp = (num2.cast("double") / F.lit(2.0)) / F.sqrt(
        var12.cast("double") / F.lit(12.0)
    )
    ok = (F.col("k") >= 2) & (F.col("n_used") > 0)
    nu = F.coalesce(F.col("n_used"), F.lit(0)).cast("long")
    return j.select(
        *group_cols,
        "n_blocks",
        (F.col("n_blocks") - nu).alias("n_excluded"),
        nu.alias("n_used"),
        F.coalesce(F.col("k"), F.lit(0)).cast("long").alias("k"),
        l2.cast("string").alias("l2_fp"),
        F.when(ok, l2.cast("double") / F.lit(2.0)).alias("l"),
        F.when(ok & (ss > 0), zexp).alias("z"),
    )


def page_trend_sql(
    table: str, group: str, subject: str, treat: str, value: str
) -> str:
    """DuckDB twin of :func:`page_trend` (identical doubled-midrank
    windows, dense_rank weights, and num2/√(var12/12) shape)."""
    not_null = (
        f"({subject}) IS NOT NULL AND ({treat}) IS NOT NULL AND"
        f" ({value}) IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE))"
    )
    return f"""
        WITH __pg_p AS (
            SELECT {group} AS g, {subject} AS s, {treat} AS t,
                   max({value}) AS v
            FROM {table} WHERE {not_null}
            GROUP BY 1, 2, 3
        ),
        __pg_w AS (
            SELECT g, s, t, v,
                   count(DISTINCT t) OVER (PARTITION BY g) AS k,
                   count(*) OVER (PARTITION BY g, s) AS m,
                   count(*) OVER (PARTITION BY g, s, v) AS ct,
                   count(*) OVER (PARTITION BY g, s ORDER BY v
                                  RANGE BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
            FROM __pg_p
        ),
        __pg_t AS (
            SELECT g, t,
                   sum((2 * cum - ct + 1)::HUGEINT) AS r2j,
                   sum((2 * cum - ct + 1)::HUGEINT
                       * (2 * cum - ct + 1)::HUGEINT) AS q2j,
                   count(*)::HUGEINT AS nb, max(k)::HUGEINT AS k
            FROM __pg_w WHERE m = k GROUP BY g, t
        ),
        __pg_r AS (
            -- weight materialized as a column first: a window inside
            -- an aggregate is illegal (the friedman tie-term lesson)
            SELECT g, t, r2j, q2j, nb, k,
                   dense_rank() OVER (PARTITION BY g ORDER BY t)
                       ::HUGEINT AS wj
            FROM __pg_t
        ),
        __pg_g AS (
            SELECT g, max(nb) AS n, max(k) AS k,
                   sum(wj * r2j) AS l2, sum(q2j) AS q2
            FROM __pg_r GROUP BY g
        ),
        __pg_b AS (
            SELECT g, count(DISTINCT s) AS n_blocks FROM __pg_p GROUP BY g
        )
        SELECT b.g AS {group}, b.n_blocks,
               (b.n_blocks - coalesce(a.n, 0))::BIGINT AS n_excluded,
               coalesce(a.n, 0)::BIGINT AS n_used,
               coalesce(a.k, 0)::BIGINT AS k,
               a.l2::VARCHAR AS l2_fp,
               CASE WHEN a.k >= 2 AND a.n > 0 THEN a.l2::DOUBLE / 2.0
               END AS l,
               CASE WHEN a.k >= 2 AND a.n > 0
                         AND a.q2 - a.n * a.k * (a.k + 1) * (a.k + 1) > 0
               THEN
                   (CAST(2 * a.l2 - a.n * a.k * (a.k + 1) * (a.k + 1)
                         AS DOUBLE) / 2.0)
                   / sqrt(CAST(a.k * (a.k + 1)
                               * (a.q2 - a.n * a.k * (a.k + 1) * (a.k + 1))
                               AS DOUBLE) / 12.0)
               END AS z
        FROM __pg_b b
        LEFT JOIN __pg_g a ON b.g IS NOT DISTINCT FROM a.g
    """


def mantel_haenszel(
    df: DataFrame,
    group_cols: list[str],
    stratum_col,
    exposed_col,
    outcome_col,
) -> DataFrame:
    """(group…, n_strata, n, o_a, e_micro, v_micro, or_mh, chi2, z) —
    exact Cochran–Mantel–Haenszel stratified 2×2 analysis per group:
    the confounding-adjusted bridge between :func:`two_by_two_effects`
    (ONE stratum: is exposure associated with outcome, and how big)
    and :func:`logrank_test` (the same hypergeometric conditioning
    stratified by TIME).  Crude 2×2 effects reverse under aggregation
    whenever a confounder is associated with both flags (Simpson's
    paradox — pinned by test with a planted paradox); CMH conditions
    on each stratum's margins, testing the WITHIN-stratum association
    (Mantel & Haenszel 1959; Agresti §6.3).

    Per stratum (a/b/c/d exposed·outcome counters, n1 = a+b,
    n0 = c+d, m1 = a+c, m0 = b+d, N = n1+n0), riding logrank's
    quantize-once micro-unit machinery verbatim:

        O_a     = Σ a                          (exact long)
        E_micro = Σ (n1·m1·10⁶) div N          (hypergeometric mean,
                                                quantized ONCE,
                                                nonneg operands)
        V_micro = Σ (n1·n0·m1·m0·10⁶)
                    div (N·N·(N−1))            (hypergeometric
                                                variance; the N = 1
                                                term is 0 by
                                                n1·n0 = 0 and guarded
                                                BEFORE the division —
                                                DuckDB evaluates
                                                eagerly)
        chi2    = (O_a·10⁶ − E_micro)² / (V_micro·10⁶)
        z       = sign(O_a·10⁶ − E_micro)·√chi2  (z > 0 ⟺ exposed
                                                see MORE outcomes
                                                than their margins
                                                predict)
        or_mh   = Σ((a·d·10⁶) div N) / Σ((b·c·10⁶) div N)
                                               (the Mantel–Haenszel
                                                pooled odds ratio —
                                                ONE division of exact
                                                integers; NULL when
                                                the denominator sum
                                                is 0)

    — engine-identical, hash-oracle-able including all three
    doubles.  No continuity correction (the logrank/MWU convention,
    documented).  A single-stratum group reduces to the 2×2 score
    test: chi2 == Pearson·(N−1)/N and or_mh ≈ two_by_two_effects'
    odds_ratio within quantization (both pinned).  exposed/outcome
    must be 0/1 or boolean (in-plan raise, both engines); NULL
    stratum/flag drops the row; chi2/z NULL when ΣV = 0 (every
    stratum degenerate), the row kept.  OVERFLOW: the V numerator is
    ≤ N⁴·10⁶ per stratum → stratum size ≲ 9·10⁷ on
    decimal(38,0)/hugeint.

    Scale shape: ONE map-side-combined (group, stratum) four-counter
    cell histogram is the only row-scale stage; the quantized terms
    and the test are one cell-scale aggregate; no joins, no windows.
    """
    st = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col

    def _flag(col, name):
        c = F.col(col) if isinstance(col, str) else col
        dt = df.select(c.alias("__probe")).schema[0].dataType.simpleString()
        if dt == "boolean":
            return c.cast("long")
        return F.when(c.isin(0, 1), c.cast("long")).otherwise(
            F.raise_error(
                F.lit(f"mantel_haenszel: {name} must be 0/1 or boolean")
            )
        )

    er = F.col(exposed_col) if isinstance(exposed_col, str) else exposed_col
    orr = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    e = _flag(exposed_col, "exposed")
    o = _flag(outcome_col, "outcome")
    cells = (
        df.where(st.isNotNull() & er.isNotNull() & orr.isNotNull())
        .groupBy(*group_cols, st.alias("__st"))
        .agg(
            F.sum(e * o).alias("a"),
            F.sum(e * (1 - o)).alias("b"),
            F.sum((1 - e) * o).alias("c"),
            F.sum((1 - e) * (1 - o)).alias("d"),
        )
    )
    a, b, c, d = (F.col(x).cast(_D) for x in "abcd")
    n1, n0, m1, m0 = a + b, c + d, a + c, b + d
    n = n1 + n0
    mi = F.lit(1_000_000).cast(_D)
    cells = (
        cells.withColumn("__e_num", n1 * m1 * mi)
        .withColumn("__e_den", n)
        .withColumn("__v_num", n1 * n0 * m1 * m0 * mi)
        .withColumn("__v_den", n * n * (n - 1))
        .withColumn("__r_num", a * d * mi)
        .withColumn("__s_num", b * c * mi)
    )
    zd = F.lit(0).cast(_D)
    agg = cells.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("__n"),
        F.sum("a").alias("__oa"),
        F.sum(F.expr("__e_num div __e_den")).alias("__em"),
        F.sum(
            F.when(
                F.col("__v_den") > 0, F.expr("__v_num div __v_den")
            ).otherwise(zd)
        ).alias("__vm"),
        F.sum(F.expr("__r_num div __e_den")).alias("__rm"),
        F.sum(F.expr("__s_num div __e_den")).alias("__sm"),
    )
    oa, em, vm = F.col("__oa").cast(_D), F.col("__em"), F.col("__vm")
    num = oa * mi - em
    chi = (num * num).cast("double") / (vm * mi).cast("double")
    sgn = F.when(num < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return agg.select(
        *group_cols,
        F.col("n_strata").cast("long").alias("n_strata"),
        F.col("__n").cast("long").alias("n"),
        oa.cast("long").alias("o_a"),
        F.col("__em").cast("string").alias("e_micro"),
        F.col("__vm").cast("string").alias("v_micro"),
        F.when(
            F.col("__sm") > 0,
            F.col("__rm").cast("double") / F.col("__sm").cast("double"),
        ).alias("or_mh"),
        F.when(vm > 0, chi).alias("chi2"),
        F.when(vm > 0, sgn * F.sqrt(chi)).alias("z"),
    )


def mantel_haenszel_sql(
    table: str, group: str, stratum: str, exposed: str, outcome: str
) -> str:
    """DuckDB twin of :func:`mantel_haenszel` (hugeint arithmetic,
    identical quantize-once terms, N = 1 guard before the eager
    division, and single-division shapes)."""
    ei = (
        f"(CASE WHEN ({exposed}) IN (0, 1) OR typeof({exposed}) = 'BOOLEAN'"
        f" THEN ({exposed})::BIGINT ELSE CAST(error("
        f"'mantel_haenszel: exposed must be 0/1 or boolean') AS BIGINT) END)"
    )
    oi = (
        f"(CASE WHEN ({outcome}) IN (0, 1) OR typeof({outcome}) = 'BOOLEAN'"
        f" THEN ({outcome})::BIGINT ELSE CAST(error("
        f"'mantel_haenszel: outcome must be 0/1 or boolean') AS BIGINT) END)"
    )
    return f"""
        WITH __mh_c AS (
            SELECT {group} AS g, {stratum} AS st,
                   sum({ei} * {oi})::HUGEINT AS a,
                   sum({ei} * (1 - {oi}))::HUGEINT AS b,
                   sum((1 - {ei}) * {oi})::HUGEINT AS c,
                   sum((1 - {ei}) * (1 - {oi}))::HUGEINT AS d
            FROM {table}
            WHERE ({stratum}) IS NOT NULL AND ({exposed}) IS NOT NULL
              AND ({outcome}) IS NOT NULL
            GROUP BY 1, 2
        ),
        __mh_t AS (
            SELECT g, a, b, c, d, a + b + c + d AS n,
                   ((a + b) * (a + c) * 1000000::HUGEINT)
                     // (a + b + c + d) AS em,
                   CASE WHEN a + b + c + d > 1 THEN
                       ((a + b) * (c + d) * (a + c) * (b + d)
                        * 1000000::HUGEINT)
                       // ((a + b + c + d) * (a + b + c + d)
                           * (a + b + c + d - 1))
                   ELSE 0::HUGEINT END AS vm,
                   (a * d * 1000000::HUGEINT) // (a + b + c + d) AS rm,
                   (b * c * 1000000::HUGEINT) // (a + b + c + d) AS sm
            FROM __mh_c
        ),
        __mh_a AS (
            SELECT g, count(*)::BIGINT AS n_strata, sum(n) AS nn,
                   sum(a) AS oa, sum(em) AS em, sum(vm) AS vm,
                   sum(rm) AS rm, sum(sm) AS sm
            FROM __mh_t GROUP BY g
        )
        SELECT g AS {group}, n_strata, CAST(nn AS BIGINT) AS n,
               CAST(oa AS BIGINT) AS o_a,
               em::VARCHAR AS e_micro, vm::VARCHAR AS v_micro,
               CASE WHEN sm > 0 THEN rm::DOUBLE / sm::DOUBLE END AS or_mh,
               CASE WHEN vm > 0 THEN
                   CAST((oa * 1000000::HUGEINT - em)
                        * (oa * 1000000::HUGEINT - em) AS DOUBLE)
                   / CAST(vm * 1000000::HUGEINT AS DOUBLE)
               END AS chi2,
               CASE WHEN vm > 0 THEN
                   (CASE WHEN oa * 1000000::HUGEINT - em < 0
                         THEN -1.0 ELSE 1.0 END)
                   * sqrt(CAST((oa * 1000000::HUGEINT - em)
                               * (oa * 1000000::HUGEINT - em) AS DOUBLE)
                          / CAST(vm * 1000000::HUGEINT AS DOUBLE))
               END AS z
        FROM __mh_a
    """


def cochran_armitage_stratified(
    df: DataFrame,
    group_cols: list[str],
    stratum_col,
    dose_col,
    flag_col,
) -> DataFrame:
    """(group…, n_strata, k, n, r, t_micro, v_micro, z, chi2) — exact
    STRATIFIED Cochran–Armitage trend test per group (the CMH
    correlation/trend statistic with integer dose scores): does the
    binary outcome trend with dose WITHIN strata, pooled across them
    — completing the stratified triple exactly as the unadjusted
    operators pair off (2×2 effects → mantel_haenszel; log-rank →
    its stratum_col; cochran_armitage → this).  A confounder that
    tracks both the dose mix and the baseline rate makes the pooled
    trend lie (trend-Simpson, pinned with an exact construction);
    conditioning each stratum's contribution on its own margins
    removes it (Mantel 1963; Agresti §6.3.2 — SAS PROC FREQ's CMH
    'correlation' statistic with table scores).

    Per stratum s (on cochran_armitage's exact integers TN_s =
    N·Σd·r − R·Σd·n and the score-variance kernel), riding the
    mantel_haenszel quantize-once micro-unit machinery:

        t_micro_s = (TN_s·10⁶) div N_s
                                      (quantized ONCE per stratum;
                                       TN_s may be negative — BOTH
                                       engines truncate integer
                                       division toward zero
                                       (verified -7 div 2 == -3 in
                                       each), so the signed
                                       numerator divides identically;
                                       only Python's // floors, which
                                       the brute tests emulate)
        v_micro_s = (R·(N−R)·(N·Σd²n − (Σdn)²)·10⁶)
                      div (N²·(N−1))  (the exact hypergeometric
                                       Var(Σd·r | margins) =
                                       VN3/(N²(N−1)); nonneg
                                       operands; the N = 1
                                       term is 0 by R(N−R) = 0 and
                                       guarded before DuckDB's eager
                                       division)
        z         = Σt_micro / sqrt(Σv_micro·10⁶)
        chi2      = z·z               (~χ²₁; the (N−1)/N CMH factor
                                       is carried inside v_micro —
                                       a single stratum reduces to
                                       the plain CA χ²·(N−1)/N,
                                       pinned approx)

    z > 0 ⟺ within strata the success proportion increases with
    dose.  z/chi2 NULL when Σv_micro = 0 (every stratum degenerate);
    the group keeps its row.  Dose must be integral (floats raise);
    flag 0/1 or boolean (in-plan raise both engines); NULL
    stratum/dose/flag drops the row.  OVERFLOW: per-stratum
    R(N−R)·N·Σd²n·10⁶ < 10³⁸ → stratum size ≲ 10⁷ at |dose| ≤ 10³.

    Scale shape: ONE map-side-combined (group, stratum, dose) cell
    histogram — the only row-scale stage — then a cell-scale
    per-stratum aggregate and a group-sized final aggregate; no
    joins, no windows.  10⁶ strata cost the same shuffle as 4.
    """
    st = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    d = F.col(dose_col) if isinstance(dose_col, str) else dose_col
    dt = df.select(d.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"cochran_armitage_stratified: dose_col must be integral,"
            f" got {dt}; bucket/quantize explicitly first"
        )
    fr = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    fdt = df.select(fr.alias("__probe")).schema[0].dataType.simpleString()
    if fdt == "boolean":
        fl = fr.cast("long")
    else:
        fl = F.when(fr.isin(0, 1), fr.cast("long")).otherwise(
            F.raise_error(
                F.lit(
                    "cochran_armitage_stratified: flag_col must be 0/1"
                    " or boolean"
                )
            )
        )
    cells = (
        df.where(st.isNotNull() & d.isNotNull() & fr.isNotNull())
        .groupBy(*group_cols, st.alias("__st"), d.cast("long").alias("__d"))
        .agg(
            F.count(F.lit(1)).cast(_D).alias("__n"),
            F.sum(fl).cast(_D).alias("__r"),
        )
    )
    dd = F.col("__d").cast(_D)
    per_s = cells.groupBy(*group_cols, "__st").agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__n").alias("__N"),
        F.sum("__r").alias("__R"),
        F.sum(dd * F.col("__n")).alias("__swn"),
        F.sum(dd * F.col("__r")).alias("__swr"),
        F.sum(dd * dd * F.col("__n")).alias("__swwn"),
    )
    n, r = F.col("__N"), F.col("__R")
    tn = n * F.col("__swr") - r * F.col("__swn")
    vn = r * (n - r) * (n * F.col("__swwn") - F.col("__swn") * F.col("__swn"))
    mi = F.lit(1_000_000).cast(_D)
    zd = F.lit(0).cast(_D)
    per_s = (
        per_s.withColumn("__tnum", tn * mi)
        .withColumn("__vnum", vn * mi)
        .withColumn("__vden", n * n * (n - 1))
    )
    # BOTH engines truncate integer division toward zero on negatives
    # (verified: -7 div 2 == -3 in Spark AND -7 // 2 == -3 in DuckDB),
    # so the signed numerator divides identically with no sign
    # extraction needed — only Python's // floors, which the brute
    # tests emulate with sign·(|x|//d)
    t_micro = F.expr("__tnum div __N")
    v_micro = F.when(
        F.col("__vden") > 0, F.expr("__vnum div __vden")
    ).otherwise(zd)
    ga = per_s.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.max("__k").alias("k"),
        F.sum("__N").alias("__n_tot"),
        F.sum("__R").alias("__r_tot"),
        F.sum(t_micro).alias("__tm"),
        F.sum(v_micro).alias("__vm"),
    )
    tm, vm = F.col("__tm"), F.col("__vm")
    zc = F.when(
        vm > 0, tm.cast("double") / F.sqrt((vm * mi).cast("double"))
    )
    return ga.select(
        *group_cols,
        F.col("n_strata").cast("long").alias("n_strata"),
        F.col("k").cast("long").alias("k"),
        F.col("__n_tot").cast("long").alias("n"),
        F.col("__r_tot").cast("long").alias("r"),
        tm.cast("string").alias("t_micro"),
        vm.cast("string").alias("v_micro"),
        zc.alias("z"),
        (zc * zc).alias("chi2"),
    )


def cochran_armitage_stratified_sql(
    table: str, group: str, stratum: str, dose: str, flag: str
) -> str:
    """DuckDB twin of :func:`cochran_armitage_stratified` (hugeint
    arithmetic, identical per-stratum quantize-once terms — both
    engines truncate integer division toward zero so signed
    numerators divide identically, N = 1 guard before the eager
    division, single div→√ shape)."""
    fi = (
        f"(CASE WHEN ({flag}) IN (0, 1) OR typeof({flag}) = 'BOOLEAN'"
        f" THEN ({flag})::BIGINT ELSE CAST(error("
        f"'cochran_armitage_stratified: flag must be 0/1 or boolean')"
        f" AS BIGINT) END)"
    )
    return f"""
        WITH __cas_c AS (
            SELECT {group} AS g, ({stratum}) AS st,
                   CAST({dose} AS BIGINT) AS d,
                   count(*)::HUGEINT AS n, sum({fi})::HUGEINT AS r
            FROM {table}
            WHERE ({stratum}) IS NOT NULL AND ({dose}) IS NOT NULL
              AND ({flag}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        __cas_s AS (
            SELECT g, st, count(*)::HUGEINT AS k, sum(n) AS nn, sum(r) AS rr,
                   sum(d::HUGEINT * n) AS swn, sum(d::HUGEINT * r) AS swr,
                   sum(d::HUGEINT * d::HUGEINT * n) AS swwn
            FROM __cas_c GROUP BY g, st
        ),
        __cas_t AS (
            SELECT g, st, k, nn, rr,
                   ((nn * swr - rr * swn) * 1000000::HUGEINT) // nn AS tm,
                   CASE WHEN nn > 1 THEN
                       (rr * (nn - rr) * (nn * swwn - swn * swn)
                        * 1000000::HUGEINT)
                       // (nn * nn * (nn - 1))
                   ELSE 0::HUGEINT END AS vm
            FROM __cas_s
        ),
        __cas_a AS (
            SELECT g, count(*)::BIGINT AS n_strata, max(k) AS k,
                   sum(nn) AS n, sum(rr) AS r,
                   sum(tm) AS tm, sum(vm) AS vm
            FROM __cas_t GROUP BY g
        )
        SELECT g AS {group}, n_strata, CAST(k AS BIGINT) AS k,
               CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
               tm::VARCHAR AS t_micro, vm::VARCHAR AS v_micro,
               CASE WHEN vm > 0 THEN
                   CAST(tm AS DOUBLE)
                   / sqrt(CAST(vm * 1000000::HUGEINT AS DOUBLE))
               END AS z,
               CASE WHEN vm > 0 THEN
                   (CAST(tm AS DOUBLE)
                    / sqrt(CAST(vm * 1000000::HUGEINT AS DOUBLE)))
                   * (CAST(tm AS DOUBLE)
                      / sqrt(CAST(vm * 1000000::HUGEINT AS DOUBLE)))
               END AS chi2
        FROM __cas_a
    """


def mannwhitney_stratified(
    df: DataFrame,
    group_cols: list[str],
    stratum_col,
    value_col,
    cohort_col,
) -> DataFrame:
    """(group…, n_strata, n1, n2, t_micro, v_micro, z, chi2) — exact
    van Elteren test per group (Van Elteren 1960; the design-free
    weights): the STRATIFIED Mann–Whitney rank-sum, completing the
    stratified family's ranks column (binary effect →
    mantel_haenszel, ordered trend → cochran_armitage_stratified,
    time-to-event → logrank_test(stratum_col=…), ranks → this).
    Cohort-vs-stratum confounding makes the pooled MWU lie exactly
    as Simpson's paradox does elsewhere; van Elteren ranks WITHIN
    each stratum and pools the centered statistics with weight
    1/(N_s + 1).

    Per stratum s, riding grouped_mannwhitney's exact two-cohort
    histogram integers (U₂ = 2·gt + ties, the doubled U) and the
    quantize-once micro-unit machinery (signed numerators divide
    identically — both engines truncate toward zero):

        t_micro_s = ((U₂−n1·n2)·10⁶) div (2(N_s+1))
                                     (U₂ − n1·n2 = 2(U − μ) exact,
                                      possibly negative — BOTH
                                      engines truncate integer
                                      division toward zero, verified,
                                      so no sign handling is needed;
                                      only Python's // floors, which
                                      the brute tests emulate)
        v_micro_s = (n1·n2·(N³−N−T)·10⁶)
                      div (3N(N−1)·4(N+1)²)
                                     (Var(U₂)/(4(N+1)²) — the MWU
                                      tie-corrected variance under
                                      the same weight; nonneg
                                      operands, the N < 2 term
                                      guarded)
        z         = Σt_micro / sqrt(Σv_micro·10⁶)
        chi2      = z·z

    z > 0 ⟺ within strata, cohort-1 (the TRUE side of cohort_col)
    values exceed cohort-2's.  A single stratum reduces to plain
    grouped_mannwhitney's z (the weight cancels; approx — the
    quantization shapes differ, pinned ~1e-4).  The planted
    rank-Simpson law is EXACT: within-stratum proportional-copy
    cohorts give U₂ = n1·n2 identically (2G + T = p² on the shared
    pattern), so t_micro = 0 and z = 0.0 while the pooled MWU
    reports a large spurious z.  Strata where either cohort is
    empty contribute 0 to both sums (no information, not a bias);
    z/chi2 NULL when Σv = 0.  NULL stratum/value/cohort and NaN
    drop the row.  OVERFLOW: per-stratum n1·n2·N³·10⁶ < 10³⁸ →
    stratum size ≲ 2·10⁶.

    Scale shape: ONE map-side-combined (group, stratum, value)
    two-cohort histogram — the only row-scale stage — then a
    per-(group, stratum) cumulative window over compressed values,
    a cell-scale per-stratum aggregate and a group-sized final
    aggregate; no joins.
    """
    from pyspark.sql import Window

    st = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    coh = F.col(cohort_col) if isinstance(cohort_col, str) else cohort_col
    cdt = df.select(coh.alias("__probe")).schema[0].dataType.simpleString()
    if cdt != "boolean":
        # the stratified-family convention (cochran_armitage_stratified,
        # mantel_haenszel): a {1,2}-coded arm index would silently give
        # negative c2 counts and a plausible-but-wrong z — raise in-plan
        coh = (
            F.when(coh.isNull(), coh)  # NULL still DROPS the row —
            # the raise must not fire on rows the histogram filters
            .when(coh.isin(0, 1), coh)
            .otherwise(
                F.raise_error(
                    F.lit(
                        "mannwhitney_stratified: cohort_col must be 0/1"
                        " or boolean"
                    )
                )
            )
        )
    q = df.where(st.isNotNull()).select(
        *group_cols, st.alias("__st"), v.alias("__v"), coh.alias("__c")
    )
    # the shared two-cohort histogram with the stratum riding the
    # group keys — single source with grouped_mannwhitney/KS/Cliff's,
    # so the pinned single-stratum reduction law cannot silently drift
    h = _two_cohort_hist(q, [*group_cols, "__st"], "__v", "__c")
    ws = Window.partitionBy(*group_cols, "__st")
    wcum = ws.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    c = (
        h.withColumn("__fb2", F.coalesce(F.sum("__c2").over(wcum), F.lit(0).cast(_D)))
        .withColumn("__n1", F.sum("__c1").over(ws))
        .withColumn("__n2", F.sum("__c2").over(ws))
    )
    t = F.col("__c1") + F.col("__c2")
    per_s = c.groupBy(*group_cols, "__st").agg(
        F.sum(F.col("__c1") * F.col("__fb2")).alias("__gt"),
        F.sum(F.col("__c1") * F.col("__c2")).alias("__ties"),
        F.sum(t * t * t - t).alias("__T"),
        F.first("__n1").alias("__n1"),
        F.first("__n2").alias("__n2"),
    )
    n1, n2 = F.col("__n1"), F.col("__n2")
    nn = n1 + n2
    u2 = F.lit(2).cast(_D) * F.col("__gt") + F.col("__ties")
    tnum = u2 - n1 * n2
    mi = F.lit(1_000_000).cast(_D)
    v4num = n1 * n2 * (nn * nn * nn - nn - F.col("__T")) * mi
    v4den = (
        F.lit(12).cast(_D) * nn * (nn - 1) * (nn + 1) * (nn + 1)
    )
    zd = F.lit(0).cast(_D)
    per_s = (
        per_s.withColumn("__tnum", tnum * mi)
        .withColumn("__tden", F.lit(2).cast(_D) * (nn + 1))
        .withColumn("__vnum", v4num)
        .withColumn("__vden", v4den)
    )
    t_micro = F.when(
        (n1 > 0) & (n2 > 0), F.expr("__tnum div __tden")
    ).otherwise(zd)
    v_micro = F.when(
        (n1 > 0) & (n2 > 0) & (nn >= 2), F.expr("__vnum div __vden")
    ).otherwise(zd)
    ga = per_s.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(n1).alias("__n1t"),
        F.sum(n2).alias("__n2t"),
        F.sum(t_micro).alias("__tm"),
        F.sum(v_micro).alias("__vm"),
    )
    tm, vm = F.col("__tm"), F.col("__vm")
    zc = F.when(vm > 0, tm.cast("double") / F.sqrt((vm * mi).cast("double")))
    return ga.select(
        *group_cols,
        F.col("n_strata").cast("long").alias("n_strata"),
        F.col("__n1t").cast("long").alias("n1"),
        F.col("__n2t").cast("long").alias("n2"),
        tm.cast("string").alias("t_micro"),
        vm.cast("string").alias("v_micro"),
        zc.alias("z"),
        (zc * zc).alias("chi2"),
    )


def mannwhitney_stratified_sql(
    table: str, group: str, stratum: str, value: str, cohort_pred: str
) -> str:
    """DuckDB twin of :func:`mannwhitney_stratified` (hugeint
    arithmetic, identical per-stratum quantize-once terms (both
    engines truncate toward zero — no sign handling),
    empty-cohort/N<2 guards before the eager divisions, single
    div→√ shape)."""
    return f"""
        WITH __ve_h AS (
            SELECT {group} AS g, ({stratum}) AS st, {value} AS v,
                   sum(CASE WHEN {cohort_pred} THEN 1 ELSE 0
                       END)::HUGEINT AS c1,
                   sum(CASE WHEN {cohort_pred} THEN 0 ELSE 1
                       END)::HUGEINT AS c2
            FROM {table}
            WHERE ({stratum}) IS NOT NULL AND ({value}) IS NOT NULL
              AND NOT isnan(CAST({value} AS DOUBLE))
              AND ({cohort_pred}) IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        __ve_c AS (
            SELECT g, st, v, c1, c2,
                   coalesce(sum(c2) OVER (PARTITION BY g, st ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS fb2,
                   sum(c1) OVER (PARTITION BY g, st) AS n1,
                   sum(c2) OVER (PARTITION BY g, st) AS n2
            FROM __ve_h
        ),
        __ve_s AS (
            SELECT g, st, sum(c1 * fb2) AS gt, sum(c1 * c2) AS ties,
                   sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS tt,
                   any_value(n1) AS n1, any_value(n2) AS n2
            FROM __ve_c GROUP BY g, st
        ),
        __ve_t AS (
            SELECT g, st, n1, n2,
                   CASE WHEN n1 > 0 AND n2 > 0 THEN
                       ((2 * gt + ties - n1 * n2) * 1000000::HUGEINT)
                       // (2 * (n1 + n2 + 1))
                   ELSE 0::HUGEINT END AS tm,
                   CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 >= 2 THEN
                       (n1 * n2 * ((n1 + n2) * (n1 + n2) * (n1 + n2)
                                   - (n1 + n2) - tt) * 1000000::HUGEINT)
                       // (12 * (n1 + n2) * (n1 + n2 - 1)
                           * (n1 + n2 + 1) * (n1 + n2 + 1))
                   ELSE 0::HUGEINT END AS vm
            FROM __ve_s
        ),
        __ve_a AS (
            SELECT g, count(*)::BIGINT AS n_strata,
                   sum(n1) AS n1, sum(n2) AS n2,
                   sum(tm) AS tm, sum(vm) AS vm
            FROM __ve_t GROUP BY g
        )
        SELECT g AS {group}, n_strata, CAST(n1 AS BIGINT) AS n1,
               CAST(n2 AS BIGINT) AS n2,
               tm::VARCHAR AS t_micro, vm::VARCHAR AS v_micro,
               CASE WHEN vm > 0 THEN
                   CAST(tm AS DOUBLE)
                   / sqrt(CAST(vm * 1000000::HUGEINT AS DOUBLE))
               END AS z,
               CASE WHEN vm > 0 THEN
                   (CAST(tm AS DOUBLE)
                    / sqrt(CAST(vm * 1000000::HUGEINT AS DOUBLE)))
                   * (CAST(tm AS DOUBLE)
                      / sqrt(CAST(vm * 1000000::HUGEINT AS DOUBLE)))
               END AS chi2
        FROM __ve_a
    """

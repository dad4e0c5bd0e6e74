"""Column-level data-quality profiling.

The standard pre-flight check before a corpus enters the pipeline:
per-column completeness (null rate), exact-or-approximate distinct
count, and typed min/max — one row per profiled column, computed in
ONE scan.

Cross-engine determinism: counts are exact longs; numeric min/max
are rounded to 6 decimals (the shared round policy); string min/max
are raw values (binary collation in both engines for ASCII-safe
corpus ids; see caveat in :func:`profile_columns`).  Non-string,
non-numeric columns (timestamps, binaries, arrays) report counts
only — their min/max render differently across engines and are not
worth a formatting contract.

Scale note: ``exact_distinct=True`` uses one ``count(DISTINCT c)``
per column in a single aggregation, which Spark plans as an Expand
(input multiplied by the number of distinct aggregates) — fine for
profiling runs, wasteful at 10^12 rows.  ``exact_distinct=False``
switches to ``approx_count_distinct`` (HLL++, single pass, no
Expand) — the scale default; the oracle-checked query uses the exact
mode at small SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, StringType

_D38 = "decimal(38,0)"


def profile_columns(
    df: DataFrame, cols: list[str], *, exact_distinct: bool = True
) -> DataFrame:
    """One row per column: (column, n_rows, n_null, null_frac,
    n_distinct, min_num, max_num, min_str, max_str).

    String min/max assume binary-ish collation agreement (exact for
    ASCII; non-ASCII collation differences between engines are the
    caller's lookout in oracle comparisons)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        t = df.schema[c].dataType
        distinct = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct.alias(f"__nd_{c}"),
        ]
        if isinstance(t, NumericType):
            aggs += [
                F.round(F.min(F.col(c)).cast("double"), 6).alias(f"__mn_{c}"),
                F.round(F.max(F.col(c)).cast("double"), 6).alias(f"__mx_{c}"),
            ]
        elif isinstance(t, StringType):
            aggs += [
                F.min(F.col(c)).alias(f"__ms_{c}"),
                F.max(F.col(c)).alias(f"__xs_{c}"),
            ]
    # derived per-column projections stay IN-PLAN (Spark's round /
    # division semantics, not Python's), then ONE collect of the
    # single agg row — a union of K lazy branches over the same agg
    # would rescan the corpus K times
    derived = []
    for c in cols:
        derived.append(
            F.round((F.col("__n") - F.col(f"__nn_{c}")) / F.col("__n"), 6).alias(
                f"__nf_{c}"
            )
        )
    r = df.agg(*aggs).select(F.col("*"), *derived).collect()[0]

    rows = []
    for c in cols:
        t = df.schema[c].dataType
        is_num, is_str = isinstance(t, NumericType), isinstance(t, StringType)
        rows.append(
            (
                c,
                r["__n"],
                r["__n"] - r[f"__nn_{c}"],
                r[f"__nf_{c}"],
                r[f"__nd_{c}"],
                r[f"__mn_{c}"] if is_num else None,
                r[f"__mx_{c}"] if is_num else None,
                r[f"__ms_{c}"] if is_str else None,
                r[f"__xs_{c}"] if is_str else None,
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "column string, n_rows long, n_null long, null_frac double, "
        "n_distinct long, min_num double, max_num double, "
        "min_str string, max_str string",
    )


def profile_columns_sql(table: str, table_schema: dict[str, str], cols: list[str]) -> str:
    """DuckDB twin of the exact-mode :func:`profile_columns`.
    ``table_schema`` maps column -> 'num' | 'str' | 'other' (mirrors
    the Spark-side type dispatch)."""
    selects = []
    for c in cols:
        kind = table_schema[c]
        mn = f"round(min({c})::double, 6)" if kind == "num" else "NULL::double"
        mx = f"round(max({c})::double, 6)" if kind == "num" else "NULL::double"
        ms = f"min({c})" if kind == "str" else "NULL::varchar"
        xs = f"max({c})" if kind == "str" else "NULL::varchar"
        selects.append(
            f"SELECT '{c}' AS column, count(*)::bigint AS n_rows, "
            f"(count(*) - count({c}))::bigint AS n_null, "
            f"round((count(*) - count({c}))::double / count(*), 6) AS null_frac, "
            f"count(DISTINCT {c})::bigint AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, {ms} AS min_str, {xs} AS max_str "
            f"FROM {table}"
        )
    return "\nUNION ALL\n".join(selects)


# Benford first-digit expected probabilities log10(1 + 1/d), quantized
# ONCE to micro-units and injected as identical literals into both
# engines (the Wilson-z literal pattern).  They sum to exactly 10^6 —
# the log10 products telescope to 1 — so the expected distribution is
# itself exact.
_BENFORD_MICRO = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)
assert sum(_BENFORD_MICRO) == 10**6


def benford_deviation(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    *,
    scale: int = 10**6,
) -> DataFrame:
    """(group…, digit, observed, n, share, p_benford, dev, chi2_fp,
    chi2) — per-group first-significant-digit distribution of an
    INTEGER column against Benford's law, with the exact chi²
    goodness-of-fit statistic (dof 8; compare against the caller's
    critical value — 20.09 at α = 0.01).  The classic screen for
    fabricated, synthetic, or unit-mangled numeric columns: naturally
    occurring multi-magnitude quantities (transaction amounts,
    populations, file sizes) follow P(d) = log10(1+1/d); uniform or
    hand-typed data does not.

    Exactness: the first digit comes from the decimal STRING of the
    long (both engines render longs identically — no float
    formatting); observed counts are exact longs with ZERO-count
    digits materialized via a 9-row literal table (the fleiss
    left-join pattern — chi² needs the empty cells); expected
    probabilities are the micro-unit literals above (they sum to
    exactly 10⁶).  Per digit, num = observed·10⁶ − N·p_micro is an
    exact integer; share/p_benford/dev are single correctly-rounded
    divisions; chi² = Σ num²·scale div (N·p_micro·10⁶) on
    decimal/hugeint, summed exactly and divided once — all
    hash-oracle-able.  Truncation understates chi² by < 9/scale.

    Contract: the column must be integral (quantize floats ONCE
    upstream — e.g. cents — which preserves first digits for any
    power-of-ten scale); zero and NULL values are dropped (they have
    no first digit; Benford applies to magnitudes), negatives
    contribute |x|.  OVERFLOW: N²·10¹⁸ ≲ 10³⁸ per the decimal38
    contract → N per group ≲ 3·10⁹.

    Scale shape: a pure-map digit projection + ONE map-side-combined
    (group, digit) count — the only row-scale stages; the digit
    frame join, window chi² and divisions all run over ≤ 9 rows per
    group.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    from pyspark.sql import Window

    v = F.col(value_col) if isinstance(value_col, str) else value_col
    dt = df.select(v.alias("__probe")).schema[0].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"value_col must be integral, got {dt}; quantize explicitly first"
        )
    digit = F.substring(F.abs(v).cast("string"), 1, 1).cast("int")
    counts = (
        df.where(v.isNotNull() & (v != 0))
        .groupBy(*group_cols, digit.alias("__d"))
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
    )
    groups = counts.groupBy(*group_cols).agg(
        F.sum("__o").cast("long").alias("__N")
    )
    frame = groups.crossJoin(
        F.broadcast(
            counts.sparkSession.createDataFrame(
                [(d, p) for d, p in zip(range(1, 10), _BENFORD_MICRO)],
                "__d int, __p long",
            )
        )
    )
    # null-safe frame join: groupBy keeps NULL group keys, but a plain
    # equi-join would orphan them (NULL != NULL) and silently report
    # observed = 0 for every digit of the NULL group (review catch,
    # pinned by test_null_group_key)
    import functools as _ft
    import operator as _op

    cnt2 = counts.withColumnRenamed("__d", "__rd")
    for g in group_cols:
        cnt2 = cnt2.withColumnRenamed(g, f"__r_{g}")
    cond = _ft.reduce(
        _op.and_,
        [frame[g].eqNullSafe(cnt2[f"__r_{g}"]) for g in group_cols]
        + [frame["__d"] == cnt2["__rd"]],
    )
    full = (
        frame.join(cnt2, cond, "left")
        .drop("__rd", *[f"__r_{g}" for g in group_cols])
        .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0).cast("long")))
    )
    # ONE source for the fixed-point numerator: dev and chi2 must not
    # be able to desynchronize (review catch)
    num_sql = (
        f"(__o * CAST({10**6} AS DECIMAL(38,0))"
        f" - __N * CAST(__p AS DECIMAL(38,0)))"
    )
    num = F.expr(num_sql)
    term = F.expr(
        f"CAST(({num_sql} * {num_sql} * CAST({scale} AS DECIMAL(38,0)))"
        f" div (CAST(__N AS DECIMAL(38,0)) * __p"
        f"      * CAST({10**6} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
    )
    wg = Window.partitionBy(*group_cols)
    out = full.withColumn("__fp", F.sum(term).over(wg))
    nd = F.col("__N").cast("double")
    return out.select(
        *group_cols,
        F.col("__d").alias("digit"),
        F.col("__o").alias("observed"),
        F.col("__N").alias("n"),
        (F.col("__o").cast("double") / nd).alias("share"),
        (F.col("__p").cast("double") / F.lit(1000000.0)).alias("p_benford"),
        (num.cast("double") / (F.col("__N").cast(_D38) * F.lit(10**6).cast(_D38)).cast("double")).alias("dev"),
        F.col("__fp").cast("string").alias("chi2_fp"),
        (F.col("__fp").cast("double") / F.lit(float(scale))).alias("chi2"),
    )


def benford_deviation_sql(
    table: str,
    group: str,
    value: str,
    *,
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`benford_deviation` (same literals,
    hugeint terms, `//` floor division — positive operands)."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    lits = ", ".join(
        f"({d}, {p}::BIGINT)" for d, p in zip(range(1, 10), _BENFORD_MICRO)
    )
    return f"""
        WITH __bf_cnt AS (
            SELECT {group} AS g,
                   CAST(substr(CAST(abs({value}) AS VARCHAR), 1, 1) AS INT)
                       AS d,
                   count(*)::BIGINT AS o
            FROM {table}
            WHERE ({value}) IS NOT NULL AND ({value}) <> 0
            GROUP BY 1, 2
        ),
        __bf_n AS (SELECT g, sum(o)::BIGINT AS N FROM __bf_cnt GROUP BY g),
        __bf_dig (d, p) AS (VALUES {lits}),
        __bf_full AS (
            SELECT n.g, dg.d, dg.p, n.N, coalesce(c.o, 0::BIGINT) AS o
            FROM __bf_n n CROSS JOIN __bf_dig dg
            LEFT JOIN __bf_cnt c
              ON c.g IS NOT DISTINCT FROM n.g AND c.d = dg.d
        ),
        __bf_num AS (
            SELECT g, d, o, N, p,
                   (o::HUGEINT * 1000000 - N::HUGEINT * p) AS num
            FROM __bf_full
        ),
        __bf_t AS (
            SELECT g, d, o, N, p, num,
                   sum((num * num * {scale}::HUGEINT)
                       // (N::HUGEINT * p::HUGEINT * 1000000::HUGEINT))
                       OVER (PARTITION BY g) AS fp
            FROM __bf_num
        )
        SELECT g AS {group}, d AS digit, o AS observed, N AS n,
               o::DOUBLE / N::DOUBLE AS share,
               p::DOUBLE / 1000000.0 AS p_benford,
               CAST(num AS DOUBLE)
                   / CAST(N::HUGEINT * 1000000::HUGEINT AS DOUBLE) AS dev,
               fp::VARCHAR AS chi2_fp,
               CAST(fp AS DOUBLE) / {float(scale)} AS chi2
        FROM __bf_t
    """

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

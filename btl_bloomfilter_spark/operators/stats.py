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

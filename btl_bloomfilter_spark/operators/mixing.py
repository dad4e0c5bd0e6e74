"""Deterministic dataset mixing (pre-training mixture sampling).

Pre-training corpora are assembled as weighted mixtures of sources
("70% web, 20% code, 10% chat").  This operator turns target weights
into per-source deterministic hash-sampling rates and applies them,
so the mixture is:

- content-keyed (same doc -> same decision across reruns, engines,
  partition layouts — the ``functions.splits`` md5 path);
- feasibility-aware: the achievable mixture size given sizes n_s and
  weights w_s is T = floor(min_s n_s / w_s); the default samples the
  largest exact-proportion mixture, a caller-provided ``total``
  is capped at that feasibility bound;
- engine-reproducible end-to-end: rates are derived from the exact
  long source counts with IEEE-exact double arithmetic (mul/div of
  exactly-representable values, floor to the 1/RESOLUTION grid), so
  a DuckDB twin computing the same rates inline selects the
  IDENTICAL rows — the mixture is hash-oracle-able by id.

Plan shape (the 100-TB one): one count-by-source agg (map-side
partial, |sources| rows), broadcast the per-source threshold table,
then a pure-map filter — the decision column costs one md5 per row
and pushes down like any predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.splits import RESOLUTION, _hash60, _key_sql


def _validate(weights: dict[str, float]) -> None:
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive (omit zero-weight sources)")
    total = sum(weights.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"weights must sum to 1, got {total}")


def mixture_thresholds(
    counts: dict[str, int], weights: dict[str, float], total: int | None = None
) -> tuple[dict[str, int], int]:
    """Per-source sampling thresholds on the 1/RESOLUTION grid, and
    the realized mixture target T.  Shared by the Spark operator and
    the SQL twin generator so both derive from the same arithmetic:
    T = floor(min n_s / w_s) (capped by ``total``), threshold_s =
    floor(w_s * T / n_s * RESOLUTION)."""
    _validate(weights)
    missing = [s for s in weights if counts.get(s, 0) <= 0]
    if missing:
        raise ValueError(f"weighted sources absent from the corpus: {missing}")
    feasible = min(counts[s] / weights[s] for s in weights)
    t = int(feasible) if total is None else min(int(total), int(feasible))
    thresholds = {
        s: min(RESOLUTION, int(weights[s] * t / counts[s] * RESOLUTION))
        for s in weights
    }
    return thresholds, t


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_cols: list[str],
    weights: dict[str, float],
    *,
    total: int | None = None,
    seed: int | str = 0,
) -> DataFrame:
    """Rows of ``df`` selected into the target mixture (sources not
    in ``weights`` are dropped).  Selection is the content-keyed
    md5 flag at the per-source threshold — deterministic and
    engine-portable.  Expected kept count per source is
    w_s * T (hash-sampling variance around it, like any Bernoulli
    sampler); exact proportions need weighted reservoir/top-k
    instead (``splits.priority_sample``)."""
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[source_col] in weights
    }
    thresholds, _ = mixture_thresholds(counts, weights, total)
    thr = F.create_map(
        *[x for s, v in sorted(thresholds.items()) for x in (F.lit(s), F.lit(v))]
    )[F.col(source_col)]
    return df.where((_hash60(id_cols, seed) % RESOLUTION) < thr)


def mixture_sample_sql(
    table: str,
    source_col: str,
    id_cols: list[str],
    weights: dict[str, float],
    *,
    total: int | None = None,
    seed: int | str = 0,
) -> str:
    """DuckDB twin of :func:`mixture_sample`: recomputes counts,
    T and thresholds inline with the identical arithmetic (exact
    bigint counts -> double mul/div -> floor), then applies the same
    md5 flag — selects the identical rows."""
    _validate(weights)
    t_terms = " , ".join(
        f"floor((SELECT count(*) FROM {table} WHERE {source_col} = '{s}') / {float(w)!r})"
        for s, w in sorted(weights.items())
    )
    t_expr = f"least({t_terms})" if len(weights) > 1 else t_terms
    if total is not None:
        t_expr = f"least({t_expr}, {int(total)})"
    cases = " ".join(
        f"WHEN '{s}' THEN least({RESOLUTION}, "
        f"floor({float(w)!r} * (SELECT t FROM tval) / "
        f"(SELECT count(*) FROM {table} WHERE {source_col} = '{s}') * {RESOLUTION})::bigint)"
        for s, w in sorted(weights.items())
    )
    h60 = f"('0x' || substr({_key_sql(seed, id_cols)}, 1, 15))::ubigint"
    return f"""
WITH tval AS (SELECT {t_expr}::bigint AS t)
SELECT * FROM {table}
WHERE (CASE {source_col} {cases} END) IS NOT NULL
  AND ({h60} % {RESOLUTION})::bigint < (CASE {source_col} {cases} END)
""".strip()

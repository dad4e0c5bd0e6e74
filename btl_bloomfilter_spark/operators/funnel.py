"""Ordered funnel analysis — exact, engine-portable.

The classic product-analytics operator Spark has no native form of:
given a prescribed sequence of steps (event types, tool names), how
far does each key (user, conversation) progress, where step i+1 must
occur STRICTLY AFTER the matched occurrence of step i?

Semantics: greedy earliest-match subsequence.  Step 1 matches at the
key's minimum order value carrying step 1; step i+1 matches at the
minimum order value > the matched order of step i.  Greedy earliest
is OPTIMAL for subsequence matching (matching any later occurrence
never allows a deeper funnel), so ``stage_reached`` is exactly "the
longest prefix of ``steps`` embeddable in this key's ordered
events" — a well-defined quantity, not a heuristic.

Everything is MIN aggregates and strict comparisons on the order
column — no floats, no tie-break dependence (ties collapse under
min; equality is excluded by the strict >), so results are identical
in Spark and DuckDB and the whole operator hash-oracles.

Scale shape: the event table is filtered to funnel steps up front
(usually a tiny fraction), then each of the L steps is one
key-grouped MIN plus one key-equi-join against the (key-sized)
previous frontier — L small (≤ 6 enforced).  All joins are on the
key: co-partitioned after the first shuffle, never row×row.  The
report is a further stage-sized aggregate: counts are exact longs,
conversion rates single int-double divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_STEPS = 6


def _check_steps(steps) -> list[str]:
    steps = list(steps)
    if not 2 <= len(steps) <= MAX_STEPS:
        raise ValueError(f"steps must have 2..{MAX_STEPS} entries, got {len(steps)}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    return steps


def funnel_stages(
    df: DataFrame,
    key_cols: list[str],
    step_col: str,
    steps: list[str],
    order_col: str,
) -> DataFrame:
    """Per-key funnel progress.

    Returns (key…, stage_reached, matched_1 … matched_L): the stage
    count and each matched step's order value (NULL once the funnel
    stalls).  Keys with NO event in ``steps`` don't appear (they have
    no rows after the pre-filter); keys with relevant events that
    never match step 1 appear with stage_reached = 0.  NULL order
    values are dropped (unordered events can't participate).
    """
    steps = _check_steps(steps)
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    ev = df.where(
        F.col(step_col).isin(steps) & F.col(order_col).isNotNull()
    ).select(*key_cols, F.col(step_col).alias("__s"), F.col(order_col).alias("__t"))
    base = ev.select(*key_cols).distinct()
    out = base
    prev = None
    for i, s in enumerate(steps, start=1):
        e = ev.where(F.col("__s") == s)
        if prev is None:
            p = e.groupBy(*key_cols).agg(F.min("__t").alias(f"matched_{i}"))
        else:
            p = (
                e.join(prev, key_cols)
                .where(F.col("__t") > F.col(f"matched_{i - 1}"))
                .groupBy(*key_cols)
                .agg(F.min("__t").alias(f"matched_{i}"))
            )
        out = out.join(p, key_cols, "left")
        prev = p
    stage = F.lit(0)
    for i in range(1, len(steps) + 1):
        stage = F.when(F.col(f"matched_{i}").isNotNull(), i).otherwise(stage)
    return out.select(
        *key_cols,
        stage.cast("int").alias("stage_reached"),
        *[F.col(f"matched_{i}") for i in range(1, len(steps) + 1)],
    )


def funnel_report(
    df: DataFrame,
    key_cols: list[str],
    step_col: str,
    steps: list[str],
    order_col: str,
) -> DataFrame:
    """Stage-level conversion report over :func:`funnel_stages`.

    One row per funnel stage: (stage, step, n_reached, conversion)
    where n_reached counts keys whose stage_reached ≥ stage and
    conversion = n_reached(stage)/n_reached(stage−1) (stage 1
    converts from the eligible-key universe).  Counts are exact;
    each rate is ONE division; a 0/0 stage reports NULL identically
    in both engines.
    """
    steps = _check_steps(steps)
    st = funnel_stages(df, key_cols, step_col, steps, order_col)
    # coalesce: sum over an EMPTY stages table (no key has any funnel
    # event) is NULL in both engines — the report must say 0
    # (review finding, pinned by test_report_empty_universe)
    tot = st.groupBy().agg(
        F.count(F.lit(1)).alias("__n0"),
        *[
            F.coalesce(
                F.sum((F.col("stage_reached") >= i).cast("long")), F.lit(0)
            ).alias(f"__n{i}")
            for i in range(1, len(steps) + 1)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage"),
                F.lit(steps[i - 1]).alias("step"),
                F.col(f"__n{i}").cast("long").alias("n_reached"),
                F.when(
                    F.col(f"__n{i - 1}") > 0,
                    F.col(f"__n{i}").cast("double")
                    / F.col(f"__n{i - 1}").cast("double"),
                ).alias("conversion"),
            )
            for i in range(1, len(steps) + 1)
        ]
    )
    return tot.select(F.explode(rows).alias("r")).select(
        F.col("r.stage").alias("stage"),
        F.col("r.step").alias("step"),
        F.col("r.n_reached").alias("n_reached"),
        F.col("r.conversion").alias("conversion"),
    )


def _stage_ctes(table: str, key: str, step: str, steps: list[str], order: str) -> str:
    lines = [
        f"ev AS (SELECT {key} AS k, {step} AS s, {order} AS t FROM {table} "
        f"WHERE {step} IN ({', '.join(_q(s) for s in steps)}) AND {order} IS NOT NULL)",
        "base AS (SELECT DISTINCT k FROM ev)",
        f"p1 AS (SELECT k, min(t) AS m FROM ev WHERE s = {_q(steps[0])} GROUP BY k)",
    ]
    for i in range(2, len(steps) + 1):
        lines.append(
            f"p{i} AS (SELECT ev.k, min(t) AS m FROM ev JOIN p{i - 1} ON ev.k = p{i - 1}.k "
            f"WHERE ev.s = {_q(steps[i - 1])} AND ev.t > p{i - 1}.m GROUP BY ev.k)"
        )
    joins = " ".join(
        f"LEFT JOIN p{i} ON base.k = p{i}.k" for i in range(1, len(steps) + 1)
    )
    sel = ", ".join(f"p{i}.m AS matched_{i}" for i in range(1, len(steps) + 1))
    case = "CASE " + " ".join(
        f"WHEN p{i}.m IS NOT NULL THEN {i}"
        for i in range(len(steps), 0, -1)
    ) + " ELSE 0 END"
    lines.append(
        f"stages AS (SELECT base.k, CAST({case} AS INT) AS stage_reached, {sel} "
        f"FROM base {joins})"
    )
    return ",\n        ".join(lines)


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def funnel_stages_sql(
    table: str, key: str, step: str, steps: list[str], order: str
) -> str:
    """DuckDB twin of :func:`funnel_stages` (single key expression)."""
    steps = _check_steps(steps)
    cols = ", ".join(f"matched_{i}" for i in range(1, len(steps) + 1))
    return f"""
        WITH {_stage_ctes(table, key, step, steps, order)}
        SELECT k AS {key}, stage_reached, {cols} FROM stages
    """


def funnel_report_sql(
    table: str, key: str, step: str, steps: list[str], order: str
) -> str:
    """DuckDB twin of :func:`funnel_report`."""
    steps = _check_steps(steps)
    n_cols = ", ".join(
        f"coalesce(sum(CASE WHEN stage_reached >= {i} THEN 1 ELSE 0 END), 0)::bigint AS n{i}"
        for i in range(1, len(steps) + 1)
    )
    rows = ", ".join(
        f"({i}, {_q(steps[i - 1])}, n{i}, "
        f"CASE WHEN n{i - 1} > 0 THEN CAST(n{i} AS DOUBLE) / CAST(n{i - 1} AS DOUBLE) END)"
        for i in range(1, len(steps) + 1)
    )
    return f"""
        WITH {_stage_ctes(table, key, step, steps, order)},
        tot AS (SELECT count(*)::bigint AS n0, {n_cols} FROM stages)
        SELECT r.* FROM tot, LATERAL (
            VALUES {rows}
        ) r(stage, step, n_reached, conversion)
    """

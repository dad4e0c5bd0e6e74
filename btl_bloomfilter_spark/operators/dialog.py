"""Transcript dialog-structure validation and budget truncation.

Transcript-specific data-quality operators — the checks an
agent-conversation pipeline runs before transcripts become training
data:

- :func:`dialog_stats`: per-conversation structural report — turn
  count, first/last role, empty turns, role-alternation breaks
  (consecutive same-role turns), turn-index gaps/duplicates — all
  exact integer/string aggregates over one window pass, fully
  hash-oracle-able.
- :func:`truncate_to_budget`: keep the maximal SUFFIX of whole turns
  whose token total fits a context budget (how a trainer trims long
  histories: most recent turns win).  Reverse running sum per
  conversation; exact long arithmetic.

Plan shape: one shuffle on conv_id each; windows stream within the
partition (running sums / lag only), and the stats groupBy reuses
the window's partitioning (same single-Exchange argument as
operators/sessions, pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dialog_stats(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    opening_role: str = "user",
) -> DataFrame:
    """One row per conversation: (conv, n_turns, first_role,
    last_role, n_empty, n_alternation_breaks, n_idx_gaps,
    n_idx_dups, well_formed).  ``well_formed`` = opens with
    ``opening_role``, no empty turns, no alternation breaks, dense
    0-based turn indices."""
    # every window tie-breaks duplicate turn indices by role: the
    # relative order of identical (idx, role) pairs cannot change any
    # computed stat, so both engines see the same row sequence
    w = Window.partitionBy("__conv").orderBy("__idx", "__role")
    t = turns.select(
        F.col(conv_col).alias("__conv"),
        F.col(idx_col).alias("__idx"),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
    ).withColumns(
        {
            "__brk": (F.col("__role") == F.lag("__role").over(w)).cast("long"),
            "__gap": (
                F.col("__idx") - F.lag("__idx").over(w) > 1
            ).cast("long"),
            "__dup": (
                F.col("__idx") == F.lag("__idx").over(w)
            ).cast("long"),
            # (idx, role) tie-break keeps first/last deterministic
            # even on duplicate turn indices (min_by would pick
            # engine-arbitrarily there)
            "__first": F.first("__role").over(
                Window.partitionBy("__conv").orderBy("__idx", "__role")
            ),
            "__last": F.first("__role").over(
                Window.partitionBy("__conv").orderBy(
                    F.col("__idx").desc(), F.col("__role").desc()
                )
            ),
        }
    )
    out = t.groupBy("__conv").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("__first").alias("first_role"),
        F.min("__last").alias("last_role"),
        F.min("__idx").alias("min_idx"),
        F.sum((F.col("__text") == "").cast("long")).alias("n_empty"),
        F.sum(F.coalesce("__brk", F.lit(0))).alias("n_alternation_breaks"),
        F.sum(F.coalesce("__gap", F.lit(0))).alias("n_idx_gaps"),
        F.sum(F.coalesce("__dup", F.lit(0))).alias("n_idx_dups"),
    )
    return out.select(
        F.col("__conv").alias(conv_col),
        "n_turns",
        "first_role",
        "last_role",
        "n_empty",
        "n_alternation_breaks",
        "n_idx_gaps",
        "n_idx_dups",
        (
            (F.col("first_role") == opening_role)
            & (F.col("min_idx") == 0)
            & (F.col("n_empty") == 0)
            & (F.col("n_alternation_breaks") == 0)
            & (F.col("n_idx_gaps") == 0)
            & (F.col("n_idx_dups") == 0)
        ).alias("well_formed"),
    )


def dialog_stats_sql(
    table: str,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    opening_role: str = "user",
) -> str:
    """DuckDB twin of :func:`dialog_stats`."""
    op = str(opening_role).replace("'", "''")
    return f"""
WITH __dlg AS (
  SELECT {conv_col} AS conv, {idx_col} AS idx,
         coalesce({role_col}, '') AS role,
         coalesce({text_col}, '') AS txt,
         CASE WHEN coalesce({role_col}, '') = lag(coalesce({role_col}, ''))
                   OVER (PARTITION BY {conv_col}
                         ORDER BY {idx_col}, coalesce({role_col}, ''))
              THEN 1 ELSE 0 END AS brk,
         CASE WHEN {idx_col} - lag({idx_col})
                   OVER (PARTITION BY {conv_col}
                         ORDER BY {idx_col}, coalesce({role_col}, '')) > 1
              THEN 1 ELSE 0 END AS gap,
         CASE WHEN {idx_col} = lag({idx_col})
                   OVER (PARTITION BY {conv_col}
                         ORDER BY {idx_col}, coalesce({role_col}, ''))
              THEN 1 ELSE 0 END AS dup,
         first_value(coalesce({role_col}, ''))
           OVER (PARTITION BY {conv_col} ORDER BY {idx_col}, coalesce({role_col}, ''))
           AS fr,
         first_value(coalesce({role_col}, ''))
           OVER (PARTITION BY {conv_col} ORDER BY {idx_col} DESC, coalesce({role_col}, '') DESC)
           AS lr
  FROM {table}
),
__dlg_agg AS (
  SELECT conv, count(*)::bigint AS n_turns,
         min(fr) AS first_role,
         min(lr) AS last_role,
         min(idx) AS min_idx,
         sum(CASE WHEN txt = '' THEN 1 ELSE 0 END)::bigint AS n_empty,
         sum(brk)::bigint AS n_alternation_breaks,
         sum(gap)::bigint AS n_idx_gaps,
         sum(dup)::bigint AS n_idx_dups
  FROM __dlg GROUP BY conv
)
SELECT conv AS {conv_col}, n_turns, first_role, last_role, n_empty,
       n_alternation_breaks, n_idx_gaps, n_idx_dups,
       (first_role = '{op}' AND min_idx = 0 AND n_empty = 0
        AND n_alternation_breaks = 0 AND n_idx_gaps = 0
        AND n_idx_dups = 0) AS well_formed
FROM __dlg_agg
""".strip()


def truncate_to_budget(
    turns: DataFrame,
    token_budget: int,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """The maximal whole-turn SUFFIX of each conversation whose token
    total is <= ``token_budget`` (most recent turns win — how a
    trainer trims history to a context window).  Returns the input
    columns plus (turn_tokens, suffix_tokens).  A conversation whose
    LAST turn alone exceeds the budget contributes no rows (whole-
    turn granularity; token-level clipping is a tokenizer concern).

    ``tokens_col`` supplies precomputed counts; otherwise whitespace
    ``textstats.token_count(text_col)`` is used.  Assumes (conv,
    idx) unique — the transcript-table invariant; duplicate indices
    make the suffix order ambiguous (``dialog_stats`` flags them)."""
    if token_budget < 1:
        raise ValueError("token_budget must be >= 1")
    if tokens_col is None:
        from ..functions.textstats import token_count

        toks = token_count(text_col)
    else:
        toks = F.coalesce(F.col(tokens_col), F.lit(0)).cast("long")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(idx_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        turns.withColumn("turn_tokens", toks)
        .withColumn("suffix_tokens", F.sum("turn_tokens").over(w))
        .where(F.col("suffix_tokens") <= token_budget)
    )


def truncate_to_budget_sql(
    table: str,
    token_budget: int,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tokens_expr: str | None = None,
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`truncate_to_budget` (pass the token
    twin, e.g. ``textstats.token_count_sql(text_col)``, as
    ``tokens_expr`` when the Spark side derives counts from text)."""
    if tokens_expr is None:
        from ..functions.textstats import token_count_sql

        tokens_expr = token_count_sql(text_col)
    return f"""
SELECT * FROM (
  SELECT *, ({tokens_expr})::bigint AS turn_tokens,
         sum(({tokens_expr})::bigint)
           OVER (PARTITION BY {conv_col} ORDER BY {idx_col} DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint
           AS suffix_tokens
  FROM {table}
)
WHERE suffix_tokens <= {int(token_budget)}
""".strip()

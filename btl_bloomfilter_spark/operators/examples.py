"""Training-example assembly from multi-turn transcripts.

The last mile of a transcript pipeline: turn the (conv_id, turn_idx,
role, text) table into supervised-fine-tuning examples — for each
assistant turn, a (context, target) pair where the context is the
concatenation of the preceding ``n_context`` turns in stable
turn-idx order (the north_rule's per-turn ordering invariant doing
real work).

Everything is deterministic string assembly over a single window, so
the full result — contexts included — is hash-oracle-able
byte-for-byte against a DuckDB twin.

Plan shape (the 100-TB one): ONE shuffle on conv_id, then a sliding
window that streams within each partition (frame is at most
``n_context`` rows — no conversation-length blowup in state), then a
row-local filter to assistant turns.  Skew is bounded by the longest
single conversation, not by conversation count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sft_examples(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    n_context: int = 4,
    assistant_role: str = "assistant",
    turn_sep: str = "\n",
) -> DataFrame:
    """One row per assistant turn: (conv, turn_idx, n_context_turns,
    context, target).  ``context`` is ``role: text`` lines for up to
    ``n_context`` turns preceding the target, in turn order; the
    first assistant turn of a conversation gets an empty context.
    NULL roles/texts render as empty strings (identically in the SQL
    twin)."""
    if n_context < 1:
        raise ValueError("n_context must be >= 1")
    line = F.concat(
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(": "),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(-n_context, -1)
    )
    ctx = F.collect_list(line).over(w)
    return (
        turns.withColumn("__ctx", ctx)
        .where(F.col(role_col) == assistant_role)
        .select(
            F.col(conv_col),
            F.col(idx_col),
            F.size("__ctx").alias("n_context_turns"),
            F.array_join("__ctx", turn_sep).alias("context"),
            F.coalesce(F.col(text_col), F.lit("")).alias("target"),
        )
    )


def sft_examples_sql(
    table: str,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    n_context: int = 4,
    assistant_role: str = "assistant",
    turn_sep: str = "\n",
) -> str:
    """DuckDB twin of :func:`sft_examples` — identical window frame
    and string assembly, for oracle checks.  (Two DuckDB/Spark
    divergences papered over with coalesce: ``list()`` over an empty
    frame yields NULL vs collect_list's empty array, and
    ``array_to_string([])`` yields NULL vs array_join's '' — same
    quirk the c4_line_filter twin handles.)"""
    role = str(assistant_role).replace("'", "''")
    sep = str(turn_sep).replace("'", "''")
    return f"""
WITH ctxed AS (
  SELECT {conv_col}, {idx_col}, {role_col},
         coalesce({text_col}, '') AS target,
         coalesce(
           list(coalesce({role_col}, '') || ': ' || coalesce({text_col}, ''))
             OVER (PARTITION BY {conv_col} ORDER BY {idx_col}
                   ROWS BETWEEN {n_context} PRECEDING AND 1 PRECEDING),
           []) AS ctx
  FROM {table}
)
SELECT {conv_col}, {idx_col},
       len(ctx)::bigint AS n_context_turns,
       coalesce(array_to_string(ctx, '{sep}'), '') AS context,
       target
FROM ctxed
WHERE {role_col} = '{role}'
""".strip()

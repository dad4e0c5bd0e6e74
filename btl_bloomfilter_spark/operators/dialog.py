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
- :func:`near_dup_conversations`: conversation-granularity near-dup
  pairs — exact Jaccard over order-sensitive w-grams of per-turn md5
  digests (catches a re-logged conversation one turn apart, which
  exact fingerprints and document-level MinHash both miss).
- :func:`tool_sequences`: corpus-wide exact counts of ordered
  tool-call chains (per-conversation tool n-grams).

Plan shapes: one shuffle on conv_id each; windows stream within the
partition (running sums / lag only), and the stats groupBy reuses
the window's partitioning (same single-Exchange argument as
operators/sessions, pinned in tests).  near_dup/tool chains add one
downstream shuffle on the shingle / chain key; pair expansion goes
through dedup.jaccard_pairs_from_shingles (never a self-join or
cartesian).  See PLANS.md §16.
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
                         ORDER BY {idx_col} NULLS FIRST, coalesce({role_col}, ''))
              THEN 1 ELSE 0 END AS brk,
         CASE WHEN {idx_col} - lag({idx_col})
                   OVER (PARTITION BY {conv_col}
                         ORDER BY {idx_col} NULLS FIRST, coalesce({role_col}, '')) > 1
              THEN 1 ELSE 0 END AS gap,
         CASE WHEN {idx_col} = lag({idx_col})
                   OVER (PARTITION BY {conv_col}
                         ORDER BY {idx_col} NULLS FIRST, coalesce({role_col}, ''))
              THEN 1 ELSE 0 END AS dup,
         first_value(coalesce({role_col}, ''))
           OVER (PARTITION BY {conv_col} ORDER BY {idx_col} NULLS FIRST, coalesce({role_col}, ''))
           AS fr,
         first_value(coalesce({role_col}, ''))
           OVER (PARTITION BY {conv_col} ORDER BY {idx_col} DESC NULLS LAST, coalesce({role_col}, '') DESC)
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


def conversation_shingles(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    w: int = 3,
) -> DataFrame:
    """DISTINCT order-sensitive w-gram shingles of per-turn md5
    digests, one (id, shingle) row each — the conversation-granularity
    analogue of :func:`dedup.shingles`.  A shingle is the md5 of ``w``
    consecutive turn digests concatenated (fixed-width hex, so no
    separator-injection ambiguity — same argument as
    ``group_fingerprints``'s digest chain); turn order is
    (idx, digest) so duplicate indices stay engine-deterministic.
    Conversations shorter than ``w`` turns contribute ONE shingle over
    all their turns, so short exact-duplicate conversations still
    pair at Jaccard 1.0.

    Plan: one shuffle on conv (collect_list), shingling is a pure
    array expression, then the distinct explode."""
    if w < 1:
        raise ValueError("w must be >= 1")
    digests = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(idx_col).alias("i"),
                    F.md5(
                        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
                    ).alias("d"),
                )
            )
        ),
        lambda x: x["d"],
    )
    grams = F.when(
        F.size("__ds") >= w,
        F.transform(
            F.sequence(F.lit(1), F.size("__ds") - w + 1),
            lambda i: F.md5(F.encode(F.array_join(F.slice("__ds", i, w), ""), "UTF-8")),
        ),
    ).otherwise(F.array(F.md5(F.encode(F.array_join("__ds", ""), "UTF-8"))))
    return (
        turns.groupBy(F.col(conv_col).alias("id"))
        .agg(digests.alias("__ds"))
        .select("id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def near_dup_conversations(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    w: int = 3,
    threshold: float = 0.5,
    max_conv_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate CONVERSATION pairs: exact Jaccard >= threshold
    over order-sensitive turn-digest w-gram shingles.  Catches what
    exact conversation fingerprints (dedup.group_fingerprints) and
    document-level MinHash both miss: the same conversation re-logged
    with one turn added/dropped/edited scores high-but-below-1.0
    here, while unrelated conversations sharing common phrases score
    ~0 (digest grams only collide on EXACT turn runs).

    ``max_conv_freq`` caps shingle conversation-frequency (the
    boilerplate-opening skew guard — the analogue of
    ngram_jaccard_pairs' max_doc_freq, same capped-universe
    semantics).  Plan: one conv shuffle to shingle, one shingle
    shuffle to group; only co-shingled pairs materialize — never
    all-pairs."""
    from .dedup import jaccard_pairs_from_shingles

    sh = conversation_shingles(
        turns, conv_col=conv_col, idx_col=idx_col, text_col=text_col, w=w
    )
    out = jaccard_pairs_from_shingles(
        sh, threshold=threshold, max_doc_freq=max_conv_freq
    )
    return out.select(
        F.col("id_a").alias("conv_a"),
        F.col("id_b").alias("conv_b"),
        "jaccard",
    )


def near_dup_conversations_sql(
    table: str,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    w: int = 3,
    threshold: float = 0.5,
    max_conv_freq: int | None = None,
) -> str:
    """DuckDB twin of :func:`near_dup_conversations` (same shingle
    derivation, same capped universe, same rounding)."""
    cap = (
        f"WHERE cnt <= {int(max_conv_freq)}"
        if max_conv_freq is not None
        else ""
    )
    return f"""
WITH __nd_arr AS (
  SELECT {conv_col} AS id,
         list(md5(coalesce({text_col}, ''))
              ORDER BY {idx_col} NULLS FIRST, md5(coalesce({text_col}, ''))) AS ds
  FROM {table} GROUP BY {conv_col}
),
__nd_sh AS (
  SELECT DISTINCT id, shingle FROM (
    SELECT id, unnest(
      CASE WHEN len(ds) >= {w}
           THEN list_transform(generate_series(1, len(ds) - {w} + 1),
                               i -> md5(array_to_string(ds[i : i + {w} - 1], '')))
           ELSE [md5(array_to_string(ds, ''))]
      END) AS shingle
    FROM __nd_arr)
),
__nd_kept AS (
  SELECT id, shingle FROM (
    SELECT id, shingle, count(*) OVER (PARTITION BY shingle) AS cnt
    FROM __nd_sh) {cap}
),
__nd_sizes AS (
  SELECT id, count(*) AS sz FROM __nd_kept GROUP BY id
),
__nd_inter AS (
  SELECT a.id AS conv_a, b.id AS conv_b, count(*) AS inter
  FROM __nd_kept a JOIN __nd_kept b
    ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT conv_a, conv_b,
       round(inter::double / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM __nd_inter
JOIN __nd_sizes sa ON conv_a = sa.id
JOIN __nd_sizes sb ON conv_b = sb.id
WHERE round(inter::double / (sa.sz + sb.sz - inter), 6) >= {threshold}
""".strip()


def tool_sequences(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    n: int = 2,
    min_count: int = 1,
    sep: str = ">",
) -> DataFrame:
    """Tool-call chain mining: corpus-wide counts of ordered n-grams
    over each conversation's non-null ``tool`` sequence — "which tool
    chains are common" (the sequence analogue of single-tool heavy
    hitters).  One row per chain: (seq, n_occurrences, n_convs);
    occurrences are counted per position (a chain appearing twice in
    one conversation counts twice), ``n_convs`` is the distinct
    conversations containing it.  Exact long counts — hash-oracle-able.

    Chains render as tool names joined by ``sep``.  A tool name
    containing ``sep`` would make the rendering ambiguous, so the
    plan embeds a guard that raises on such input (fused into the
    first scan — no extra pass).

    Plan: one shuffle on conv (ordered collect_list, ≤ conversation
    length per group), n-gramming as a pure array expression, then
    one count aggregation on the chain key (map-side partial agg)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    guarded = F.when(
        F.col(tool_col).contains(sep),
        F.raise_error(
            F.concat(
                F.lit(f"tool_sequences: tool name contains separator {sep!r}: "),
                F.col(tool_col),
            )
        ),
    ).otherwise(F.col(tool_col))
    tools = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(idx_col).alias("i"), guarded.alias("t")))
        ),
        lambda x: x["t"],
    )
    grams = F.when(
        F.size("__ts") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__ts") - n + 1),
            lambda i: F.array_join(F.slice("__ts", i, n), sep),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        turns.where(F.col(tool_col).isNotNull())
        .groupBy(F.col(conv_col).alias("__conv"))
        .agg(tools.alias("__ts"))
        .select("__conv", F.explode(grams).alias("seq"))
        .groupBy("seq")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("__conv").alias("n_convs"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def tool_sequences_sql(
    table: str,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    n: int = 2,
    min_count: int = 1,
    sep: str = ">",
) -> str:
    """DuckDB twin of :func:`tool_sequences` (same ordering tie-break,
    same per-position counting)."""
    sep_sql = sep.replace("'", "''")
    return f"""
WITH __ts AS (
  SELECT {conv_col} AS conv,
         list({tool_col} ORDER BY {idx_col} NULLS FIRST, {tool_col}) AS ts
  FROM {table} WHERE {tool_col} IS NOT NULL GROUP BY {conv_col}
),
__tg AS (
  SELECT conv,
         unnest(list_transform(generate_series(1, len(ts) - {n} + 1),
                               i -> array_to_string(ts[i : i + {n} - 1], '{sep_sql}'))) AS seq
  FROM __ts WHERE len(ts) >= {n}
)
SELECT seq, count(*)::bigint AS n_occurrences,
       count(DISTINCT conv)::bigint AS n_convs
FROM __tg GROUP BY seq HAVING count(*) >= {int(min_count)}
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
        # clamp corrupt negative counts: a negative value would make
        # the reverse running sum non-monotone and the kept set a
        # non-contiguous hole-y "suffix" (same guard packing has)
        toks = F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.col(tokens_col), F.lit(0)).cast("long"),
        )
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
    toks = f"greatest(0, coalesce(({tokens_expr}), 0))::bigint"
    return f"""
SELECT * FROM (
  SELECT *, {toks} AS turn_tokens,
         sum({toks})
           OVER (PARTITION BY {conv_col} ORDER BY {idx_col} DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint
           AS suffix_tokens
  FROM {table}
)
WHERE suffix_tokens <= {int(token_budget)}
""".strip()


def repeated_turns(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Boilerplate turn mining: corpus-wide counts of byte-identical
    turn texts — "which exact turns repeat across conversations"
    (canned greetings, templated tool output, injected system text).
    One row per repeated text: (text_md5, text_len, n_occurrences,
    n_convs, n_roles).  Exact long counts — hash-oracle-able.

    Plan (100-TB shape): the group key is md5(text), so the shuffle
    moves 32-hex keys + map-side partial counts, never the texts; the
    two exact count-distincts share the one Expand over the collapsed
    key table.  NULL text groups with '' (both are 'empty turn')."""
    key = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    return (
        turns.select(
            key.alias("text_md5"),
            F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias("__len"),
            F.col(conv_col).alias("__conv"),
            F.col(role_col).alias("__role"),
        )
        .groupBy("text_md5")
        .agg(
            F.max("__len").alias("text_len"),
            F.count("*").alias("n_occurrences"),
            F.countDistinct("__conv").alias("n_convs"),
            F.countDistinct("__role").alias("n_roles"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def repeated_turns_sql(
    table: str,
    *,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`repeated_turns`."""
    return f"""
SELECT md5(coalesce({text_col}, '')) AS text_md5,
       max(length(coalesce({text_col}, '')))::bigint AS text_len,
       count(*)::bigint AS n_occurrences,
       count(DISTINCT {conv_col})::bigint AS n_convs,
       count(DISTINCT {role_col})::bigint AS n_roles
FROM {table}
GROUP BY md5(coalesce({text_col}, ''))
HAVING count(*) >= {int(min_count)}
""".strip()


def role_transitions(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    start_marker: str = "<start>",
) -> DataFrame:
    """Dialog-flow transition counts: corpus totals of (from_role →
    to_role) over each conversation's turn order, with a synthetic
    ``start_marker`` → first-role edge so conversation openings are
    countable.  One row per edge: (from_role, to_role, n, n_convs).
    Exact longs — hash-oracle-able.

    Windows tie-break on (idx, role) — the module-wide convention
    that keeps duplicate turn indices engine-deterministic.

    Plan: one shuffle on conv for the lag window, then one count
    aggregation on the (from, to) pair (map-side partial agg)."""
    w = Window.partitionBy(conv_col).orderBy(F.col(idx_col), F.col(role_col))
    pairs = turns.select(
        F.col(conv_col).alias("__conv"),
        # normalize NULL roles to '' BEFORE the lag: only the true
        # first turn coalesces to the start marker, a NULL mid-dialog
        # role must not masquerade as a conversation start
        F.coalesce(
            F.lag(F.coalesce(F.col(role_col), F.lit(""))).over(w), F.lit(start_marker)
        ).alias("from_role"),
        F.coalesce(F.col(role_col), F.lit("")).alias("to_role"),
    )
    return pairs.groupBy("from_role", "to_role").agg(
        F.count("*").alias("n"),
        F.countDistinct("__conv").alias("n_convs"),
    )


def role_transitions_sql(
    table: str,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    start_marker: str = "<start>",
) -> str:
    """DuckDB twin of :func:`role_transitions` (same tie-break)."""
    m = start_marker.replace("'", "''")
    return f"""
SELECT from_role, to_role, count(*)::bigint AS n,
       count(DISTINCT conv)::bigint AS n_convs
FROM (
  SELECT {conv_col} AS conv,
         coalesce(lag(coalesce({role_col}, '')) OVER (PARTITION BY {conv_col}
                  ORDER BY {idx_col} NULLS FIRST, {role_col} NULLS FIRST),
                  '{m}') AS from_role,
         coalesce({role_col}, '') AS to_role
  FROM {table}
)
GROUP BY from_role, to_role
""".strip()

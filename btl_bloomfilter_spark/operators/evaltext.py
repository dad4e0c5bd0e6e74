"""Paired-text overlap metrics (ROUGE-N family), integer-exact.

The transcript-eval primitive the kit lacked: given (candidate,
reference) text pairs — model response vs gold response, rewritten
turn vs original, summary vs source — score n-gram overlap the way
ROUGE-N (Lin, ACL'04) and BLEU's modified n-gram precision
(Papineni, ACL'02) do, with CLIPPED multiset counts:

    overlap    = Σ_g min(count_cand(g), count_ref(g))
    precision  = overlap / |cand n-grams|     (BLEU-n direction)
    recall     = overlap / |ref n-grams|      (ROUGE-N direction)
    f1         = 2·P·R/(P+R) = 2·overlap / (|cand| + |ref|)

The algebraic rewrite of F1 to ``2·o/(tc+tr)`` matters: every output
double is then a SINGLE division of exactly-integer-valued doubles
(the library's fixed-shape policy), so the whole metric
hash-oracles against the DuckDB twin — no geometric means, no libm.

Tokenization is the library-wide explicit whitespace class
(functions/textstats._WS — not ``\\s``, whose vertical-tab membership
differs between Java/Python and RE2) so Spark, DuckDB and Python
agree byte-for-byte on token boundaries.

Pairs where either side has ZERO n-grams (empty/whitespace text, or
fewer than n tokens) are EXCLUDED — P or R is undefined there — the
same degenerate-group convention as operators/stats.

Scale shape: n-gram assembly is pure codegen (split + slice/join
over arrays, no Python); the explode feeds a map-side-combined
(pair-id, gram) count with two conditional sums, then one pair-sized
aggregate.  Nothing bigger than (pairs × distinct grams) ever
shuffles, and gram rows collapse map-side under repetition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import _WS

_D = "decimal(19,0)"


def _tokens_expr(col: str):
    """Token array on the shared whitespace class.

    Built with Python-level pyspark functions, NOT F.expr: a regex
    routed through a SQL string literal is re-escaped by the SQL
    parser (``\\x0B`` is not a SQL escape), silently corrupting the
    whitespace class into one containing literal x/0/B — caught by
    the cross-engine test on vocab containing '0'."""
    return F.filter(
        F.split(F.coalesce(F.col(col), F.lit("")), rf"[{_WS}]+"),
        lambda x: x != "",
    )


def _grams_from_tokens(toks, n: int):
    """Space-joined n-grams from a token-array COLUMN (empty when
    < n tokens).  Kept separate from tokenization so the regex split
    is materialized once per row in its own projection — inlining it
    here made Catalyst evaluate the split up to 3× per row (size
    twice + slice), measured 1.9× slower on the bench corpus."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _grams_sql(col: str, n: int) -> str:
    toks = f"list_filter(string_split_regex(coalesce({col}, ''), '[{_WS}]+'), x -> x <> '')"
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n} + 2, 1)), "
        f"i -> array_to_string(({toks})[i:i + {n} - 1], ' '))"
    )


def rouge_n(
    df: DataFrame,
    id_cols: list[str],
    cand_col: str,
    ref_col: str,
    *,
    n: int = 1,
) -> DataFrame:
    """Per-pair ROUGE-N / BLEU-n overlap scores.

    ``id_cols`` must identify pairs uniquely (duplicate ids would
    merge distinct pairs' gram counts — same contract as every
    keyed operator here).  Returns (id…, cand_grams, ref_grams,
    overlap, precision, recall, f1) with the three doubles each one
    exact-integer division.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not id_cols:
        raise ValueError("id_cols must be non-empty")
    sides = (
        df.select(
            *id_cols,
            F.explode(
                F.array(
                    F.struct(F.lit(1).alias("is_cand"), F.col(cand_col).alias("t")),
                    F.struct(F.lit(0).alias("is_cand"), F.col(ref_col).alias("t")),
                )
            ).alias("__side"),
        )
        .select(
            *id_cols,
            F.col("__side.is_cand").alias("__is_cand"),
            _tokens_expr("__side.t").alias("__toks"),
        )
        .select(
            *id_cols,
            "__is_cand",
            F.explode(_grams_from_tokens(F.col("__toks"), n)).alias("__gram"),
        )
    )
    per_gram = sides.groupBy(*id_cols, "__gram").agg(
        F.sum(F.col("__is_cand")).cast(_D).alias("__c"),
        F.sum(F.lit(1) - F.col("__is_cand")).cast(_D).alias("__r"),
    )
    agg = per_gram.groupBy(*id_cols).agg(
        F.sum(F.least("__c", "__r")).alias("__o"),
        F.sum("__c").alias("__tc"),
        F.sum("__r").alias("__tr"),
    )
    o, tc, tr = F.col("__o"), F.col("__tc"), F.col("__tr")
    return agg.where((tc > 0) & (tr > 0)).select(
        *id_cols,
        tc.cast("long").alias("cand_grams"),
        tr.cast("long").alias("ref_grams"),
        o.cast("long").alias("overlap"),
        (o.cast("double") / tc.cast("double")).alias("precision"),
        (o.cast("double") / tr.cast("double")).alias("recall"),
        (
            (F.lit(2).cast(_D) * o).cast("double")
            / (tc + tr).cast("double")
        ).alias("f1"),
    )


def rouge_n_sql(
    table: str,
    id_col: str,
    cand_col: str,
    ref_col: str,
    *,
    n: int = 1,
) -> str:
    """DuckDB twin of :func:`rouge_n` (single id expression — the
    test-scale twin; identical tokenization and division shapes)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return f"""
        WITH sides AS (
            SELECT {id_col} AS id, 1 AS is_cand,
                   unnest({_grams_sql(cand_col, n)}) AS gram
            FROM {table}
            UNION ALL
            SELECT {id_col} AS id, 0 AS is_cand,
                   unnest({_grams_sql(ref_col, n)}) AS gram
            FROM {table}
        ),
        per_gram AS (
            SELECT id, gram,
                   sum(is_cand)::hugeint AS c,
                   sum(1 - is_cand)::hugeint AS r
            FROM sides GROUP BY id, gram
        ),
        agg AS (
            SELECT id, sum(least(c, r)) AS o, sum(c) AS tc, sum(r) AS tr
            FROM per_gram GROUP BY id
        )
        SELECT id AS {id_col},
               CAST(tc AS BIGINT) AS cand_grams,
               CAST(tr AS BIGINT) AS ref_grams,
               CAST(o AS BIGINT) AS overlap,
               CAST(o AS DOUBLE) / CAST(tc AS DOUBLE) AS precision,
               CAST(o AS DOUBLE) / CAST(tr AS DOUBLE) AS recall,
               CAST(2 * o AS DOUBLE) / CAST(tc + tr AS DOUBLE) AS f1
        FROM agg WHERE tc > 0 AND tr > 0
    """


def token_edit_stats(
    df: DataFrame,
    id_cols: list[str],
    cand_col: str,
    ref_col: str,
) -> DataFrame:
    """Token-level edit distance and WER per (candidate, reference)
    pair — the sequence-eval companion to :func:`rouge_n` (bag
    overlap): ROUGE can't see word ORDER, WER can.

    WER = levenshtein(cand tokens, ref tokens) / |ref tokens| — the
    standard ASR/generation metric.  Token sequences (shared
    whitespace class) are compared with a full Wagner-Fischer DP in
    an Arrow-batched kernel, vectorized over the DP row (numpy min
    reductions; no per-cell Python).  This is one of the genuinely
    non-SQL-expressible operators: Spark's ``levenshtein`` is
    character-level and DuckDB's counts bytes, and no fixed-width
    re-encoding preserves token-level distances exactly — so the
    board query is rows-only with an EXACT planted gate instead of a
    SQL twin (substitution-only planted mutations make the expected
    distance exactly the mutation count).

    Pairs where the reference has zero tokens are excluded (WER
    undefined); an empty candidate against a non-empty reference is
    valid (distance = |ref|, WER = 1).  Returns (id…, cand_len,
    ref_len, edit_distance, wer).

    Scale shape: pure map over Arrow batches (no shuffle), cost
    O(|cand|·|ref|) per pair — the per-pair DP is the algorithmic
    floor for exact edit distance; thresholded/banded variants live
    in operators/editjoin for the join use-case.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if not id_cols:
        raise ValueError("id_cols must be non-empty")
    ws = str(_WS).encode().decode("unicode_escape")

    def _toks(s):
        if s is None:
            return []
        for c in ws[1:]:
            s = s.replace(c, " ")
        return [t for t in s.split(" ") if t]

    # no type hints: pd is function-scoped, and pandas_udf resolves
    # string hints in module globals (falls back to SCALAR eval type)
    @pandas_udf("long")
    def kernel(cand, ref):
        out_d = []
        for c, r in zip(cand, ref):
            a, b = _toks(c), _toks(r)
            n, m = len(a), len(b)
            if n == 0 or m == 0:
                out_d.append(max(n, m))
                continue
            # Wagner-Fischer, one numpy row per cand token: interning
            # tokens to int codes makes the equality test a vector op
            vocab = {}
            ca = np.fromiter((vocab.setdefault(t, len(vocab)) for t in a), np.int32, n)
            cb = np.fromiter((vocab.setdefault(t, len(vocab)) for t in b), np.int32, m)
            # row recurrence with the horizontal (insert) chain solved
            # in closed form: with t[j] = min(prev[j]+1, prev[j-1]+cost)
            # and t[0] = i, unrolling cur[j] = min(t[j], cur[j-1]+1)
            # gives cur[j] = min_{j'<=j} (t[j'] + (j-j')) — a single
            # minimum.accumulate over (t - j') plus j back.
            prev = np.arange(m + 1, dtype=np.int64)
            js = np.arange(m + 1, dtype=np.int64)
            t = np.empty(m + 1, dtype=np.int64)
            for i in range(1, n + 1):
                t[0] = i
                np.minimum(
                    prev[1:] + 1, prev[:-1] + (cb != ca[i - 1]), out=t[1:]
                )
                prev = np.minimum.accumulate(t - js) + js
            out_d.append(int(prev[-1]))
        return pd.Series(out_d)

    out = df.select(
        *id_cols,
        F.size(_tokens_expr(cand_col)).cast("long").alias("cand_len"),
        F.size(_tokens_expr(ref_col)).cast("long").alias("ref_len"),
        kernel(F.col(cand_col), F.col(ref_col)).alias("edit_distance"),
    )
    return out.where(F.col("ref_len") > 0).withColumn(
        "wer",
        F.col("edit_distance").cast("double") / F.col("ref_len").cast("double"),
    )

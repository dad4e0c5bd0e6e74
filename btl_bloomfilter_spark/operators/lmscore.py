"""Language-model quality scoring for corpus curation.

CCNet (Wenzek et al. 2020, §3.3) ranks web documents by the
perplexity of a language model trained on a trusted corpus and keeps
the head/middle of the distribution.  The real CCNet uses a KenLM
5-gram model; no LM runtime exists in this container, so this module
implements the same *pipeline shape* with a self-contained unigram
model with Laplace smoothing — an honest, fully-specified stand-in
whose scores are deterministic and cross-engine reproducible:

    p(t)      = (count(t) + 1) / (T + V + 1)        t in vocabulary
    p(OOV)    = 1 / (T + V + 1)
    nll(doc)  = mean over tokens of -ln p(t)

where T = total kept-token occurrences and V = kept vocabulary size
in the TRAINING corpus.  ``min_count`` trims the vocabulary (trimmed
terms score as OOV; T and V are post-trim, so the model is exactly
the one the table describes).

Determinism policy (stronger than round-6-after-sum used by BM25):
each per-token negative log-prob is quantized ONCE on the tiny LM
table — ``round(-ln(p) * 1e6)`` as a LONG ("micro-nats") — and the
per-document aggregate is a sum of longs, which is exact and
order-independent.  Engine disagreement would need Spark's
``Math.log`` and DuckDB's ``ln`` to fall on opposite sides of a
0.5e-6 grid boundary (~1 ulp apart at magnitude ~10: odds ~1e-9 per
distinct vocabulary entry).  The mean is two IEEE-exact double
divisions of exactly-representable longs, rounded to 6.

Plan shape (the 100-TB one):

    train:  one corpus scan -> explode -> groupBy(term) count
            (map-side partial agg; result is the vocabulary, tiny
            relative to the corpus by Heaps' law)
    score:  one candidate scan -> explode -> broadcast LM join ->
            groupBy(id) sum(long)
            (set ``broadcast_lm=False`` to shuffle-join instead when
            the vocabulary is too large to broadcast)

Train once, score many: pass the trained ``lm=`` to score other
shards without rescanning the training corpus — the same reuse
pattern as decontam's ``bloom=`` and novelty's ``ref_sh=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.spread import fan_out as _r6_fan_out

from ..functions.textstats import _WS

MICRO = 1_000_000


def _tokens(col: str, lowercase: bool) -> F.Column:
    c = F.coalesce(F.col(col), F.lit(""))
    if lowercase:
        c = F.lower(c)
    stripped = F.regexp_replace(c, rf"^[{_WS}]+|[{_WS}]+$", "")
    return F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, rf"[{_WS}]+")
    )


def _tokens_sql(col: str, lowercase: bool) -> str:
    c = f"coalesce({col}, '')"
    if lowercase:
        c = f"lower({c})"
    t = f"regexp_replace({c}, '^[{_WS}]+|[{_WS}]+$', '', 'g')"
    return f"(case when {t} = '' then []::varchar[] else string_split_regex({t}, '[{_WS}]+') end)"


def unigram_counts(
    df: DataFrame, col: str, *, lowercase: bool = True, min_count: int = 1
) -> DataFrame:
    """(term, cnt) over the training corpus — one scan, map-side
    partial agg.  ``min_count`` trims the tail of the vocabulary."""
    out = (
        df.select(F.explode(_tokens(col, lowercase)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        out = out.where(F.col("cnt") >= min_count)
    return out


def unigram_lm(
    df: DataFrame, col: str, *, lowercase: bool = True, min_count: int = 1
) -> tuple[DataFrame, int]:
    """Laplace-smoothed unigram LM: (term, nll_micro) plus the OOV
    floor in micro-nats.  nll_micro = round(-ln((cnt+1)/(T+V+1))*1e6)
    quantized here, once, so document aggregation is exact long
    arithmetic."""
    counts = unigram_counts(df, col, lowercase=lowercase, min_count=min_count)
    tot = counts.agg(
        F.sum("cnt").alias("T"), F.count(F.lit(1)).alias("V")
    ).collect()[0]
    t_tot, vocab = int(tot["T"] or 0), int(tot["V"] or 0)
    denom = float(t_tot + vocab + 1)
    lm = counts.select(
        "term",
        F.round(-F.log((F.col("cnt") + 1).cast("double") / F.lit(denom)) * MICRO, 0)
        .cast("long")
        .alias("nll_micro"),
    )
    import math

    oov_micro = round(-math.log(1.0 / denom) * MICRO)
    return lm, oov_micro


def lm_doc_scores(
    docs: DataFrame,
    col: str,
    id_col: str,
    *,
    lm: tuple[DataFrame, int] | None = None,
    lowercase: bool = True,
    min_count: int = 1,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the unigram LM
    (CCNet-style quality signal; LOWER = more typical of the training
    corpus).  Returns (id_col, n_tokens, oov_tokens, nll_micro_sum,
    mean_nll) — every document appears; empty documents carry
    n_tokens=0 and NULL mean_nll.

    ``lm=None`` trains on ``docs`` itself (corpus-typicality
    scoring); pass the result of :func:`unigram_lm` to score
    candidate shards against a fixed trusted corpus.
    """
    docs = _r6_fan_out(docs)  # no-op on healthy layouts; unsticks 1-row-group sources
    if lm is None:
        lm = unigram_lm(docs, col, lowercase=lowercase, min_count=min_count)
    lm_df, oov_micro = lm
    if broadcast_lm:
        lm_df = F.broadcast(lm_df)

    toks = docs.select(
        F.col(id_col).alias("__id"), F.explode(_tokens(col, lowercase)).alias("term")
    )
    scored = (
        toks.join(lm_df, "term", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("nll_micro").isNull(), 1).otherwise(0)).alias(
                "oov_tokens"
            ),
            F.sum(F.coalesce(F.col("nll_micro"), F.lit(oov_micro))).alias(
                "nll_micro_sum"
            ),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(scored, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("oov_tokens", F.lit(0)).alias("oov_tokens"),
            F.coalesce("nll_micro_sum", F.lit(0)).alias("nll_micro_sum"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.col("nll_micro_sum").cast("double")
                    / F.col("n_tokens").cast("double")
                    / MICRO,
                    6,
                ),
            ).alias("mean_nll"),
        )
    )


def lm_doc_scores_sql(
    table: str,
    col: str,
    id_col: str,
    *,
    lowercase: bool = True,
    min_count: int = 1,
) -> str:
    """DuckDB twin of the self-trained :func:`lm_doc_scores` — the
    identical staged construction (counts -> totals -> quantized LM ->
    left join -> exact long sum), for oracle checks."""
    toks = _tokens_sql(col, lowercase)
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, unnest({toks}) AS term FROM {table}
),
counts AS (
  SELECT term, count(*) AS cnt FROM toks GROUP BY term HAVING count(*) >= {min_count}
),
tot AS (
  SELECT coalesce(sum(cnt), 0)::bigint AS t_tot, count(*)::bigint AS v FROM counts
),
lm AS (
  SELECT term,
         round(-ln((cnt + 1)::double / (t_tot + v + 1)::double) * 1000000.0)::bigint
           AS nll_micro
  FROM counts, tot
),
oov AS (
  SELECT round(-ln(1.0 / (t_tot + v + 1)::double) * 1000000.0)::bigint AS m FROM tot
),
scored AS (
  SELECT t.id, count(*) AS n_tokens,
         sum(CASE WHEN lm.term IS NULL THEN 1 ELSE 0 END)::bigint AS oov_tokens,
         sum(coalesce(lm.nll_micro, oov.m))::bigint AS nll_micro_sum
  FROM toks t LEFT JOIN lm ON t.term = lm.term, oov
  GROUP BY t.id
)
SELECT d.{id_col},
       coalesce(s.n_tokens, 0)::bigint AS n_tokens,
       coalesce(s.oov_tokens, 0)::bigint AS oov_tokens,
       coalesce(s.nll_micro_sum, 0)::bigint AS nll_micro_sum,
       CASE WHEN s.n_tokens > 0
            THEN round(s.nll_micro_sum::double / s.n_tokens::double / 1000000.0, 6)
       END AS mean_nll
FROM {table} d LEFT JOIN scored s ON d.{id_col} = s.id
""".strip()

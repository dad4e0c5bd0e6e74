"""BM25 query scoring over a document corpus.

The retrieval primitive a training-data pipeline uses to pull
topically-relevant documents out of a web-scale corpus (targeted
curation, probe-set expansion, relevance-weighted sampling).
Okapi BM25 (Robertson & Zaragoza 2009, §3.3):

    score(d, Q) = sum over t in Q of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))

Plan shape (the 100-TB one):

    agg(count, avg(doc_len))            one corpus scan, map-side
                                        partial agg -> 2 scalars
    explode words, FILTER to query      filter applies before the
      terms, groupBy(id, dl, term)      shuffle: only query-term
                                        tokens ever leave the map
                                        stage (a handful per doc)
    groupBy(term) doc-frequency         <= |Q| result rows
    broadcast(df table) join            no shuffle
    groupBy(id) sum                     per-(id,term) rows, tiny

Doc length rides the explode as a grouping column (functionally
dependent on id) so no corpus-wide length join is needed.  The final
ranking is on (round(score, 6) DESC, id ASC) — rounding before the
ordering makes the top-n selection reproducible across engines
(last-ulp ln() differences cannot flip it), same policy as
tfidf.top_terms_tfidf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..plans.spread import fan_out as _r6_fan_out

from ..functions.textstats import _WS


def _words(col: str, lowercase: bool) -> F.Column:
    c = F.coalesce(F.col(col), F.lit(""))
    if lowercase:
        c = F.lower(c)
    stripped = F.regexp_replace(c, rf"^[{_WS}]+|[{_WS}]+$", "")
    return F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, rf"[{_WS}]+")
    )


def bm25_scores(
    df: DataFrame,
    col: str,
    id_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Score every document containing >= 1 query term; returns
    (id_col, n_terms_matched, bm25, score_rank) with bm25 rounded to
    6 decimals and score_rank dense over (bm25 DESC, id ASC).
    ``top_n`` keeps the best n documents (deterministic under ties).

    Terms are matched exactly against whitespace tokens (lowercased
    when ``lowercase``); a query term absent from the corpus simply
    contributes nothing.
    """
    df = _r6_fan_out(df)  # no-op on healthy layouts; unsticks 1-row-group sources
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() if lowercase else t for t in query_terms})

    words = _words(col, lowercase)
    stats = df.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size(words)).alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["avgdl"] or 0.0

    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.size(words).alias("dl"),
            F.explode(words).alias("term"),
        )
        .where(F.col("term").isin(terms))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # doc frequency as a count-window over tf (one row per (id, term))
    # rather than tf.groupBy(term) joined back: the latter would give
    # the dfreq branch its OWN scan+explode of the corpus — a full
    # extra pass at 100 TB.  The window only reshuffles the tiny tf
    # table on term.
    with_df = tf.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("doc_freq") + 0.5) / (F.col("doc_freq") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl or 1.0)))
    per_term = idf * F.col("tf") * (k1 + 1) / denom

    scored = with_df.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(F.sum(per_term), 6).alias("bm25"),
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("id").asc())
    if top_n is not None:
        # TakeOrderedAndProject: per-partition top-n, no
        # single-partition shuffle of the full scored set; the rank
        # window then runs over <= top_n rows
        out = scored.orderBy(F.col("bm25").desc(), F.col("id").asc()).limit(top_n)
        out = out.withColumn("score_rank", F.row_number().over(w))
    else:
        # full ranking: inherently a global sort of the scored set
        # (matched documents only, not the corpus)
        out = scored.withColumn("score_rank", F.row_number().over(w))
    return out.select(
        F.col("id").alias(id_col), "n_terms_matched", "bm25", "score_rank"
    )


def bm25_scores_sql(
    table: str,
    col: str,
    id_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int | None = None,
) -> str:
    """DuckDB twin (lowercase=True variant) — staged identically so
    the rounded scores hash-match the Spark output."""
    terms = sorted({t.lower() for t in query_terms})
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    t = f"regexp_replace(lower(coalesce({col}, '')), '^[{_WS}]+|[{_WS}]+$', '', 'g')"
    words = f"(case when {t} = '' then [] else string_split_regex({t}, '[{_WS}]+') end)"
    limit = f"WHERE score_rank <= {top_n}" if top_n is not None else ""
    return f"""
        WITH stats AS (
            SELECT count(*) AS n, avg(len({words})) AS avgdl FROM {table}
        ),
        toks AS (
            SELECT {id_col} AS id, len({words}) AS dl, unnest({words}) AS term
            FROM {table}
        ),
        tf AS (
            SELECT id, dl, term, count(*) AS tf FROM toks
            WHERE term IN ({tlist}) GROUP BY id, dl, term
        ),
        dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
        scored AS (
            SELECT tf.id,
                   count(*) AS n_terms_matched,
                   round(sum(
                       ln(1 + (stats.n - dfreq.doc_freq + 0.5) / (dfreq.doc_freq + 0.5))
                       * tf.tf * ({k1} + 1)
                       / (tf.tf + {k1} * (1 - {b} + {b} * tf.dl / (CASE WHEN stats.avgdl = 0 THEN 1.0 ELSE stats.avgdl END)))
                   ), 6) AS bm25
            FROM tf JOIN dfreq USING (term) CROSS JOIN stats
            GROUP BY tf.id
        ),
        ranked AS (
            SELECT id AS {id_col}, n_terms_matched, bm25,
                   row_number() OVER (ORDER BY bm25 DESC, id ASC) AS score_rank
            FROM scored
        )
        SELECT * FROM ranked {limit}
    """

"""TF-IDF top terms per document.

Classic corpus-analytics operator: characterize each document by its
most significant terms.  Plan shape (the 100-TB one):

    explode words → groupBy(doc, term) count        (shuffle 1: tf)
    → groupBy(term) doc-frequency                   (shuffle 2, small out)
    → broadcast(df table) join back onto tf         (no shuffle)
    → per-doc top-k via rank window                 (WindowGroupLimit:
                                                     map-side top-k)

Ranking is deliberately INTEGER-KEYED — (tf DESC, df ASC, term ASC):
highest in-document frequency first, rarer corpus-wide first on ties,
lexicographic last.  Ordering by the float tf-idf score itself would
make the top-k selection sensitive to last-ulp ln() differences
between engines; with integer ordering the selection is exactly
reproducible and the smooth-IDF score (sklearn formula
``ln((N+1)/(df+1)) + 1``) rides along as an informational column,
rounded to 6 for cross-engine hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.textstats import _WS


def top_terms_tfidf(
    df: DataFrame,
    col: str,
    id_col: str,
    *,
    k: int = 5,
    min_df: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Per document: the k most significant terms as
    (id, term, tf, doc_freq, tfidf, term_rank).

    ``min_df`` drops terms appearing in fewer documents (noise/typos
    at corpus scale).  N (corpus size) is computed with one count —
    the only driver-side scalar.
    """
    c = F.coalesce(F.col(col), F.lit(""))
    if lowercase:
        c = F.lower(c)
    words = F.when(
        F.regexp_replace(c, rf"^[{_WS}]+|[{_WS}]+$", "") == "",
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.regexp_replace(c, rf"^[{_WS}]+|[{_WS}]+$", ""), rf"[{_WS}]+"))
    n_docs = df.count()

    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(words).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("doc_freq") >= min_df)
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("doc_freq") + 1)) + 1),
            6,
        ),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("tf").desc(), F.col("doc_freq").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(
            F.col("id").alias(id_col), "term", "tf", "doc_freq", "tfidf", "term_rank"
        )
    )


def top_terms_tfidf_sql(
    table: str, col: str, id_col: str, *, k: int = 5, min_df: int = 1
) -> str:
    """DuckDB twin (lowercase=True variant)."""
    t = f"regexp_replace(lower(coalesce({col}, '')), '^[{_WS}]+|[{_WS}]+$', '', 'g')"
    words = f"(case when {t} = '' then [] else string_split_regex({t}, '[{_WS}]+') end)"
    return f"""
        WITH toks AS (
            SELECT {id_col} AS id, unnest({words}) AS term FROM {table}
        ),
        tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term),
        dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term
                  HAVING count(*) >= {min_df}),
        n AS (SELECT count(*) AS n_docs FROM {table}),
        scored AS (
            SELECT tf.id, tf.term, tf.tf, dfreq.doc_freq,
                   round(tf.tf * (ln((n.n_docs + 1)::double / (dfreq.doc_freq + 1)) + 1), 6) AS tfidf,
                   row_number() OVER (PARTITION BY tf.id ORDER BY
                       tf.tf DESC, dfreq.doc_freq ASC, tf.term ASC) AS term_rank
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT id AS {id_col}, term, tf, doc_freq, tfidf, term_rank
        FROM scored WHERE term_rank <= {k}
    """


def tfidf_query_scores(
    df: DataFrame,
    col: str,
    id_col: str,
    query_terms: list[str],
    *,
    top_n: int | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """TF-IDF query scoring — the lexical sibling of
    ``bm25.bm25_scores`` with this module's smooth IDF
    (``ln((N+1)/(df+1)) + 1``, sklearn formula):
    ``score(d, Q) = sum over t in Q of tf(t, d) * idf(t)``.

    Returns ``(id_col, n_terms_matched, tfidf_micro, tfidf,
    score_rank)``.  Fixed-point policy (stricter than bm25_scores'
    round-6-after-sum precedent): each per-term contribution is
    quantized ONCE to micro-units (``floor(tf·idf·10^6)`` as long) and
    summed as LONGS, so the score and the (tfidf_micro DESC, id ASC)
    rank are exact and partition-invariant — a float sum's
    partition-order ulp wobble at a rounding boundary could otherwise
    flip score_rank and, through rrf_fuse, q107's whole fused output.
    The ``tfidf`` double is derived from the long by one division.
    Same 100-TB plan shape as bm25_scores: one corpus count, explode
    with the query-term filter BELOW the first shuffle (only matching
    tokens leave the map stage), doc-frequency as a count-window over
    the tiny tf table, per-doc sum; ``top_n`` via
    TakeOrderedAndProject.  Exists chiefly as the second system for
    ``fusion.rrf_fuse`` (q107): two genuinely different lexical
    scorers over one query.
    """
    from .bm25 import _words

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() if lowercase else t for t in query_terms})
    n_docs = df.count()

    words = _words(col, lowercase)
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(words).alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    with_df = tf.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    per_term_micro = F.floor(
        F.col("tf")
        * (F.log(F.lit(float(n_docs + 1)) / (F.col("doc_freq") + 1)) + 1)
        * F.lit(1000000.0)
    ).cast("long")
    scored = with_df.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.sum(per_term_micro).alias("tfidf_micro"),
    )
    w = Window.orderBy(F.col("tfidf_micro").desc(), F.col("id").asc())
    if top_n is not None:
        out = scored.orderBy(F.col("tfidf_micro").desc(), F.col("id").asc()).limit(top_n)
    else:
        out = scored
    return out.withColumn("score_rank", F.row_number().over(w)).select(
        F.col("id").alias(id_col),
        "n_terms_matched",
        "tfidf_micro",
        (F.col("tfidf_micro") / F.lit(1000000.0)).alias("tfidf"),
        "score_rank",
    )


def tfidf_query_scores_sql(
    table: str,
    col: str,
    id_col: str,
    query_terms: list[str],
    *,
    top_n: int | None = None,
) -> str:
    """DuckDB twin (lowercase=True variant), staged identically."""
    terms = sorted({t.lower() for t in query_terms})
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    t = f"regexp_replace(lower(coalesce({col}, '')), '^[{_WS}]+|[{_WS}]+$', '', 'g')"
    words = f"(case when {t} = '' then [] else string_split_regex({t}, '[{_WS}]+') end)"
    limit = f"WHERE score_rank <= {top_n}" if top_n is not None else ""
    return f"""
        WITH qstats AS (SELECT count(*) AS n FROM {table}),
        qtoks AS (
            SELECT {id_col} AS id, unnest({words}) AS term FROM {table}
        ),
        qtf AS (
            SELECT id, term, count(*) AS tf FROM qtoks
            WHERE term IN ({tlist}) GROUP BY id, term
        ),
        qdfreq AS (SELECT term, count(*) AS doc_freq FROM qtf GROUP BY term),
        qscored AS (
            SELECT qtf.id,
                   count(*) AS n_terms_matched,
                   sum(CAST(floor(qtf.tf * (ln(CAST(qstats.n + 1 AS DOUBLE) / (qdfreq.doc_freq + 1)) + 1) * 1000000.0) AS BIGINT)) AS tfidf_micro
            FROM qtf JOIN qdfreq USING (term) CROSS JOIN qstats
            GROUP BY qtf.id
        ),
        qranked AS (
            SELECT id AS {id_col}, n_terms_matched, tfidf_micro,
                   tfidf_micro / 1000000.0 AS tfidf,
                   row_number() OVER (ORDER BY tfidf_micro DESC, id ASC) AS score_rank
            FROM qscored
        )
        SELECT * FROM qranked {limit}
    """

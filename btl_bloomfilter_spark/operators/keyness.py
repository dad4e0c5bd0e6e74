"""Corpus-comparison keyness: which terms are DISTINCTIVE of corpus A
versus corpus B (Kilgarriff, IJCL 2001) — the corpus-linguistics stage
of training-data analysis: what vocabulary a new source adds, which
terms a filter pass is selecting for, how two snapshots differ.

Statistic: the 2x2 contingency chi-square per term.  Dunning's
log-likelihood ratio is the textbook alternative, but its c·ln(c)
terms are libm calls whose last ulp differs across engines; the
chi-square is a pure RATIONAL in the four cells, and with margins
(a+c) = N_a and (b+d) = N_b constant per comparison the whole
statistic collapses to

    chi2 = N · (a·N_b − b·N_a)² / (t · (N − t) · N_a · N_b)

with a/b = the term's occurrence counts, t = a + b, N = N_a + N_b —
every factor an exact integer (Spark decimal, DuckDB hugeint), and
the float ``chi2`` derived by ONE division of the two
correctly-rounded-converted doubles (the q103/stats.py pattern), so
it is bit-identical across engines and (chi2 desc, term) is a total,
engine-identical order.  ``enriched_in`` is the sign of
a·N_b − b·N_a — an exact integer comparison, never the float.
Overflow contract: N · (a·N_b − b·N_a)² < 1e38 — binds only past
~10^11 tokens per side; documented not enforced, like the rest of the
fixed-point family.

100-TB shape: each corpus is tokenized and exploded ONCE into
(term, tag) rows feeding a single map-side-combined groupBy(term) —
the only corpus-sized shuffle, already compressed to distinct terms;
the two token totals are one extra aggregate of that table (no second
scan), broadcast back as a one-row cross join.  Tokenization shares
functions/textstats._WS so the DuckDB twin splits byte-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from btl_bloomfilter_spark.functions.textstats import _WS, _clean, _clean_sql

__all__ = ["chi2_keyness", "chi2_keyness_sql"]

_D = "decimal(19,0)"


def _term_rows(df: DataFrame, text_col: str, tag: int) -> DataFrame:
    toks = F.split(_clean(text_col), rf"[{_WS}]+")
    return (
        df.select(F.explode(F.when(F.size(toks) >= 1, toks).otherwise(F.expr("array()"))).alias("term"))
        .where(F.col("term") != "")
        .withColumn("tag", F.lit(tag))
    )


def chi2_keyness(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    *,
    min_count: int = 5,
    top_n: int | None = None,
) -> DataFrame:
    """(term, cnt_a, cnt_b, n_a, n_b, enriched_in, chi2) for every
    term with cnt_a + cnt_b >= min_count, ordered by
    (chi2 desc, term), truncated to top_n when given."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    terms = _term_rows(df_a, text_col, 0).unionByName(_term_rows(df_b, text_col, 1))
    cnt = terms.groupBy("term").agg(
        F.sum(F.when(F.col("tag") == 0, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("tag") == 1, 1).otherwise(0)).alias("cnt_b"),
    )
    tot = cnt.agg(
        F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b")
    )
    a, b = F.col("cnt_a").cast(_D), F.col("cnt_b").cast(_D)
    na, nb = F.col("n_a").cast(_D), F.col("n_b").cast(_D)
    t = a + b
    n = na + nb
    diff = a * nb - b * na
    num = (n * diff * diff).cast("double")
    den = (t * (n - t) * na * nb).cast("double")
    out = (
        cnt.where(F.col("cnt_a") + F.col("cnt_b") >= F.lit(int(min_count)))
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.col("cnt_a").cast("long").alias("cnt_a"),
            F.col("cnt_b").cast("long").alias("cnt_b"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.when(diff > 0, F.lit("a"))
            .when(diff < 0, F.lit("b"))
            .otherwise(F.lit("-"))
            .alias("enriched_in"),
            F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias("chi2"),
        )
        .orderBy(F.desc("chi2"), "term")
    )
    return out.limit(int(top_n)) if top_n is not None else out


def chi2_keyness_sql(
    table_a: str,
    table_b: str,
    col: str,
    *,
    min_count: int = 5,
    top_n: int | None = None,
) -> str:
    """DuckDB twin: same split class, same collapsed statistic, hugeint
    products, one double division."""
    lim = f"LIMIT {int(top_n)}" if top_n is not None else ""

    def terms(tbl: str, tag: int) -> str:
        t = _clean_sql(col)
        return (
            f"SELECT unnest(string_split_regex({t}, '[{_WS}]+')) AS term, {tag} AS tag "
            f"FROM {tbl}"
        )

    return f"""(
        WITH terms AS (
            SELECT term, tag FROM ({terms(table_a, 0)} UNION ALL {terms(table_b, 1)}) u
            WHERE term <> ''
        ),
        cnt AS (
            SELECT term,
                   sum(CASE WHEN tag = 0 THEN 1 ELSE 0 END) AS cnt_a,
                   sum(CASE WHEN tag = 1 THEN 1 ELSE 0 END) AS cnt_b
            FROM terms GROUP BY term
        ),
        tot AS (SELECT sum(cnt_a) AS n_a, sum(cnt_b) AS n_b FROM cnt)
        SELECT term,
               CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               CASE WHEN cnt_a::HUGEINT * n_b::HUGEINT > cnt_b::HUGEINT * n_a::HUGEINT THEN 'a'
                    WHEN cnt_a::HUGEINT * n_b::HUGEINT < cnt_b::HUGEINT * n_a::HUGEINT THEN 'b'
                    ELSE '-' END AS enriched_in,
               CASE WHEN (cnt_a + cnt_b) > 0 AND (n_a + n_b - cnt_a - cnt_b) > 0
                         AND n_a > 0 AND n_b > 0 THEN
                 CAST((n_a::HUGEINT + n_b::HUGEINT)
                      * (cnt_a::HUGEINT * n_b::HUGEINT - cnt_b::HUGEINT * n_a::HUGEINT)
                      * (cnt_a::HUGEINT * n_b::HUGEINT - cnt_b::HUGEINT * n_a::HUGEINT) AS DOUBLE)
                 / CAST((cnt_a::HUGEINT + cnt_b::HUGEINT)
                        * (n_a::HUGEINT + n_b::HUGEINT - cnt_a::HUGEINT - cnt_b::HUGEINT)
                        * n_a::HUGEINT * n_b::HUGEINT AS DOUBLE)
               ELSE 0.0 END AS chi2
        FROM cnt CROSS JOIN tot
        WHERE cnt_a + cnt_b >= {int(min_count)}
        ORDER BY chi2 DESC, term
        {lim}
    )"""

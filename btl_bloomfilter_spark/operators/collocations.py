"""PMI-style collocation mining: corpus bigram association by exact
observed/expected lift (Church & Hanks, CL 1990).

Phrase discovery for tokenizer/vocab decisions: which adjacent word
pairs co-occur far more than their margins predict ("new york",
"machine learning").  The classical score is PMI = ln of the
observed/expected ratio; ln is a LIBM call whose last ulp differs
across engines, so this module applies the fixed-point policy one
step earlier and never takes the log at all: since ln is monotone,
ranking by the RATIO is ranking by PMI, and the ratio of exact
integer counts is hash-oracle-able.

    lift = (c_xy · N) / (c_x · c_y)

over the 2x2 contingency margins of the bigram table itself: c_xy =
count of the ordered pair, c_x = count of bigrams with w1 = x (left
margin), c_y = count of bigrams with w2 = y (right margin), N = total
bigrams.  Exactness (the q103/stats.py pattern): both products are
exact integer arithmetic — Spark decimal (a product of two int64
counts always fits decimal(38,0)), DuckDB hugeint — and the float
``lift`` is DERIVED by one division of the two exactly-converted
doubles: int→double conversion and / are correctly rounded, so the
doubles are bit-identical across engines and the (lift desc, w1, w2)
ordering is total and engine-identical.  Overflow contract:
c_xy · N < 1e38 (N up to ~1e19 at c_xy ≤ N — far beyond any corpus),
documented not enforced, like the rest of the fixed-point family.

100-TB shape: raw rows are touched ONCE — tokenize + one explode into
bigram rows, then groupBy(w1, w2).count with map-side partial
combine (the only corpus-sized shuffle, already compressed to
distinct pairs).  Both margins and the total derive FROM the pair
table: two vocab-sized aggregations and two vocab-sized equi-joins,
plus a one-row total broadcast.  Nothing row-shaped moves twice.
Tokenization shares the library-wide explicit whitespace class
(functions/textstats._WS) so the DuckDB twin splits byte-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from btl_bloomfilter_spark.functions.textstats import _WS, _clean, _clean_sql

__all__ = ["collocations", "collocations_sql"]

_D = "decimal(19,0)"  # count; pairwise products promote to decimal(38,0)


def collocations(
    df: DataFrame,
    text_col: str,
    *,
    min_count: int = 5,
    top_n: int | None = None,
) -> DataFrame:
    """(w1, w2, c_xy, c_x, c_y, n_pairs, lift) for every ordered
    adjacent pair with c_xy >= min_count; ordered by
    (lift desc, w1, w2), truncated to top_n when given."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    words = df.select(
        F.split(_clean(text_col), rf"[{_WS}]+").alias("__cw")
    )
    pairs = F.when(
        F.size("__cw") >= 2,
        F.expr(
            "transform(sequence(0, size(__cw) - 2), "
            "i -> struct(__cw[i] AS w1, __cw[i + 1] AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    big = words.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    cnt = big.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    lm = cnt.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    rm = cnt.groupBy("w2").agg(F.sum("c_xy").alias("c_y"))
    tot = cnt.agg(F.sum("c_xy").alias("n_pairs"))
    out = (
        cnt.where(F.col("c_xy") >= F.lit(int(min_count)))
        .join(lm, "w1")
        .join(rm, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            (
                (F.col("c_xy").cast(_D) * F.col("n_pairs").cast(_D)).cast("double")
                / (F.col("c_x").cast(_D) * F.col("c_y").cast(_D)).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
    )
    return out.limit(int(top_n)) if top_n is not None else out


def collocations_sql(
    table: str, col: str, *, min_count: int = 5, top_n: int | None = None
) -> str:
    """DuckDB twin: same split class, same margins-from-pair-table
    construction, hugeint products, one double division."""
    t = _clean_sql(col)
    lim = f"LIMIT {int(top_n)}" if top_n is not None else ""
    return f"""(
        WITH words AS (
            SELECT string_split_regex({t}, '[{_WS}]+') AS w FROM {table}
        ),
        big AS (
            SELECT w[i] AS w1, w[i + 1] AS w2
            FROM words, LATERAL unnest(range(1, len(w))) AS t(i)
            WHERE len(w) >= 2
        ),
        cnt AS (SELECT w1, w2, count(*) AS c_xy FROM big GROUP BY w1, w2),
        lm AS (SELECT w1, sum(c_xy) AS c_x FROM cnt GROUP BY w1),
        rm AS (SELECT w2, sum(c_xy) AS c_y FROM cnt GROUP BY w2),
        tot AS (SELECT sum(c_xy) AS n_pairs FROM cnt)
        SELECT cnt.w1, cnt.w2,
               CAST(c_xy AS BIGINT) AS c_xy,
               CAST(c_x AS BIGINT) AS c_x,
               CAST(c_y AS BIGINT) AS c_y,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(c_xy::HUGEINT * n_pairs::HUGEINT AS DOUBLE)
                 / CAST(c_x::HUGEINT * c_y::HUGEINT AS DOUBLE) AS lift
        FROM cnt JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot
        WHERE c_xy >= {int(min_count)}
        ORDER BY lift DESC, cnt.w1, cnt.w2
        {lim}
    )"""

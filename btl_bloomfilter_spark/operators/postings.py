"""Positional inverted index and exact phrase search.

BM25/TF-IDF (`operators/bm25`, `operators/tfidf`) rank by bag-of-words
statistics; training-data curation also needs EXACT phrase evidence —
"which documents contain this literal word sequence" — for targeted
decontamination (a benchmark prompt is a phrase, not a bag), quote
tracing, and boilerplate hunting.  The classical structure is the
positional inverted index: (term, doc, sorted position list).  A
phrase [t_0 .. t_{n-1}] matches at start position p iff
p ∈ positions(t_0) ∩ (positions(t_1) - 1) ∩ … ∩ (positions(t_{n-1}) -
(n-1)) — the standard adjacency-intersection identity, which turns
phrase search into n posting lookups plus array intersections, never
a rescan of the text.

Tokenization is the library-wide whitespace convention shared with
bm25/tfidf (`bm25._words`, explicit `_WS` class), so the DuckDB twin
is character-identical and q130 hash-oracles the whole query.

100-TB shape: the index build is ONE shuffle (posexplode →
groupBy(term, doc) with map-side combine; the positions array is
value-compressed per (term, doc)).  Written partitionBy/bucketBy on
term, a phrase query reads n terms' postings — a pruned fraction of
the index — then runs the intersections in whole-stage codegen
(`array_intersect` over arrays, no row blowup: shifting is a
`transform`, candidates are bounded by the rarest term's doc list).
Searching ships only the tiny (term, idx) phrase table (broadcast).
No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.spread import fan_out as _r6_fan_out

from .bm25 import _words

__all__ = ["build_postings", "phrase_search"]


def build_postings(
    df: DataFrame, text_col: str, id_col: str, *, lowercase: bool = True
) -> DataFrame:
    """(term, doc, positions, tf): sorted 0-based token positions per
    (term, document) — one map-side-combined shuffle."""
    df = _r6_fan_out(df)  # no-op on healthy layouts; unsticks 1-row-group sources
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(_words(text_col, lowercase)).alias("pos", "term"),
    )
    return toks.groupBy("term", "doc").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count("*").alias("tf"),
    )


def phrase_search(
    postings: DataFrame, terms: list[str], *, lowercase: bool = True
) -> DataFrame:
    """Documents containing the exact phrase ``terms`` (adjacent, in
    order): (doc, n_matches, first_pos).  Duplicate words in the
    phrase are handled (each occurrence joins the postings under its
    own index shift).

    Plan: broadcast the (term, idx) phrase table onto the postings,
    shift each list by -idx in a codegen ``transform``, group by doc
    requiring all n phrase slots present, and fold ``array_intersect``
    over the idx-sorted lists — the intersection result IS the match
    start set.
    """
    if not terms:
        raise ValueError("phrase must have at least one term")
    if lowercase:
        terms = [t.lower() for t in terms]
    n = len(terms)
    spark = postings.sparkSession
    tdf = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], "term string, idx int"
    )
    hits = postings.join(F.broadcast(tdf), "term").select(
        "doc",
        "idx",
        F.transform("positions", lambda p: p - F.col("idx")).alias("shifted"),
    )
    grouped = hits.groupBy("doc").agg(
        F.count("*").alias("n_slots"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "shifted"))),
            lambda s: s["shifted"],
        ).alias("arrs"),
    )
    starts = F.aggregate(
        F.slice("arrs", 2, n - 1),
        F.element_at("arrs", 1),
        lambda acc, x: F.array_intersect(acc, x),
    )
    return (
        grouped.where(F.col("n_slots") == n)
        .select(
            "doc",
            F.size(starts).alias("n_matches"),
            F.array_min(starts).alias("first_pos"),
        )
        .where(F.col("n_matches") > 0)
    )

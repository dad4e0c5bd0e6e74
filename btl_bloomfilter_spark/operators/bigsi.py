"""BIGSI/COBS-style bit-sliced Bloom document index.

Bradley et al. (Nature Biotechnology 2019, "BIGSI") and Bingmann et
al. (SPIRE 2019, "COBS"): the reference ecosystem's answer to "which
of my MILLIONS of documents/samples contain this term set?" — one
small same-m Bloom filter PER DOCUMENT, stored transposed so a query
term reads h bit-ROWS instead of touching every per-doc filter:

    index[pos, doc] = 1  iff  one of the doc's tokens hashes to pos

A term's h row-reads ANDed give the per-doc presence bitmap; a
multi-term query sums presence per doc and applies a theta fraction
threshold (the BIGSI score).  Classic Bloom one-sidedness is
inherited per cell: no false negatives ever (gated in q122), false
positives at the per-doc rate (1 - e^{-h*n_d/m})^h.

Spark-first layout (COBS packing): documents get dense column ids;
64 docs pack into one int64 WORD per bit-position, so the index is a
plain DataFrame (pos, block, word) built by ONE explode +
groupBy(pos, block) with the algebraic bit_or aggregate — map-side
partial combine compresses each partition to at most m * nblocks rows
before the only shuffle.  Everything (hashing via the xxhash64
builtin, shifts, popcount-style bit walks) stays inside whole-stage
codegen; no Python touches the hot path.  The index is ~m/8 bytes per
64-doc block regardless of document sizes, and a query term reads
exactly h * nblocks rows — with the index written partitioned/sorted
by pos, that is a pruned scan, not a pass.

Sparse contract: (pos, block) rows whose word is all-zero are NOT
stored; the query's AND therefore requires count(rows) == h per
(term, block) — a missing row means some position has no bits in the
block, so no doc there contains the term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from btl_bloomfilter_spark.functions.textstats import _WS, _clean

__all__ = ["assign_doc_columns", "build_bigsi", "bigsi_search"]


def _positions(token_col, m: int, h: int, seed: int):
    """Array of h bit positions for a token: xxhash64(token, seed+i)
    mod m — JVM builtin, whole-stage codegen, deterministic."""
    return F.array(
        *[
            F.pmod(F.xxhash64(token_col, F.lit(int(seed) + i)), F.lit(int(m)))
            for i in range(int(h))
        ]
    )


def assign_doc_columns(df: DataFrame, id_col: str) -> DataFrame:
    """Validate that id_col is a dense [0, N) integer key and attach
    (block, colbit).  Density matters: column j of block b IS doc
    b*64+j, so lookups need no mapping table.  Validation is one
    cheap aggregate (max+1 == count == distinct would need a second
    shuffle; max+1 == count catches everything except permuted
    duplicates, which distinct-count the caller's key first)."""
    stats = df.agg(
        F.count("*").alias("n"),
        F.max(F.col(id_col).cast("long")).alias("mx"),
        F.min(F.col(id_col).cast("long")).alias("mn"),
    ).collect()[0]
    if stats["n"] == 0:
        raise ValueError("empty corpus")
    if stats["mn"] != 0 or stats["mx"] != stats["n"] - 1:
        raise ValueError(
            f"{id_col} must be dense [0, N): got min {stats['mn']}, "
            f"max {stats['mx']}, count {stats['n']}"
        )
    c = F.col(id_col).cast("long")
    return df.withColumn("__block", (c / 64).cast("long")).withColumn(
        "__colbit", (c % 64).cast("int")
    )


def build_bigsi(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    m: int = 4096,
    h: int = 2,
    seed: int = 0,
) -> DataFrame:
    """(pos, block, word) bit-sliced index over whitespace tokens.
    One explode + one bit_or groupBy (map-side combined) is all the
    corpus-sized work."""
    if m < 64 or h < 1:
        raise ValueError("need m >= 64 and h >= 1")
    docs = assign_doc_columns(df, id_col)
    toks = (
        docs.select(
            "__block",
            "__colbit",
            F.explode(F.split(_clean(text_col), rf"[{_WS}]+")).alias("token"),
        )
        .where(F.col("token") != "")
        .select(
            "__block",
            "__colbit",
            F.explode(_positions(F.col("token"), m, h, seed)).alias("pos"),
        )
    )
    return (
        toks.groupBy("pos", F.col("__block").alias("block"))
        .agg(
            # F.shiftleft takes only a literal shift; the SQL form
            # accepts a column
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), __colbit)")).alias("word")
        )
    )


def bigsi_search(
    spark_or_index,
    terms: list[str],
    *,
    m: int,
    h: int,
    seed: int = 0,
    theta_milli: int = 1000,
) -> DataFrame:
    """Docs whose Bloom rows contain >= theta_milli/1000 of the query
    terms: (doc, hits, n_terms, score, is_match ordered by doc).

    Distinct terms are hashed driver-side into a tiny (term, pos)
    relation broadcast against the index — h * |terms| * nblocks rows
    leave the scan (pos-pruned when the index is stored sorted by
    pos).  Per (term, block): AND of the h words, zero unless all h
    rows exist; per doc: bit-walk of the presence words via a codegen
    filter(sequence(0,63)) expression, then one small groupBy(doc).
    Threshold compare is integer milli arithmetic; `score` is the one
    derived double."""
    index = spark_or_index
    spark = index.sparkSession
    uniq = sorted({t for t in terms if t})
    if not uniq:
        raise ValueError("no non-empty query terms")
    if not 0 < theta_milli <= 1000:
        raise ValueError("theta_milli in (0, 1000]")
    n_terms = len(uniq)
    probe = spark.createDataFrame([(t,) for t in uniq], "term string").select(
        "term", F.explode(_positions(F.col("term"), m, h, seed)).alias("pos")
    )
    presence = (
        index.join(F.broadcast(probe), "pos")
        .groupBy("term", "block")
        .agg(F.bit_and("word").alias("w"), F.count("*").alias("c"))
        .select(
            "term",
            "block",
            F.when(F.col("c") == F.lit(int(h)), F.col("w"))
            .otherwise(F.lit(0).cast("long"))
            .alias("w"),
        )
        .where(F.col("w") != 0)
    )
    hits = (
        presence.select(
            "block",
            F.explode(
                F.expr("filter(sequence(0, 63), j -> ((w >> j) & 1) = 1)")
            ).alias("j"),
        )
        .select((F.col("block") * 64 + F.col("j")).alias("doc"))
        .groupBy("doc")
        .agg(F.count("*").alias("hits"))
    )
    return (
        hits.select(
            "doc",
            "hits",
            F.lit(n_terms).cast("long").alias("n_terms"),
            (F.col("hits").cast("double") / F.lit(float(n_terms))).alias("score"),
            (F.col("hits") * 1000 >= F.lit(int(theta_milli) * n_terms)).alias(
                "is_match"
            ),
        )
        .orderBy("doc")
    )

"""Corpus-level duplicated-line removal (CCNet-style boilerplate
stripping).

Wenzek et al. 2020 (CCNet, §3.1) deduplicate at the PARAGRAPH level
across the whole corpus: lines that recur in many documents are
navigation chrome, cookie banners, and license boilerplate — removing
them is the single highest-yield cleaning step on web text after URL
dedup.  This operator drops every line whose corpus-wide duplicate
count exceeds ``max_count`` and reassembles each document's surviving
lines in original order.

Plan shape (the 100-TB one) — two corpus scans, no corpus-corpus
join:

    scan 1: posexplode lines, md5,      shuffle 1 — map-side partial
      groupBy(hash) count,              combine, so only (hash, count)
      filter count > max_count          partials move; result = the
                                        HOT boilerplate set, tiny by
                                        construction
    scan 2: posexplode lines, md5,      broadcast LEFT join marks hot
      broadcast-join hot flag,          lines (pure map), then ONE
      groupBy(doc): count all /         shuffle on doc id carrying
      count kept / reassemble kept      only surviving line text
      in line order

Totals and cleaned text come from the same conditional aggregation
(collect_list skips the NULLed-out hot lines), so no separate totals
scan and no join of two corpus-cardinality tables.  The hot set is
broadcast because lines with count > max_count are few (boilerplate,
by definition); if a corpus degenerates (max_count=1 on a heavily
duplicated crawl) pass ``broadcast_hot=False`` for a shuffle join.
Reassembly joins with '\\n' — injection-safe because lines are split
ON '\\n' and therefore cannot contain it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _lines(col: str) -> F.Column:
    return F.split(F.coalesce(F.col(col), F.lit("")), "\n", -1)


def dedup_lines(
    df: DataFrame,
    col: str,
    id_col: str,
    *,
    max_count: int = 1,
    normalize: bool = True,
    broadcast_hot: bool = True,
) -> DataFrame:
    """Per document: (id_col, n_lines, n_kept_lines, clean_text) with
    every line whose corpus-wide occurrence count exceeds
    ``max_count`` removed (count counts every occurrence, including
    repeats within one document).

    ``normalize`` lowercases and strips each line before hashing —
    CCNet's near-match policy — while the REASSEMBLED text keeps the
    original bytes of surviving lines.  Documents whose every line is
    boilerplate come back with ``clean_text = ''``.
    """
    key = F.lower(F.trim(F.col("line"))) if normalize else F.col("line")

    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_lines(col)).alias("pos", "line"),
    ).withColumn("lh", F.md5(key))

    hot = (
        lines.groupBy("lh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > max_count)
        .select("lh", F.lit(True).alias("__hot"))
    )
    if broadcast_hot:
        hot = F.broadcast(hot)

    flagged = lines.join(hot, "lh", "left")
    keep = F.col("__hot").isNull()
    # original order without a window sort: collect (pos, line)
    # structs for surviving lines only (collect_list skips the NULLs
    # the hot lines become), array_sort on the leading pos field
    parts = F.array_sort(F.collect_list(F.when(keep, F.struct("pos", "line"))))
    return flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(keep, F.lit(1))).alias("n_kept_lines"),
        F.array_join(F.transform(parts, lambda s: s["line"]), "\n").alias("clean_text"),
    ).select(
        F.col("id").alias(id_col), "n_lines", "n_kept_lines", "clean_text"
    )


def dedup_lines_sql(
    table: str, col: str, id_col: str, *, max_count: int = 1, normalize: bool = True
) -> str:
    """DuckDB twin, staged identically (normalize=True default)."""
    key = "lower(trim(line))" if normalize else "line"
    # parallel unnests zip in DuckDB (no WITH ORDINALITY support)
    return f"""
        WITH lines AS (
            SELECT id, pos, line, md5({key}) AS lh
            FROM (
                SELECT {id_col} AS id,
                       unnest(range(len(string_split(coalesce({col}, ''), chr(10))))) AS pos,
                       unnest(string_split(coalesce({col}, ''), chr(10))) AS line
                FROM {table}
            )
        ),
        hot AS (
            SELECT lh FROM lines GROUP BY lh HAVING count(*) > {max_count}
        ),
        flagged AS (
            SELECT l.id, l.pos, l.line, (h.lh IS NOT NULL) AS is_hot
            FROM lines l LEFT JOIN hot h USING (lh)
        )
        SELECT id AS {id_col},
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(CASE WHEN NOT is_hot THEN 1 END) AS BIGINT) AS n_kept_lines,
               coalesce(string_agg(CASE WHEN NOT is_hot THEN line END, chr(10) ORDER BY pos), '') AS clean_text
        FROM flagged GROUP BY id
    """

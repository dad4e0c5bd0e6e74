"""Corpus snapshot diff: what changed between two versions of a table.

The release-engineering primitive of a training-data pipeline: before
shipping crawl N+1, list what was added, removed, or content-changed
vs crawl N — by key and content fingerprint, never by row-to-row
comparison of the texts themselves.

Plan shape (100-TB): each side collapses to (key, md5 fingerprint)
map-side — a fingerprint per document, not the document — then ONE
full outer join on the key.  With ``include_unchanged=False``
(default) the dominant unchanged mass is filtered immediately after
the join; nothing document-sized ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_col: str,
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """(key, status, old_fp, new_fp) per key across two snapshots.

    status: 'added' (key only in ``new``), 'removed' (only in
    ``old``), 'changed' (both, different content md5), 'unchanged'
    (emitted only with ``include_unchanged=True`` — at scale the
    unchanged mass dominates and is usually not wanted as output).

    Keys are assumed unique per snapshot (the snapshot invariant); a
    duplicated key would make 'the' fingerprint ambiguous, so each
    side aggregates ``count(*)`` per key and the plan embeds a
    raise on duplicates rather than silently picking one row.
    """

    def side(df: DataFrame, fp_name: str) -> DataFrame:
        agg = df.groupBy(F.col(key_col).alias("__k")).agg(
            F.min(F.md5(F.encode(F.coalesce(F.col(content_col), F.lit("")), "UTF-8"))).alias(fp_name),
            F.count(F.lit(1)).alias("__n"),
        )
        return agg.select(
            "__k",
            F.when(
                F.col("__n") > 1,
                F.raise_error(
                    F.concat(
                        F.lit(f"corpus_diff: duplicate {key_col} in snapshot: "),
                        F.col("__k").cast("string"),
                    )
                ),
            ).otherwise(F.col(fp_name)).alias(fp_name),
        )

    o = side(old, "old_fp")
    n = side(new, "new_fp")
    out = o.join(n, "__k", "full_outer").select(
        F.col("__k").alias(key_col),
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_fp",
        "new_fp",
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def corpus_diff_sql(
    old_table: str,
    new_table: str,
    key_col: str,
    content_col: str,
    *,
    include_unchanged: bool = False,
) -> str:
    """DuckDB twin of :func:`corpus_diff` (same fingerprints, same
    status derivation; assumes the duplicate-key invariant the Spark
    side enforces)."""
    unchanged = "" if include_unchanged else "WHERE status <> 'unchanged'"
    return f"""
WITH __cd_o AS (
  SELECT {key_col} AS k, min(md5(coalesce({content_col}, ''))) AS old_fp
  FROM {old_table} GROUP BY {key_col}
),
__cd_n AS (
  SELECT {key_col} AS k, min(md5(coalesce({content_col}, ''))) AS new_fp
  FROM {new_table} GROUP BY {key_col}
),
__cd AS (
  SELECT coalesce(__cd_o.k, __cd_n.k) AS {key_col},
         CASE WHEN old_fp IS NULL THEN 'added'
              WHEN new_fp IS NULL THEN 'removed'
              WHEN old_fp <> new_fp THEN 'changed'
              ELSE 'unchanged' END AS status,
         old_fp, new_fp
  FROM __cd_o FULL OUTER JOIN __cd_n ON __cd_o.k = __cd_n.k
)
SELECT * FROM __cd {unchanged}
""".strip()

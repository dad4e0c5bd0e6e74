"""Bucketed table materialization: pay the shuffle once at write time.

At 100 TB the dominant recurring cost of a fact-to-fact join or a
repeated keyed aggregation is the exchange of the big side.  Spark's
bucketed tables (`DataFrameWriter.bucketBy`) hash-partition the FILES
by key at write time and record the layout in the catalog; any later
join or groupBy on the bucket key reads each bucket as one partition
whose distribution already satisfies the required hash partitioning —
the executed plan carries NO Exchange on that side (pinned by
tests/test_bucketing.py on both join sides, and on a groupBy).

Rules Spark enforces (and this module validates early so misuse fails
at write, not as a silent re-shuffle at read):
- bucketed writes go through the catalog (``saveAsTable`` with an
  explicit external ``path``), not a bare ``.parquet(path)``;
- both join sides need the SAME bucket count (or a divisor, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) on the SAME
  key;
- ``sortBy`` within buckets additionally removes the per-task Sort
  below a sort-merge join.

The transcripts north-rule shape: bucket by ``conv_id`` so every
per-conversation reconstruction, dialog-mining pass, and
conv-granular dedup join starts pre-distributed, and a hot conv_id
prefix never forces the same rows through one exchange after another.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key_cols: list[str] | str,
    num_buckets: int,
    *,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> str:
    """Materialize ``df`` as an external bucketed parquet table named
    ``table`` at ``path``; returns the table name.  ``key_cols`` is
    the future join/aggregation key; ``sort_cols`` (defaults to the
    key) makes buckets internally sorted so sort-merge joins skip
    their Sort too."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must name at least one column")
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"key_cols not in DataFrame: {missing}")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    sorts = (
        keys
        if sort_cols is None
        else [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    )
    (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *keys)
        .sortBy(*sorts)
        .saveAsTable(table)
    )
    return table


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read of a bucketed table — the bucket layout rides the
    catalog metadata, so this is just ``spark.table`` named for
    symmetry/greppability."""
    return spark.table(table)

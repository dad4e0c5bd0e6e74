"""Table-reference resolution: catalog tables (Iceberg) vs parquet paths.

The north_rule input is an *Iceberg table* of transcripts.  Iceberg
reaches Spark purely through the catalog API — a configured catalog
(``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`` +
the iceberg-spark-runtime jar on the cluster) makes
``spark.read.table("cat.db.transcripts")`` an Iceberg scan with full
predicate pushdown, partition/file pruning via Iceberg metadata, and
snapshot isolation; nothing else in this library needs to change,
because every operator consumes a DataFrame.

This module is the one seam where a table reference is resolved:

    load_table(spark, "table:cat.db.transcripts")   # catalog (Iceberg/Hive/view)
    load_table(spark, "table:cat.db.t@3421")        # Iceberg snapshot id
    load_table(spark, "/data/transcripts_parquet")  # plain parquet path

The sandbox container ships no Iceberg jars, so tests exercise the
catalog path through Spark's built-in session catalog (temp views /
managed tables) — the identical ``spark.read.table`` code path an
Iceberg catalog serves on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_PREFIX = "table:"


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """Resolve ``ref`` to a DataFrame.

    ``table:<identifier>`` reads through the session's catalog
    resolver (Iceberg / Hive / temp view — whatever the cluster
    configures for that identifier); ``table:<identifier>@<snapshot>``
    pins an Iceberg snapshot id (``VERSION AS OF``).  Any other string
    is a parquet path/glob.
    """
    if not ref.startswith(TABLE_PREFIX):
        return spark.read.parquet(ref)
    ident = ref[len(TABLE_PREFIX):]
    if not ident:
        raise ValueError(f"empty table identifier in {ref!r}")
    if "@" in ident:
        ident, snap = ident.rsplit("@", 1)
        if not snap.isdigit():
            raise ValueError(f"snapshot id must be numeric: {ref!r}")
        # VERSION AS OF = Iceberg snapshot-id / Delta version time travel
        return spark.read.option("versionAsOf", snap).table(ident)
    return spark.read.table(ident)


def save_table(df: DataFrame, ref: str, *, mode: str = "error") -> None:
    """Symmetric writer: ``table:`` → ``saveAsTable`` (an Iceberg
    catalog makes this an Iceberg commit), else parquet path."""
    if ref.startswith(TABLE_PREFIX):
        ident = ref[len(TABLE_PREFIX):]
        if not ident:
            raise ValueError(f"empty table identifier in {ref!r}")
        df.write.mode(mode).saveAsTable(ident)
    else:
        df.write.mode(mode).parquet(ref)

"""Distributed FASTA / FASTQ sources.

The reference CLI consumes FASTA ('>header' + wrapped sequence lines,
swig/writeBloom_rolling.cpp:19-58) and threaded 2/4-line FASTQ
(Tests/AdHoc/ParallelFilter.cpp:104-122).  These readers provide the
same scans as Spark DataFrames so every reference workflow
(contigsToBloom → insertSeq → storeFilter) runs against files a
reference user already has:

    seqs = read_fasta(spark, "refs.fa")        # (header, seq)
    bf = build_sketch(seqs, "seq", lambda: BloomFilter(...))

Design notes (100-TB shape):

- FASTA: the DataFrame text reader with a record separator of "\\n>"
  yields ONE ROW PER RECORD regardless of how many wrapped sequence
  lines it spans, and Hadoop-style split handling glues records across
  split boundaries — so multi-GB multi-record files scan in parallel
  with no driver pass and no whole-file reads.  Parsing (header =
  first line, seq = remaining lines joined) is pure Catalyst.
- FASTQ: '@' may legally open a QUALITY line, so no single-char record
  separator is safe.  We read lines, assign stable global line numbers
  with zipWithIndex (one narrow pass; order within and across text
  splits is the file order), and group by line_number // 4 — a single
  shuffle keyed by record id.  This is the one RDD use in the library,
  justified by the format's positional framing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

FASTA_SCHEMA = "header string, seq string"
FASTQ_SCHEMA = "read_id string, seq string, qual string"


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """(header, seq) per FASTA record, multi-line sequences joined.

    Mirrors the reference scan loop (writeBloom_rolling.cpp:19-58:
    '>' starts a record, other lines append to the current sequence);
    carriage returns are stripped, empty records dropped.
    """
    raw = spark.read.option("lineSep", "\n>").text(path)
    # the first record keeps its leading '>', later ones lost it to
    # the separator; a trailing newline yields an empty last row
    rec = F.regexp_replace(F.regexp_replace(F.col("value"), r"^>", ""), "\r", "")
    lines = F.split(rec, "\n")
    return (
        raw.select(
            F.element_at(lines, 1).alias("header"),
            F.array_join(F.slice(lines, 2, 1 << 30), "").alias("seq"),
        )
        .where((F.col("header") != "") | (F.col("seq") != ""))
    )


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """(read_id, seq, qual) per 4-line FASTQ record.

    Stable global line numbering via zipWithIndex (file order), then a
    groupBy(line // 4) pivot — robust to '@'/'+' appearing inside
    quality strings, which breaks any separator-based split.

    Scale note (honest cost): positional framing needs global line
    numbers, so this path pays zipWithIndex's extra partition-count
    job plus a per-line Python hop and one shuffle keyed by record id.
    Fine for ingest-once workloads; at sustained 100-TB scale convert
    FASTQ to Parquet once with this reader (or prefer FASTA, whose
    '\\n>'-delimited reader is pure Catalyst with no extra pass) and
    scan the Parquet thereafter.
    """
    lines = spark.read.text(path).rdd.map(lambda r: r[0]).zipWithIndex()
    df = spark.createDataFrame(
        lines.map(lambda t: (t[1], t[0].rstrip("\r"))), "idx long, line string"
    )
    rec = df.withColumn("rec", (F.col("idx") / 4).cast("long")).withColumn(
        "slot", F.col("idx") % 4
    )
    pivot = (
        rec.groupBy("rec")
        .agg(
            F.max(F.when(F.col("slot") == 0, F.col("line"))).alias("l0"),
            F.max(F.when(F.col("slot") == 1, F.col("line"))).alias("l1"),
            F.max(F.when(F.col("slot") == 3, F.col("line"))).alias("l3"),
            F.count("*").alias("n_lines"),
        )
    )
    bad = pivot.where((F.col("n_lines") == 4) & ~F.col("l0").startswith("@"))
    # framing check: every complete record must open with '@' (the
    # reference's getline pairing assumes well-formed input; we raise
    # instead of silently mis-pairing)
    if bad.limit(1).count():
        raise ValueError(f"{path}: malformed FASTQ (record not starting with '@')")
    return (
        pivot.where(F.col("n_lines") == 4)
        .select(
            F.regexp_replace("l0", r"^@", "").alias("read_id"),
            F.col("l1").alias("seq"),
            F.col("l3").alias("qual"),
        )
    )

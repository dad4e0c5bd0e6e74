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
  separator is safe — framing is positional (line number mod 4).  We
  derive stable global line numbers ENTIRELY JVM-side: a tiny first
  scan counts lines per scan partition (groupBy(spark_partition_id)),
  and the main scan adds the partition's cumulative offset (broadcast
  join) to monotonically_increasing_id's per-partition row counter —
  global index with zero Python per-line work and no zipWithIndex
  barrier job, then ONE shuffle keyed by record id (= line // 4).
  Assumes scan partitions follow file order (equal-size splits of one
  file keep offset order under Spark's stable length-descending split
  packing — the same contract zipWithIndex relies on); any violation
  misaligns the 4-line frame and trips the '@'/'+' validation below
  with overwhelming probability.
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


def read_fastq(spark: SparkSession, path: str, *, validate: bool = True) -> DataFrame:
    """(read_id, seq, qual) per 4-line FASTQ record.

    Pure-JVM positional framing (no RDD, no per-line Python — the
    threaded-ingest analog of Tests/AdHoc/ParallelFilter.cpp:104-122):

    1. tiny scan: lines per scan partition (groupBy spark_partition_id,
       one row per split) → cumulative offsets on the driver;
    2. main scan: global line index = partition offset (broadcast
       join) + monotonically_increasing_id's in-partition row counter,
       then one groupBy(index // 4) pivot — the only shuffle.

    ``validate=True`` (default) materializes the pivot (persisted, so
    the returned DataFrame's first action reuses it) and raises on ANY
    malformed record: a truncated trailing record (line count not a
    multiple of 4), a record not opening with '@', or a third line not
    opening with '+' — the same checks also catch a violated
    partition-order assumption (see module docstring).  With
    ``validate=False`` the result is fully lazy and unvalidated — a
    truncated trailing record then surfaces as a row with null
    seq/qual fields rather than raising.

    At sustained 100-TB scale convert FASTQ to Parquet once with
    ``jobs/fastq_to_parquet.py`` (this reader behind a one-shot
    conversion) and scan the Parquet thereafter — Parquet gives column
    pruning and split-free parallelism that no text framing can.
    """
    mask = (1 << 33) - 1  # monotonically_increasing_id: pid<<33 | row
    lines = spark.read.text(path).select(
        F.regexp_replace("value", "\r$", "").alias("line"),
        F.monotonically_increasing_id().alias("mid"),
    )
    with_pid = lines.withColumn("pid", F.shiftrightunsigned("mid", 33))
    cnt_rows = with_pid.groupBy("pid").agg(F.count("*").alias("n")).orderBy("pid").collect()
    total, offsets = 0, []
    for r in cnt_rows:
        offsets.append((int(r["pid"]), total))
        total += int(r["n"])
    if total == 0:
        return spark.createDataFrame([], FASTQ_SCHEMA)
    if validate and total % 4:
        raise ValueError(
            f"{path}: malformed FASTQ ({total} lines is not a multiple of 4 — "
            f"incomplete trailing record)"
        )
    odf = spark.createDataFrame(offsets, "pid long, off long")
    idx = F.col("off") + F.col("mid").bitwiseAND(F.lit(mask))
    rec = (
        with_pid.join(F.broadcast(odf), "pid")
        .withColumn("rec", F.shiftrightunsigned(idx, 2))
        .withColumn("slot", idx.bitwiseAND(F.lit(3)))
    )
    pivot = rec.groupBy("rec").agg(
        F.max(F.when(F.col("slot") == 0, F.col("line"))).alias("l0"),
        F.max(F.when(F.col("slot") == 1, F.col("line"))).alias("l1"),
        F.max(F.when(F.col("slot") == 2, F.col("line"))).alias("l2"),
        F.max(F.when(F.col("slot") == 3, F.col("line"))).alias("l3"),
        F.count("*").alias("n_lines"),
    )
    if validate:
        pivot = pivot.persist()
        bad = pivot.where(
            (F.col("n_lines") != 4)
            | ~F.col("l0").startswith("@")
            | ~F.col("l2").startswith("+")
        )
        n_bad = bad.count()
        if n_bad:
            sample = bad.select("rec", "l0", "l2", "n_lines").orderBy("rec").limit(3).collect()
            pivot.unpersist()
            raise ValueError(
                f"{path}: malformed FASTQ ({n_bad} bad records; a record must be 4 "
                f"lines opening with '@' and a third line opening with '+'); first: "
                + "; ".join(
                    f"rec={r['rec']} l0={r['l0']!r} l2={r['l2']!r} n_lines={r['n_lines']}"
                    for r in sample
                )
            )
    return pivot.select(
        F.regexp_replace("l0", r"^@", "").alias("read_id"),
        F.col("l1").alias("seq"),
        F.col("l3").alias("qual"),
    )

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
  derive stable PER-FILE line numbers ENTIRELY JVM-side: a tiny first
  scan counts lines per (input file, scan partition) group, the driver
  turns those into per-file cumulative offsets, and the main scan adds
  the group's offset (broadcast join) to a min-rebased
  monotonically_increasing_id — per-file index with zero Python
  per-line work and no zipWithIndex barrier job, then ONE shuffle
  keyed by (file, record id) where record id = line // 4.

  Why per-file keying is required (not just per-partition): Spark
  sorts input splits by length DESCENDING across ALL matched files, so
  a multi-file glob interleaves files' splits and no single global
  numbering can follow "file order".  WITHIN one file the ordering
  contract does hold — every split except the tail has the same size,
  Scala's sortBy is stable, and the smaller tail split (the file's
  last bytes) sorts after its full-size siblings — so
  monotonically_increasing_id order == byte-offset order per file.
  Two layered guards watch this contract: (1) each (file, partition)
  group must be one contiguous id run (count == max-min+1) — catches
  any packing that interleaves another file INSIDE a file's run and
  raises up front; (2) with ``validate=True`` (the default) the
  per-record '@'/'+'/4-line frame checks catch a cross-partition
  reorder of a file's splits (which guard 1 cannot see) with
  overwhelming probability.  ``validate=False`` skips guard 2 by
  definition — use it only on inputs whose framing a prior validated
  read (or jobs/fastq_to_parquet.py) already established.
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
    threaded-ingest analog of Tests/AdHoc/ParallelFilter.cpp:104-122),
    safe for multi-file globs because framing is PER INPUT FILE:

    1. tiny scan: lines per (input_file_name, scan partition) group
       (one row per split) → per-file cumulative offsets on the
       driver, with a contiguity check on each group's id range;
    2. main scan: per-file line index = group offset (broadcast join)
       + (monotonically_increasing_id − group min), then one
       groupBy(file, index // 4) pivot — the only shuffle.

    ``validate=True`` (default) materializes the pivot (persisted
    through validation, then released — the framing shuffle's map
    outputs are still reused when the returned DataFrame's first
    action recomputes the reduce side) and raises on ANY malformed
    record: a truncated trailing record (a file's line count not a
    multiple of 4), a record not opening with '@', or a third line not
    opening with '+'.  With ``validate=False`` the result is fully
    lazy and unvalidated — a truncated trailing record then surfaces
    as a row with null seq/qual fields rather than raising.

    At sustained 100-TB scale convert FASTQ to Parquet once with
    ``jobs/fastq_to_parquet.py`` (this reader behind a one-shot
    conversion) and scan the Parquet thereafter — Parquet gives column
    pruning and split-free parallelism that no text framing can.
    """
    lines = spark.read.text(path).select(
        F.regexp_replace("value", "\r$", "").alias("line"),
        F.monotonically_increasing_id().alias("mid"),
        F.input_file_name().alias("file"),
    )
    with_pid = lines.withColumn("pid", F.shiftrightunsigned("mid", 33))
    grp_rows = (
        with_pid.groupBy("file", "pid")
        .agg(F.count("*").alias("n"), F.min("mid").alias("lo"), F.max("mid").alias("hi"))
        .collect()
    )
    if not grp_rows:
        return spark.createDataFrame([], FASTQ_SCHEMA)
    per_file: dict[str, list] = {}
    for r in grp_rows:
        n, lo, hi = int(r["n"]), int(r["lo"]), int(r["hi"])
        if n != hi - lo + 1:
            # a gap in a (file, partition) group's id run means Spark
            # packed two non-adjacent splits of one file into one
            # partition with another file's split between them — the
            # per-file ordering contract (module docstring) is broken
            raise ValueError(
                f"{path}: non-contiguous input-split packing for {r['file']!r} "
                f"in scan partition {r['pid']} (ids {lo}..{hi} hold {n} rows); "
                f"read files individually or convert via jobs/fastq_to_parquet.py"
            )
        per_file.setdefault(r["file"], []).append((int(r["pid"]), lo, n))
    offsets, totals = [], {}
    for fname, groups in per_file.items():
        groups.sort(key=lambda g: g[1])  # mid order == per-file byte order
        total = 0
        for pid, lo, n in groups:
            offsets.append((fname, pid, lo, total))
            total += n
        totals[fname] = total
    if validate:
        bad = sorted(f for f, t in totals.items() if t % 4)
        if bad:
            raise ValueError(
                f"{bad[0]}: malformed FASTQ ({totals[bad[0]]} lines is not a "
                f"multiple of 4 — incomplete trailing record)"
            )
    odf = spark.createDataFrame(offsets, "file string, pid long, lo long, off long")
    idx = F.col("off") + (F.col("mid") - F.col("lo"))
    rec = (
        with_pid.join(F.broadcast(odf), ["file", "pid"])
        .withColumn("rec", F.shiftrightunsigned(idx, 2))
        .withColumn("slot", idx.bitwiseAND(F.lit(3)))
    )
    pivot = rec.groupBy("file", "rec").agg(
        F.max(F.when(F.col("slot") == 0, F.col("line"))).alias("l0"),
        F.max(F.when(F.col("slot") == 1, F.col("line"))).alias("l1"),
        F.max(F.when(F.col("slot") == 2, F.col("line"))).alias("l2"),
        F.max(F.when(F.col("slot") == 3, F.col("line"))).alias("l3"),
        F.count("*").alias("n_lines"),
    )
    if validate:
        pivot = pivot.persist()
        try:
            bad = pivot.where(
                (F.col("n_lines") != 4)
                | ~F.col("l0").startswith("@")
                | ~F.col("l2").startswith("+")
            )
            n_bad = bad.count()
            if n_bad:
                sample = (
                    bad.select("file", "rec", "l0", "l2", "n_lines")
                    .orderBy("file", "rec")
                    .limit(3)
                    .collect()
                )
                raise ValueError(
                    f"{path}: malformed FASTQ ({n_bad} bad records; a record must be 4 "
                    f"lines opening with '@' and a third line opening with '+'); first: "
                    + "; ".join(
                        f"file={r['file']} rec={r['rec']} l0={r['l0']!r} "
                        f"l2={r['l2']!r} n_lines={r['n_lines']}"
                        for r in sample
                    )
                )
        finally:
            # release executor storage either way (ADVICE r4): the
            # pivot's shuffle map outputs outlive the unpersist, so the
            # returned DataFrame's first action re-runs only the cheap
            # reduce side, not the text scan.
            pivot.unpersist()
    return pivot.select(
        F.regexp_replace("l0", r"^@", "").alias("read_id"),
        F.col("l1").alias("seq"),
        F.col("l3").alias("qual"),
    )

#!/usr/bin/env python
"""One-shot FASTQ → Parquet ingest job.

    python jobs/fastq_to_parquet.py -f reads.fq -o reads.parquet \\
        [--partitions N] [--cpus N]

FASTQ's 4-line positional framing (the reference's threaded ingest
format, Tests/AdHoc/ParallelFilter.cpp:104-122) fundamentally needs
global line numbers, so every direct read pays a tiny per-split count
scan plus one shuffle (sources/fastx.read_fastq).  At sustained scale
that cost should be paid ONCE: this job validates and converts the
FASTQ to Parquet, after which every downstream build/probe scans
columnar data with pruning and no framing pass at all.

Malformed input (truncated trailing record, record not opening with
'@', third line not opening with '+') raises before anything is
written — the conversion never silently drops or mis-pairs records.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--fastq", required=True, help="FASTQ input path/glob")
    ap.add_argument("-o", "--output", required=True, help="Parquet output dir")
    ap.add_argument(
        "--partitions",
        type=int,
        default=None,
        help="output file count (default: whatever the framing shuffle produced)",
    )
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from btl_bloomfilter_spark.session import get_spark
    from btl_bloomfilter_spark.sources.fastx import read_fastq

    spark = get_spark(
        "fastq_to_parquet", master=f"local[{args.cpus}]" if args.cpus else None
    )
    df = read_fastq(spark, args.fastq)  # validates; raises on malformed input
    if args.partitions:
        df = df.repartition(args.partitions)
    df.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"Wrote {n} reads to {args.output}")
    return n


if __name__ == "__main__":
    main()

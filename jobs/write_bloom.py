#!/usr/bin/env python
"""CLI-parity build job — the reference's `writeBloom_rolling`
(swig/writeBloom_rolling.cpp:60-121) re-expressed as a Spark job:

    python jobs/write_bloom.py -f refs.fa [-k 15] [-p 0.0001] \\
        [-o BloomFilter.bf] [--cpus N]

Same contract as the reference CLI:
  - element-count proxy = FASTA file size in bytes (getFileSize)
  - m = ceil(-n·ln p / ln²2) rounded UP by a full 64-bit word
    (writeBloom_rolling.cpp:101-102 adds 64 - m%64 unconditionally)
  - h = floor(m/n · ln 2)
  - every k-mer window of every contig inserted; filter stored in the
    reference `.bf` layout (TOML header + raw bytes) so the reference
    CLI / bindings can load what this job writes.
The scan and build are distributed (sources/fastx.read_fasta +
plans/agg.build_sketch); output lands on the driver as m/8 bytes.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--fasta", required=True, help="Multi-FASTA input")
    ap.add_argument("-k", "--kmer", type=int, default=15)
    ap.add_argument("-p", "--fpr", type=float, default=0.0001)
    ap.add_argument("-o", "--output", default="BloomFilter.bf")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from btl_bloomfilter_spark import params as P
    from btl_bloomfilter_spark.operators.bloom import BloomFilter
    from btl_bloomfilter_spark.plans.agg import build_sketch
    from btl_bloomfilter_spark.session import get_spark
    from btl_bloomfilter_spark.sources import bfio
    from btl_bloomfilter_spark.sources.fastx import read_fasta

    n = os.path.getsize(args.fasta)  # getFileSize proxy, as the reference
    m, _ = P.cli_sizing(n, args.fpr)
    m += 64 - (m % 64)  # unconditional word round-up (cpp:102)
    import math

    h = max(1, int((m / float(n)) * math.log(2)))
    print(
        f"***** Bloom filter specs: \nelements = {n}\nFPR = {args.fpr}\n"
        f"size (bits) = {m}\nhash functions = {h}"
    )
    spark = get_spark("write_bloom", master=f"local[{args.cpus}]" if args.cpus else None)
    print(f"Shredding supplied sequence file (-f {args.fasta}) into {args.kmer}-mers..")
    bf = build_sketch(
        read_fasta(spark, args.fasta),
        "seq",
        lambda: BloomFilter(m, h, args.kmer, dfpr=args.fpr),
    )
    print("Writing Bloom filter to disk ...")
    bfio.save_bloom(bf, args.output)
    print("Done!")
    return bf


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""CLI-parity probe job — the reference's `testBloom_rolling`
(swig/testBloom_rolling.cpp): load a stored `.bf`, probe every k-mer
window of every contig of a FASTA file, report hits/total:

    python jobs/test_bloom.py -f reads.fa --filter BloomFilter.bf [--cpus N]

Distributed analog of containSeq (testBloom_rolling.cpp:19-33): the
filter is broadcast once and probed with the zero-copy mapInArrow
path; the per-contig hit tally aggregates in Spark (the reference
prints per-window misses to stdout and a final 'Found X out of Y' to
stderr — we report the same totals plus a per-contig table).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--fasta", required=True)
    ap.add_argument("--filter", default="BloomFilter.bf")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.functions.probe import with_probe_columns
    from btl_bloomfilter_spark.session import get_spark
    from btl_bloomfilter_spark.sources import bfio
    from btl_bloomfilter_spark.sources.fastx import read_fasta

    spark = get_spark("test_bloom", master=f"local[{args.cpus}]" if args.cpus else None)
    bf = bfio.load_bloom(args.filter)
    seqs = read_fasta(spark, args.fasta)
    k = bf.k
    total = F.greatest(F.octet_length("seq") - k + 1, F.lit(0))
    per_contig = (
        with_probe_columns(seqs, bf, "seq", frac_col="frac", keep=["header", "seq"])
        .select(
            "header",
            total.alias("total"),
            F.round(F.col("frac") * total).cast("long").alias("hits"),
        )
    )
    agg = per_contig.agg(F.sum("hits").alias("h"), F.sum("total").alias("t")).collect()[0]
    print(f"Found {int(agg['h'])} out of {int(agg['t'])}", file=sys.stderr)
    return per_contig


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark-decontamination job (spark-submit friendly).

    python jobs/decontaminate.py --corpus corpus.parquet \\
        --bench benchmark.parquet --col text -o screened.parquet \\
        [--k 25] [--fpr 1e-4] [--threshold 0.05] \\
        [--filter-out bench.bf | --filter-in bench.bf] [--cpus N]

Screens every corpus row for k-gram overlap with the benchmark
(operators/decontam.contamination_screen: Bloom over the benchmark's
windows, broadcast pure-map probe — the corpus never shuffles) and
writes the corpus with a ``contamination_frac`` column plus a
``quarantine`` flag at the given threshold.  The compiled benchmark
filter can be saved (--filter-out, reference .bf layout) or reused
(--filter-in) so daily corpus shards skip the benchmark build.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="corpus parquet path")
    ap.add_argument("--bench", default=None, help="benchmark parquet path")
    ap.add_argument("--col", default="text")
    ap.add_argument("-o", "--output", required=True, help="screened parquet output")
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--fpr", type=float, default=1e-4)
    ap.add_argument("--threshold", type=float, default=0.05)
    ap.add_argument("--filter-out", default=None, help="save the benchmark filter (.bf)")
    ap.add_argument("--filter-in", default=None, help="reuse a saved benchmark filter (.bf)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if not args.bench and not args.filter_in:
        ap.error("--bench or --filter-in is required")

    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.operators.decontam import contamination_screen
    from btl_bloomfilter_spark.session import get_spark
    from btl_bloomfilter_spark.sources import bfio

    spark = get_spark("decontaminate", master=f"local[{args.cpus}]" if args.cpus else None)
    from btl_bloomfilter_spark.sources.catalog import load_table

    corpus = load_table(spark, args.corpus)
    bench = load_table(spark, args.bench).select(args.col) if args.bench else None
    bloom = bfio.load_bloom(args.filter_in) if args.filter_in else None
    screened, bloom = contamination_screen(
        corpus, bench, args.col, k=args.k, fpr=args.fpr, bloom=bloom
    )
    out = screened.withColumn("quarantine", F.col("contamination_frac") >= args.threshold)
    out.write.mode("overwrite").parquet(args.output)
    if args.filter_out:
        bfio.save_bloom(bloom, args.filter_out)
    stats = spark.read.parquet(args.output).agg(
        F.count("*").alias("n"),
        F.sum(F.col("quarantine").cast("long")).alias("n_quarantined"),
        F.round(F.avg("contamination_frac"), 6).alias("avg_frac"),
    ).collect()[0]
    print(
        f"Screened {stats['n']} rows: {stats['n_quarantined']} quarantined "
        f"(threshold {args.threshold}), avg frac {stats['avg_frac']}"
    )
    return stats


if __name__ == "__main__":
    main()

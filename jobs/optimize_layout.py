#!/usr/bin/env python
"""Table-layout optimization job (Iceberg-style ZORDER rewrite).

    python jobs/optimize_layout.py --input t.parquet -o zordered/ \\
        --by price_cents:90000:10500000 --by qty:1:50 \\
        [--bits 16] [--files 64] [--report report.parquet] [--cpus N]

Rewrites a table clustered by the Z-order key of the named columns so
file-level AND row-group min/max stats get tight on EVERY listed
dimension (functions/layout: exact integer normalization -> Morton
interleave in pure codegen -> repartitionByRange + sorted write).
Each ``--by col:lo:hi`` gives the column and the stats bounds used
for normalization (values outside clamp — stale bounds cost locality,
never correctness); pass ``--by col`` alone to have the job run a
min/max stats pass for that column.

``--report`` writes the measured evidence: per-output-file min/max
width of every clustered column, before (input file layout) and
after, so "would a range predicate on this column prune files" is a
recorded number, not a claim.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _parse_by(spec: str):
    parts = spec.split(":")
    if len(parts) == 1:
        return parts[0], None, None
    if len(parts) != 3:
        raise SystemExit(f"--by must be col or col:lo:hi, got {spec!r}")
    return parts[0], int(parts[1]), int(parts[2])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="input table (parquet path or table:ident)")
    ap.add_argument("-o", "--output", required=True, help="z-ordered parquet output dir")
    ap.add_argument("--by", action="append", required=True,
                    help="col[:lo:hi] — clustered column with optional stats bounds (>= 2)")
    ap.add_argument("--bits", type=int, default=16)
    ap.add_argument("--files", type=int, default=64, help="target output file count")
    ap.add_argument("--report", default=None, help="write before/after per-file width report")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    specs = [_parse_by(s) for s in args.by]
    if len(specs) < 2:
        ap.error("need at least two --by columns to interleave")

    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.functions.layout import (
        cluster_by_zorder,
        interleave_bits,
        normalize_minmax,
    )
    from btl_bloomfilter_spark.session import get_spark
    from btl_bloomfilter_spark.sources.catalog import load_table

    spark = get_spark("optimize_layout", master=f"local[{args.cpus}]" if args.cpus else None)
    df = load_table(spark, args.input)
    missing = [c for c, _, _ in specs if c not in df.columns]
    if missing:
        raise SystemExit(f"columns not in table: {missing}")

    # stats pass only for the columns that need it (one scan, all cols)
    need = [c for c, lo, hi in specs if lo is None]
    if need:
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in need],
            *[F.max(c).alias(f"hi_{c}") for c in need],
        ).collect()[0]
        bounds = {c: (int(row[f"lo_{c}"]), int(row[f"hi_{c}"])) for c in need}
        specs = [(c, *(bounds[c] if lo is None else (lo, hi))) for c, lo, hi in specs]

    norm = [normalize_minmax(F.col(c).cast("long"), lo, hi, bits=args.bits) for c, lo, hi in specs]
    z = interleave_bits(*norm, bits=args.bits)
    cluster_by_zorder(df, z, num_partitions=args.files).write.mode("overwrite").parquet(args.output)

    if args.report:
        cols = [c for c, _, _ in specs]

        def widths(table, label):
            return (
                table.withColumn("file", F.input_file_name())
                .groupBy("file")
                .agg(*[(F.max(c) - F.min(c)).alias(f"width_{c}") for c in cols])
                .withColumn("layout", F.lit(label))
            )

        rep = widths(df, "before").unionByName(widths(spark.read.parquet(args.output), "after"))
        rep.write.mode("overwrite").parquet(args.report)
        after = rep.where(F.col("layout") == "after").agg(
            *[F.avg(f"width_{c}").alias(c) for c in cols]
        ).collect()[0]
        before = rep.where(F.col("layout") == "before").agg(
            *[F.avg(f"width_{c}").alias(c) for c in cols]
        ).collect()[0]
        for c in cols:
            print(f"mean per-file width {c}: before={before[c]:.1f} after={after[c]:.1f}")
    print(f"wrote z-ordered table to {args.output}")
    # no spark.stop(): session may be shared (tests / notebook); the
    # spark-submit launcher tears it down at process exit like the
    # other jobs here


if __name__ == "__main__":
    main()

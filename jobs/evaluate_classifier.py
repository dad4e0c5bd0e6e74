#!/usr/bin/env python
"""One-shot classifier/score evaluation report (spark-submit friendly).

    python jobs/evaluate_classifier.py --input scored.parquet -o report_dir \\
        --score score --label label [--group source] \\
        [--key doc_id] [--bins 10] [--replicates 48] [--cpus N]

Composes the library's exact eval kit over a scored table (one row
per example with a score column, a boolean/0-1 label column, and an
optional group column) and writes one parquet per report under the
output directory, plus a summary JSON line on stdout:

  auc/          exact per-group ROC AUC (Mann-Whitney, midrank ties)
  sweep/        per-distinct-threshold confusion counts + P/R
  calibration/  reliability bins + exact integral ECE
  ci/           hash-Poisson bootstrap CI of the mean score per label
                cohort (error bars without resampling)
  shift/        two-sample KS of the score distribution between
                label cohorts (the separation view of AUC)
  ttest/        exact-moment Welch t between label cohorts

Every report is the hash-oracle-able operator from operators/stats —
deterministic under repartitioning/retries, exact integer cores, the
documented single-division doubles.  Scale notes: auc/sweep/shift run
off ONE shared-shape (group, score) histogram exchange each;
calibration/ttest are one aggregate; ci/ explodes ×replicates into a
map-side-combined aggregate (never row-shaped on the wire).  Nothing
corpus-sized is collected to the driver.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path")
    ap.add_argument("-o", "--output", required=True, help="report directory")
    ap.add_argument("--score", default="score")
    ap.add_argument("--label", default="label")
    ap.add_argument("--group", default=None,
                    help="group column (default: one global group)")
    ap.add_argument("--key", default=None,
                    help="stable row-id column for the bootstrap "
                         "(default: skip ci/)")
    ap.add_argument("--bins", type=int, default=10)
    ap.add_argument("--replicates", type=int, default=48)
    ap.add_argument("--scale", type=int, default=1_000_000,
                    help="fixed-point grid for ci/ and ttest/")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.operators.stats import (
        bootstrap_ci,
        calibration_bins,
        grouped_auc,
        grouped_ks,
        grouped_welch,
        threshold_sweep,
    )
    from btl_bloomfilter_spark.session import get_spark

    spark = get_spark(
        "evaluate_classifier", master=f"local[{args.cpus}]" if args.cpus else None
    )
    df = spark.read.parquet(args.input)
    if args.group is None:
        df = df.withColumn("__grp", F.lit("all"))
        group = ["__grp"]
    else:
        group = [args.group]
    lab = F.col(args.label).cast("boolean")
    out = Path(args.output)
    summary: dict = {}

    def write(name: str, d):
        d.write.mode("overwrite").parquet(str(out / name))
        summary[name] = spark.read.parquet(str(out / name)).count()

    write("auc", grouped_auc(df, group, args.score, lab))
    write("sweep", threshold_sweep(df, group, args.score, lab))
    write(
        "calibration",
        calibration_bins(df, group, args.score, lab, n_bins=args.bins),
    )
    # separation views: score distribution / mean between label cohorts
    write("shift", grouped_ks(df, group, args.score, lab))
    write(
        "ttest",
        grouped_welch(df, group, args.score, lab, scale=args.scale),
    )
    if args.key is not None:
        # drop unlabeled rows like every other report — otherwise a
        # NULL label forms a phantom third cohort in ci/
        labeled = df.where(lab.isNotNull()).withColumn("label_int", lab.cast("int"))
        write(
            "ci",
            bootstrap_ci(
                labeled, group + ["label_int"], args.score,
                [args.key], replicates=args.replicates, scale=args.scale,
                seed=args.seed,
            ),
        )
    print(json.dumps({"reports": summary, "output": str(out)}))
    return summary


if __name__ == "__main__":
    main()

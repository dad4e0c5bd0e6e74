#!/usr/bin/env python
"""One-shot user-activity analytics report (spark-submit friendly).

    python jobs/analyze_activity.py --input events.parquet -o report_dir \\
        --user user_id --ts ts [--step-col event_type] \\
        [--funnel view,click,purchase] [--value value] [--group event_type] \\
        [--period-days 7] [--window-periods 4] [--cpus N]

Composes the product-analytics kit over an event table (one row per
event with a user column, an event-time column, and optionally a
step/type column and a numeric value column) and writes one parquet
per report under the output directory, plus a summary JSON line on
stdout:

  retention/   weekly cohort retention matrix (cohort × age cells;
               age-0 diagonal carries cohort sizes, retention = 1.0)
  active/      trailing-window active users per period (WAU/MAU)
  funnel/      ordered funnel conversion report over --funnel steps,
               keyed by (user, calendar day) so a long history
               doesn't saturate every stage   [needs --step-col]
  changepoint/ per-group CUSUM localization of the value series'
               mean shift                       [needs --value]

Every report is the hash-oracle-able operator from the corresponding
operators/ module — deterministic under repartitioning/retries,
exact integer cores, single-division doubles.  Scale notes:
retention/active reduce rows to (user, period) facts with ONE
distinct; the funnel filters to its steps before anything shuffles;
the changepoint pays per-group row-scale windows (the documented
spearman-class contract).  Nothing corpus-sized is collected to the
driver.
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
    ap.add_argument("--user", default="user_id")
    ap.add_argument("--ts", default="ts")
    ap.add_argument("--step-col", default=None,
                    help="event-type column for the funnel report")
    ap.add_argument("--funnel", default=None,
                    help="comma-separated ordered funnel steps")
    ap.add_argument("--value", default=None,
                    help="numeric column for the changepoint report")
    ap.add_argument("--group", default=None,
                    help="group column for the changepoint report "
                         "(default: one global group)")
    ap.add_argument("--period-days", type=int, default=7)
    ap.add_argument("--window-periods", type=int, default=4)
    ap.add_argument("--scale", type=int, default=1_000_000,
                    help="fixed-point grid for changepoint/")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    if (args.funnel is None) != (args.step_col is None):
        ap.error("--funnel and --step-col must be given together")

    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.operators.activity import trailing_active
    from btl_bloomfilter_spark.operators.changepoint import changepoint
    from btl_bloomfilter_spark.operators.funnel import funnel_report
    from btl_bloomfilter_spark.operators.retention import retention_matrix
    from btl_bloomfilter_spark.session import get_spark

    spark = get_spark(
        "analyze_activity", master=f"local[{args.cpus}]" if args.cpus else None
    )
    df = spark.read.parquet(args.input)
    out = Path(args.output)
    summary: dict = {}

    def write(name: str, d):
        d.write.mode("overwrite").parquet(str(out / name))
        summary[name] = spark.read.parquet(str(out / name)).count()

    write(
        "retention",
        retention_matrix(df, args.user, args.ts, period_days=args.period_days),
    )
    write(
        "active",
        trailing_active(
            df, args.user, args.ts,
            window_periods=args.window_periods, period_days=args.period_days,
        ),
    )
    if args.funnel is not None:
        steps = [s.strip() for s in args.funnel.split(",") if s.strip()]
        keyed = df.where(F.col(args.user).isNotNull()).select(
            F.col(args.user).alias("__user"),
            F.to_date(F.col(args.ts)).alias("__day"),
            F.col(args.step_col),
            F.col(args.ts),
        )
        write(
            "funnel",
            funnel_report(keyed, ["__user", "__day"], args.step_col, steps, args.ts),
        )
    if args.value is not None:
        if args.group is None:
            cdf = df.withColumn("__grp", F.lit("all"))
            group = ["__grp"]
        else:
            cdf, group = df, [args.group]
        write(
            "changepoint",
            changepoint(cdf, group, args.value, args.ts, scale=args.scale),
        )
    print(json.dumps({"reports": summary, "output": str(out)}))
    return summary


if __name__ == "__main__":
    main()

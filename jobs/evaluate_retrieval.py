#!/usr/bin/env python
"""One-shot retrieval/reranker evaluation report (spark-submit friendly).

    python jobs/evaluate_retrieval.py --input runs.parquet -o report_dir \\
        --query query_id --id doc_id --score score_a --rel rel \\
        [--score-b score_b] [--group segment] [--k 10] [--rrf-k 60] \\
        [--cpus N]

Input: one row per (query, candidate) with a relevance label column
(graded int, NULL = unjudged = 0) and one or two ranking-signal
columns.  Composes the library's exact ranking-eval kit and writes
one parquet per report under the output directory plus a summary
JSON line on stdout:

  metrics_a/    per-query MRR / hit@k / fixed-point NDCG@k (system A)
  summary_a/    per-group hit_rate, fixed-point MRR, micro-NDCG
  metrics_b/, summary_b/   same for system B    (with --score-b)
  agreement/    top-k overlap/jaccard between A and B rankings
  metrics_rrf/, summary_rrf/  per-query reciprocal-rank fusion of A
                and B (integer-grid RRF contributions, deterministic
                (rrf DESC, id ASC) order) re-scored against the same
                labels — does fusing beat either system?

Every report is the hash-oracle-able operator from
operators/ranking and operators/fusion — deterministic under
repartitioning/retries, exact integer cores, documented
single-division doubles.  Scale notes: each metrics report is two
per-query windows over one query-key shuffle; summaries are
group-sized reduces; agreement prunes to WindowGroupLimit.  Nothing
corpus-sized is collected to the driver.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_GRID = 10**9


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path")
    ap.add_argument("-o", "--output", required=True, help="report directory")
    ap.add_argument("--query", default="query_id")
    ap.add_argument("--id", dest="id_col", default="doc_id")
    ap.add_argument("--score", dest="score_a", default="score")
    ap.add_argument("--score-b", dest="score_b", default=None)
    ap.add_argument("--rel", default="rel")
    ap.add_argument("--group", default=None,
                    help="segment column, constant per query "
                         "(default: one global group)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--rrf-k", type=int, default=60)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import Window, functions as F

    from btl_bloomfilter_spark.operators.fusion import topk_overlap
    from btl_bloomfilter_spark.operators.ranking import (
        ranking_metrics,
        summarize_metrics,
    )
    from btl_bloomfilter_spark.session import get_spark

    spark = get_spark(
        "evaluate_retrieval", master=f"local[{args.cpus}]" if args.cpus else None
    )
    df = spark.read.parquet(args.input)
    if args.group is None:
        df = df.withColumn("__grp", F.lit("all"))
        group = "__grp"
    else:
        group = args.group
    qcols = [group, args.query]
    out = Path(args.output)
    summary: dict = {}

    def write(name: str, d):
        d.write.mode("overwrite").parquet(str(out / name))
        summary[name] = spark.read.parquet(str(out / name)).count()

    def eval_system(tag: str, score_col, src):
        # summary aggregates the JUST-WRITTEN metrics parquet — the
        # two window passes run once, not twice (review finding)
        write(
            f"metrics_{tag}",
            ranking_metrics(src, qcols, args.id_col, score_col, args.rel, k=args.k),
        )
        write(
            f"summary_{tag}",
            summarize_metrics(
                spark.read.parquet(str(out / f"metrics_{tag}")), [group]
            ),
        )

    eval_system("a", args.score_a, df)
    if args.score_b is not None:
        eval_system("b", args.score_b, df)
        write(
            "agreement",
            topk_overlap(
                df, qcols, args.id_col, args.score_a, args.score_b, k=args.k
            ),
        )
        # per-query RRF on the integer grid (the fusion module's
        # GRID div (k + rank) contributions, applied per query), then
        # the fused ranking is scored against the same labels
        wq = Window.partitionBy(*qcols)
        rk_a = F.row_number().over(
            wq.orderBy(F.col(args.score_a).desc_nulls_last(), F.col(args.id_col))
        )
        rk_b = F.row_number().over(
            wq.orderBy(F.col(args.score_b).desc_nulls_last(), F.col(args.id_col))
        )
        fused = (
            df.withColumn("__rka", rk_a)
            .withColumn("__rkb", rk_b)
            .withColumn(
                "__rrf_nano",
                F.expr(f"{_GRID} div ({args.rrf_k} + __rka)")
                + F.expr(f"{_GRID} div ({args.rrf_k} + __rkb)"),
            )
        )
        eval_system("rrf", F.col("__rrf_nano").cast("double"), fused)
    print(json.dumps({"reports": summary, "output": str(out)}))
    return summary


if __name__ == "__main__":
    main()

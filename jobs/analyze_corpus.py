#!/usr/bin/env python
"""One-shot corpus analysis report (spark-submit friendly).

    python jobs/analyze_corpus.py --input docs.parquet -o report_dir \\
        [--col text] [--id doc_id] [--group source] \\
        [--bucket-width 50] [--blocklist badword,gambling] \\
        [--phrases "dark pattern"] [--cpus N]

The read-only counterpart of jobs/clean_corpus.py: runs the library's
diagnostic battery over a corpus WITHOUT mutating it and writes one
parquet per report under the output directory, plus a summary JSON
line on stdout:

  quality/    per-group Gopher + repetition + C4 + PII rollup
              (ONE scan — all row-local Catalyst columns)
  signals/    per-group blocklist + char-entropy rollup (one scan)
  growth/     Heaps-law vocabulary growth per --bucket-width prefix
  profile/    column-level completeness / distincts / min-max
  drift/      length-distribution PSI of each group vs the rest
              (map-side histogram collapse per side)

Scale notes: quality/ and signals/ are pure maps + one rollup
shuffle; growth/ shuffles only map-side-combined (token, bucket)
aggregates; profile/ is one multi-aggregate scan (approx-distinct
mode — the 10^12-row path); drift/ collapses to K histogram rows per
group.  Nothing corpus-sized is collected to the driver.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or table:<ident>")
    ap.add_argument("-o", "--output", required=True, help="report directory")
    ap.add_argument("--col", default="text")
    ap.add_argument("--id", default="doc_id")
    ap.add_argument("--group", default="source")
    ap.add_argument("--bucket-width", type=int, default=50)
    ap.add_argument("--blocklist", default="", help="comma-separated terms")
    ap.add_argument("--phrases", default="", help="comma-separated multi-word phrases")
    ap.add_argument("--drift-groups", type=int, default=None,
                    help="limit drift to the N largest groups (default: all)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.session import get_spark

    spark = get_spark("analyze_corpus", master=f"local[{args.cpus}]" if args.cpus else None)
    from btl_bloomfilter_spark.functions import textstats as T
    from btl_bloomfilter_spark.operators.drift import psi_report
    from btl_bloomfilter_spark.operators.growth import vocabulary_growth
    from btl_bloomfilter_spark.operators.profile import profile_columns
    from btl_bloomfilter_spark.sources.catalog import load_table

    df = load_table(spark, args.input)
    col, gid, grp = args.col, args.id, args.group
    out = Path(args.output)
    summary: dict = {"input": args.input, "n_docs": df.count()}

    # 1. quality battery — one scan, row-local columns, one rollup
    rows = df.select(
        grp,
        *T.gopher_quality(col),
        *T.repetition_stats(col),
        *T.c4_line_filter(col),
        *T.pii_counts(col),
    )
    quality = rows.groupBy(grp).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("passes_gopher").cast("long")).alias("n_gopher"),
        F.sum(F.col("passes_repetition").cast("long")).alias("n_repetition"),
        F.sum(F.col("passes_c4").cast("long")).alias("n_c4"),
        F.sum("n_email").alias("n_email"),
        F.sum("n_phone").alias("n_phone"),
        F.round(F.avg("n_words"), 2).alias("avg_words"),
    )
    quality.write.mode("overwrite").parquet(str(out / "quality"))
    summary["quality_groups"] = quality.count()

    # 2. signals — blocklist (if given) + entropy, one scan
    terms = [t for t in args.blocklist.split(",") if t]
    phrases = tuple(p.strip() for p in args.phrases.split(",") if p.strip())
    sig_cols = list(T.char_entropy(col))
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("entropy_micro_nats") / F.count("*"), 1).alias("avg_entropy_micro"),
    ]
    if terms:
        sig_cols += T.blocklist_screen(col, terms, phrases=phrases)
        aggs.append(F.sum(F.col("blocked").cast("long")).alias("n_blocked"))
    signals = df.select(grp, *sig_cols).groupBy(grp).agg(*aggs)
    signals.write.mode("overwrite").parquet(str(out / "signals"))
    summary["signal_groups"] = signals.count()

    # 3. Heaps-law growth over id-ordered prefixes
    growth = vocabulary_growth(df, col, F.expr(f"{gid} div {args.bucket_width}"))
    growth.write.mode("overwrite").parquet(str(out / "growth"))
    g = growth.orderBy(F.col("bucket").desc()).limit(1).collect()
    if g:
        summary["vocab_types"] = int(g[0]["cum_types"])
        summary["total_tokens"] = int(g[0]["cum_tokens"])

    # 4. column profile (approx-distinct scale mode)
    prof = profile_columns(df, [f.name for f in df.schema.fields], exact_distinct=False)
    prof.write.mode("overwrite").parquet(str(out / "profile"))

    # 5. drift: each group's length distribution vs the rest.  The
    # 2-column projection is cached once so the per-group psi_report
    # pair scans hit columnar cache, not the corpus; with very many
    # groups, collapse to ONE scan by histogramming per (group,
    # bucket) and differencing the K×G table driver-side instead.
    sized = df.select(grp, F.length(F.coalesce(F.col(col), F.lit(""))).alias("len")).cache()
    gcounts = sized.groupBy(grp).count().collect()
    gcounts.sort(key=lambda r: (-r["count"], r[0]))
    if args.drift_groups:
        gcounts = gcounts[: args.drift_groups]
    groups = [r[0] for r in gcounts]
    edges = [100.0, 200.0, 400.0, 600.0, 800.0, 1200.0]
    drifts = []
    for gv in groups:
        rep = psi_report(
            sized.where(F.col(grp) != gv),
            sized.where(F.col(grp) == gv),
            "len",
            edges=edges,
        ).withColumn("group", F.lit(gv))
        drifts.append(rep)
    if drifts:
        alld = drifts[0]
        for d in drifts[1:]:
            alld = alld.unionByName(d)
        alld.write.mode("overwrite").parquet(str(out / "drift"))
        summary["drift_groups"] = len(groups)
    sized.unpersist()

    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()

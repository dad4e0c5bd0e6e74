#!/usr/bin/env python
"""spark-submit job: build the full sketch suite over a transcript table.

Usage (north_rule launch mode):

    spark-submit --py-files "$(python -c 'from btl_bloomfilter_spark.session import package_zip; print(package_zip())')" \\
        jobs/build_sketches.py --input /path/to/transcripts_parquet \\
        --output /path/to/out --checkpoint /path/to/ckpt

or locally (the package ships itself):

    python jobs/build_sketches.py --synthetic-convs 5000 --output /tmp/sketches

Builds, with per-partition checkpoints + lineage + fill metrics:
  - Bloom over text k-grams  (membership: "was this n-gram seen?")
  - CMS over tool            (heavy-hitter tools)
  - HLL per role over conv_id(distinct conversations per role)
  - KLL + t-digest over text length (turn-length quantiles)
and writes each sketch blob + a metrics JSON to --output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None, *, stop_session: bool = True):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts: parquet path, or table:<catalog-identifier> (Iceberg/Hive; table:ident@<snapshot> pins an Iceberg snapshot)")
    ap.add_argument("--synthetic-convs", type=int, default=0, help="generate N synthetic conversations instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--cpus", type=int, default=None, help="local[N] master if no cluster master set")
    ap.add_argument("--fpr", type=float, default=1e-3)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--capacity", type=int, default=100_000_000)
    args = ap.parse_args(argv)
    if not args.input and not args.synthetic_convs:
        ap.error("one of --input or --synthetic-convs is required")

    from btl_bloomfilter_spark.session import get_spark
    from btl_bloomfilter_spark.operators.bloom import BloomFilter
    from btl_bloomfilter_spark.operators.counting import CountMinSketch
    from btl_bloomfilter_spark.operators.hll import HyperLogLog
    from btl_bloomfilter_spark.operators.kll import KLL
    from btl_bloomfilter_spark.operators.tdigest import TDigest
    from btl_bloomfilter_spark.plans.agg import build_sketch, sketch_by_key
    from btl_bloomfilter_spark.sources import bfio
    from pyspark.sql import functions as F

    spark = get_spark("build_sketches", master=f"local[{args.cpus}]" if args.cpus else None)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    if args.synthetic_convs:
        from btl_bloomfilter_spark.sources.transcripts import transcripts_df

        df = transcripts_df(spark, args.synthetic_convs)
        lineage = f"synthetic:seed=42:convs={args.synthetic_convs}"
    else:
        from btl_bloomfilter_spark.sources.catalog import load_table

        df = load_table(spark, args.input)
        # keep the historical 'parquet:' prefix for path inputs —
        # lineage is part of the checkpoint identity, so changing it
        # would silently invalidate existing --checkpoint state
        lineage = args.input if args.input.startswith("table:") else f"parquet:{args.input}"
    df = df.cache()
    n_turns = df.count()

    metrics: dict = {"lineage": lineage, "n_turns": n_turns}
    t0 = time.perf_counter()
    bf = build_sketch(
        df,
        "text",
        lambda: BloomFilter.for_capacity(n=args.capacity, fpr=args.fpr, k=args.k),
        checkpoint_dir=str(Path(args.checkpoint) / "bloom") if args.checkpoint else None,
        lineage=lineage,
    )
    metrics["bloom"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "turns_per_sec": round(n_turns / (time.perf_counter() - t0), 1),
        **bf.metrics(),
        "observed_fpr": bf.fpr(),
        "theoretical_fpr": bf.theoretical_fpr(),
    }
    bfio.save_bloom(bf, out / "text_ngrams.bf")

    t0 = time.perf_counter()
    cms = build_sketch(
        df.filter(F.col("tool").isNotNull()),
        "tool",
        lambda: CountMinSketch.from_error(0.001, 0.01),
        checkpoint_dir=str(Path(args.checkpoint) / "cms") if args.checkpoint else None,
        lineage=lineage,
    )
    (out / "tools.cms").write_bytes(cms.serialize())
    metrics["cms"] = {"sec": round(time.perf_counter() - t0, 2), **cms.metrics()}

    t0 = time.perf_counter()
    hll_rows = sketch_by_key(
        df, ["role"], "conv_id", lambda: HyperLogLog(p=14), lambda s: s.estimate(), "est"
    ).collect()
    metrics["hll_distinct_convs_per_role"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "estimates": {r["role"]: r["est"] for r in hll_rows},
    }

    # per-role theta sketches over conv_id: persisted, they support
    # later SET ALGEBRA across profiles/shards (|user ∩ assistant|,
    # conversations in shard A not in B, ...) — HLL can't intersect
    t0 = time.perf_counter()
    from btl_bloomfilter_spark.operators.theta import ThetaSketch

    theta_est = {}
    for role in [r["role"] for r in df.select("role").distinct().collect()]:
        th = build_sketch(
            # eqNullSafe: a NULL role group (possible with table:
            # inputs) matches its own rows instead of silently
            # producing an empty sketch
            df.filter(F.col("role").eqNullSafe(F.lit(role))).select("conv_id"),
            "conv_id",
            lambda: ThetaSketch(k=4096),
        )
        name = role if role is not None else "null"
        (out / f"convs_{name}.theta").write_bytes(th.serialize())
        theta_est[name] = th.estimate()
    metrics["theta_distinct_convs_per_role"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "estimates": theta_est,
    }

    ldf = df.select(F.length("text").cast("double").alias("len")).cache()
    t0 = time.perf_counter()
    kll = build_sketch(ldf, "len", lambda: KLL(k=200), lineage=lineage)
    td = build_sketch(ldf, "len", lambda: TDigest(delta=200), lineage=lineage)
    (out / "turn_len.kll").write_bytes(kll.serialize())
    (out / "turn_len.tdigest").write_bytes(td.serialize())
    metrics["quantiles"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "kll": {str(q): kll.quantile(q) for q in (0.5, 0.9, 0.99)},
        "tdigest": {str(q): td.quantile(q) for q in (0.5, 0.9, 0.99)},
    }

    (out / "metrics.json").write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics))
    if stop_session:
        spark.stop()
    return metrics


if __name__ == "__main__":
    main()

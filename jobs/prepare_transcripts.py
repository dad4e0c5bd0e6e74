#!/usr/bin/env python
"""Agent-transcript preparation pipeline (spark-submit friendly).

    python jobs/prepare_transcripts.py --input turns.parquet -o out/ \\
        [--require-well-formed] [--opening-role user] \\
        [--redact-pii] [--exact-dedup] \\
        [--near-dedup] [--near-threshold 0.5] [--shingle-w 3] \\
        [--budget N] [--emit turns|sft|packed] [--n-context 4] \\
        [--capacity 4096] \\
        [--split train=0.98,val=0.01,test=0.01] [--seed 7] [--cpus N] \\
        [--no-stats] [--synthetic-convs N]

The conversation analogue of ``jobs/clean_corpus.py``: composes the
dialog operators into the standard transcript→training-data flow over
the north-rule table shape (conv_id, turn_idx, role, text, tool, ts).
Input is a parquet path or ``table:<identifier>`` (Iceberg-ready);
``--synthetic-convs N`` generates the deterministic synthetic corpus
instead (self-contained demo/bench mode, no external data).

Stages, in production order — every gate operates on WHOLE
conversations (a transcript is the unit of identity, never a bare
turn):

  1. Structure gate (``--require-well-formed``): keep conversations
     ``dialog_stats`` marks well-formed — opens with
     ``--opening-role``, dense 0-based turn indices, no empty turns,
     no alternation breaks.       (one conv-key shuffle + semi-join)
  2. PII redaction (``--redact-pii``): per-turn text rewrite.
                                   (pure map, Catalyst regexes)
  3. Exact conversation dedup (``--exact-dedup``): digest-chain
     fingerprints (``dedup.group_fingerprints`` — the north-rule
     per-turn-text-equality invariant as an operator); the min
     conv_id of each identical-content class survives.
                                   (two near-uniform-key shuffles)
  4. Near-dup conversation removal (``--near-dedup``): turn-digest
     w-gram Jaccard pairs >= ``--near-threshold``
     (``near_dup_conversations``), resolved transitively via
     large-star/small-star connected components; the min conv_id per
     cluster survives.  Pair list ≪ corpus, components broadcast
     back.                        (banded, never all-pairs)
  5. Token-budget truncation (``--budget``): maximal whole-turn
     suffix per conversation within the budget — how a trainer trims
     history to a context window.  (one conv-key window)
  6. Emit (``--emit``):
       turns   surviving turn rows as-is (default)
       sft     per-assistant-turn (context, target) examples
               (``examples.sft_examples``)
       packed  per-conversation token totals packed best-fit-
               decreasing into ``--capacity`` bins inside hash
               shards (``packing.pack_documents``); output is the
               (shard, conv_id, tokens, bin_idx, oversize)
               assignment table
  7. Split assignment (``--split``): content-keyed hash split ON
     conv_id — whole conversations land in one split (no
     train/val leakage through a shared conversation), written
     ``partitionBy(split)`` for downstream partition pruning.

Scale notes: stages 1, 3-6 all hash-shuffle on conv_id (near-uniform
key — synthetic and real conversation ids are high-entropy, no skew
salt needed); the pair/components tables of stage 4 are
candidate-sized and broadcast.  Per-stage counts re-execute lineage
(diagnostics); ``--no-stats`` keeps the job at one pass over the
turns plus the dedup shuffles.  Prints one JSON line of per-stage
conversation/turn counts and writes the same dict to
``<output>/../metrics.json`` (driver-local path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_split(s: str) -> dict[str, float]:
    out = {}
    for part in s.split(","):
        name, _, frac = part.partition("=")
        out[name.strip()] = float(frac)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None,
                    help="turns parquet path or table:<identifier> with "
                         "(conv_id, turn_idx, role, text[, tool, ts])")
    ap.add_argument("--synthetic-convs", type=int, default=None,
                    help="generate N deterministic synthetic conversations "
                         "instead of reading --input")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--conv", dest="conv_col", default="conv_id")
    ap.add_argument("--idx", dest="idx_col", default="turn_idx")
    ap.add_argument("--role", dest="role_col", default="role")
    ap.add_argument("--col", dest="text_col", default="text")
    ap.add_argument("--require-well-formed", action="store_true")
    ap.add_argument("--opening-role", default="user")
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--exact-dedup", action="store_true",
                    help="drop exact-duplicate conversations (digest chain)")
    ap.add_argument("--near-dedup", action="store_true",
                    help="drop near-duplicate conversations (turn-digest "
                         "w-gram Jaccard + connected components)")
    ap.add_argument("--near-threshold", type=float, default=0.5)
    ap.add_argument("--shingle-w", type=int, default=3)
    ap.add_argument("--budget", type=int, default=None,
                    help="whole-turn suffix truncation to this token budget")
    ap.add_argument("--emit", choices=("turns", "sft", "packed"), default="turns")
    ap.add_argument("--n-context", type=int, default=4, help="sft context turns")
    ap.add_argument("--capacity", type=int, default=4096, help="packed bin capacity")
    ap.add_argument("--split", default=None, help="e.g. train=0.98,val=0.01,test=0.01")
    ap.add_argument("--seed", default="7")
    ap.add_argument("--no-stats", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if (args.input is None) == (args.synthetic_convs is None):
        ap.error("exactly one of --input / --synthetic-convs is required")

    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.functions import splits as S
    from btl_bloomfilter_spark.functions import textstats as T
    from btl_bloomfilter_spark.session import get_spark

    spark = get_spark(
        "prepare_transcripts", master=f"local[{args.cpus}]" if args.cpus else None
    )
    conv, idx, role, text = args.conv_col, args.idx_col, args.role_col, args.text_col

    if args.synthetic_convs is not None:
        from btl_bloomfilter_spark.sources.transcripts import transcripts_df

        df = transcripts_df(spark, args.synthetic_convs)
    else:
        from btl_bloomfilter_spark.sources.catalog import load_table

        df = load_table(spark, args.input)

    stats: dict[str, int] = {}

    def count_stage(name: str) -> None:
        if not args.no_stats:
            stats[f"{name}_convs"] = df.select(conv).distinct().count()
            stats[f"{name}_turns"] = df.count()

    count_stage("input")

    if args.require_well_formed:
        from btl_bloomfilter_spark.operators.dialog import dialog_stats

        keep = (
            dialog_stats(
                df, conv_col=conv, idx_col=idx, role_col=role, text_col=text,
                opening_role=args.opening_role,
            )
            .where(F.col("well_formed"))
            .select(conv)
        )
        df = df.join(keep, conv, "left_semi")
        count_stage("after_structure_gate")

    if args.redact_pii:
        df = df.withColumn(text, T.redact_pii(text))

    if args.exact_dedup:
        from btl_bloomfilter_spark.operators.dedup import (
            duplicate_groups,
            group_fingerprints,
        )

        keepers = (
            duplicate_groups(group_fingerprints(df, conv, idx, text), conv)
            .where(F.col(conv) == F.col("keeper"))
            .select(conv)
        )
        df = df.join(keepers, conv, "left_semi")
        count_stage("after_exact_dedup")

    if args.near_dedup:
        from btl_bloomfilter_spark.operators.components import connected_components
        from btl_bloomfilter_spark.operators.dialog import near_dup_conversations

        pairs = near_dup_conversations(
            df, conv_col=conv, idx_col=idx, text_col=text,
            w=args.shingle_w, threshold=args.near_threshold,
        )
        losers = (
            connected_components(pairs, "conv_a", "conv_b")
            .where(F.col("node") != F.col("component"))
            .select(F.col("node").alias(conv))
        )
        df = df.join(F.broadcast(losers), conv, "left_anti")
        count_stage("after_near_dedup")

    if args.budget is not None:
        from btl_bloomfilter_spark.operators.dialog import truncate_to_budget

        df = truncate_to_budget(
            df, args.budget, conv_col=conv, idx_col=idx, text_col=text
        ).drop("turn_tokens", "suffix_tokens")
        count_stage("after_truncation")

    if args.emit == "sft":
        from btl_bloomfilter_spark.operators.examples import sft_examples

        out_df = sft_examples(
            df, conv_col=conv, idx_col=idx, role_col=role, text_col=text,
            n_context=args.n_context,
        )
    elif args.emit == "packed":
        from btl_bloomfilter_spark.operators.packing import pack_documents

        conv_tokens = df.groupBy(conv).agg(
            F.sum(T.token_count(text)).alias("conv_tokens")
        )
        out_df = pack_documents(
            conv_tokens, conv, "conv_tokens",
            capacity=args.capacity, seed=args.seed,
        ).withColumnRenamed("doc_id", conv)
    else:
        out_df = df

    if args.split:
        fractions = parse_split(args.split)
        out_df = out_df.withColumn(
            "split", S.assign_split([conv], fractions, seed=args.seed)
        )
        out_df.write.mode("overwrite").partitionBy("split").parquet(args.output)
    else:
        out_df.write.mode("overwrite").parquet(args.output)
    stats["output_rows"] = spark.read.parquet(args.output).count()

    metrics_path = os.path.join(os.path.dirname(args.output.rstrip("/")) or ".",
                                "metrics.json")
    with open(metrics_path, "w") as fh:
        json.dump(stats, fh)
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training-corpus preparation pipeline (spark-submit friendly).

    python jobs/clean_corpus.py --input docs.parquet -o clean.parquet \\
        [--col text] [--id doc_id] \\
        [--gopher] [--repetition] [--c4-rewrite] [--redact-pii] \\
        [--lm-nll-max 8.5] [--dsir-target trusted.parquet] \\
        [--exact-dedup] [--near-dedup] [--min-words 50] \\
        [--split train=0.98,val=0.01,test=0.01] [--seed 7] [--cpus N]
        [--no-stats]

Composes the library's text-hygiene battery into the standard
pre-training data flow, in the order production pipelines run it:

  1. C4 line-level rewrite (``--c4-rewrite``): drop non-sentence /
     javascript lines, drop lorem-ipsum / brace pages, REPLACE the
     text column with the cleaned text.        (pure map)
  2. Quality gates (``--gopher``, ``--repetition``): keep rows
     passing the Gopher rule set / repetition thresholds, evaluated
     on the (possibly rewritten) text.         (pure map + filter)
  2b. LM atypicality gate (``--lm-nll-max``): self-trained unigram
     LM, drop docs above the mean-NLL ceiling (CCNet-style; adds a
     train scan, a score scan and an id semi-join).
  2c. DSIR selection (``--dsir-target`` + ``--dsir-min-logw``):
     hashed-gram importance weights vs a trusted corpus, keep
     target-like docs.                         (2 profile scans + semi-join)
  3. PII redaction (``--redact-pii``).         (pure map)
  4. Exact dedup (``--exact-dedup``): keep the min-id row per
     distinct text.                            (one shuffle)
  5. MinHash near-dedup (``--near-dedup``): drop the higher id of
     each near-dup pair at jaccard >= 0.8.     (banded, never all-pairs)
  6. Deterministic split assignment (``--split``): content-keyed
     hash split, written ``partitionBy(split)`` so downstream readers
     partition-prune their own split.

Every stage before dedup is a row-local Catalyst projection — at
100 TB the whole filter battery is one scan.  Prints one JSON line of
per-stage row counts.

Per-stage counts are diagnostics: each count re-executes the lineage
up to that stage (the filters are cheap maps, but at 100 TB that is
extra full scans).  ``--no-stats`` skips them — the job then runs
exactly ONE pass over the data (plus the dedup shuffles) and reports
only input/output counts.
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--input", required=True, help="input parquet path or table:<identifier>")
    ap.add_argument("-o", "--output", required=True, help="cleaned parquet output")
    ap.add_argument("--col", default="text")
    ap.add_argument("--id", dest="id_col", default="doc_id")
    ap.add_argument("--gopher", action="store_true", help="apply Gopher quality gate")
    ap.add_argument("--repetition", action="store_true", help="apply repetition gate")
    ap.add_argument("--c4-rewrite", action="store_true", help="C4 line cleanup, rewrite text")
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--exact-dedup", action="store_true")
    ap.add_argument("--near-dedup", action="store_true", help="MinHash near-dedup @ 0.8")
    ap.add_argument("--min-words", type=int, default=50, help="Gopher word floor")
    ap.add_argument("--lm-nll-max", type=float, default=None,
                    help="drop docs whose self-trained unigram-LM mean NLL "
                         "exceeds this (CCNet-style atypicality gate; adds one "
                         "train scan + one score scan + an id-join)")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet path / table: of a trusted target corpus; "
                         "computes DSIR log-weights (hashed grams) vs this corpus")
    ap.add_argument("--dsir-min-logw", type=float, default=0.0,
                    help="with --dsir-target: keep docs with log_weight above "
                         "this (default 0 = more target-like than raw)")
    ap.add_argument("--split", default=None, help="e.g. train=0.98,val=0.01,test=0.01")
    ap.add_argument("--seed", default="7")
    ap.add_argument("--no-stats", action="store_true",
                    help="skip per-stage counts (single data pass)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.functions import splits as S
    from btl_bloomfilter_spark.functions import textstats as T
    from btl_bloomfilter_spark.session import get_spark

    spark = get_spark("clean_corpus", master=f"local[{args.cpus}]" if args.cpus else None)
    from btl_bloomfilter_spark.sources.catalog import load_table

    df = load_table(spark, args.input)
    col, id_col = args.col, args.id_col
    stats = {"input": df.count()}

    if args.c4_rewrite:
        c4 = T.c4_line_filter(col, min_words_per_line=5)
        df = (
            df.select("*", *c4)
            .where(F.col("passes_c4"))
            .drop(col)
            .withColumnRenamed("clean_text", col)
            .drop("n_lines", "n_kept_lines", "kept_line_frac", "has_lorem_ipsum",
                  "has_brace", "passes_c4")
        )
        if not args.no_stats:
            stats["after_c4"] = df.count()

    if args.gopher:
        g = T.gopher_quality(col, min_words=args.min_words)
        df = df.select("*", *g).where(F.col("passes_gopher")).drop(
            "n_words", "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
            "ellipsis_line_frac", "alpha_word_frac", "n_stopwords", "dup_line_frac",
            "passes_gopher",
        )
        if not args.no_stats:
            stats["after_gopher"] = df.count()

    if args.repetition:
        df = df.select("*", *T.repetition_stats(col)).where(F.col("passes_repetition")).drop(
            "top_2gram_char_frac", "top_3gram_char_frac", "dup_5gram_char_frac",
            "dup_line_char_frac", "passes_repetition",
        )
        if not args.no_stats:
            stats["after_repetition"] = df.count()

    if args.lm_nll_max is not None:
        from btl_bloomfilter_spark.operators.lmscore import lm_doc_scores

        keep = lm_doc_scores(df, col, id_col, min_count=2).where(
            F.col("mean_nll").isNull() | (F.col("mean_nll") <= args.lm_nll_max)
        ).select(id_col)
        df = df.join(keep, id_col, "left_semi")
        if not args.no_stats:
            stats["after_lm_gate"] = df.count()

    if args.dsir_target is not None:
        from btl_bloomfilter_spark.operators.dsir import bucket_counts, dsir_log_weights

        target = load_table(spark, args.dsir_target)
        tc = bucket_counts(target, col, seed=args.seed)
        rc = bucket_counts(df, col, seed=args.seed)
        w = dsir_log_weights(df, col, id_col, tc, rc, seed=args.seed)
        keep = w.where(
            F.col("log_weight").isNotNull()
            & (F.col("log_weight") > args.dsir_min_logw)
        ).select(id_col)
        df = df.join(keep, id_col, "left_semi")
        if not args.no_stats:
            stats["after_dsir"] = df.count()

    if args.redact_pii:
        df = df.withColumn(col, T.redact_pii(col))

    if args.exact_dedup:
        from btl_bloomfilter_spark.operators.dedup import exact_dedup_keep

        df = exact_dedup_keep(df, col, id_col)
        if not args.no_stats:
            stats["after_exact_dedup"] = df.count()

    if args.near_dedup:
        from btl_bloomfilter_spark.operators.dedup import minhash_dedup

        pairs = minhash_dedup(df, col, id_col, num_perm=64, bands=16, threshold=0.8)
        losers = pairs.select(
            F.greatest(F.col("id_a"), F.col("id_b")).alias(id_col)
        ).distinct()
        df = df.join(losers, id_col, "left_anti")
        if not args.no_stats:
            stats["after_near_dedup"] = df.count()

    writer = df
    if args.split:
        fractions = parse_split(args.split)
        writer = df.withColumn(
            "split", S.assign_split([id_col], fractions, seed=args.seed)
        )
        writer.write.mode("overwrite").partitionBy("split").parquet(args.output)
    else:
        writer.write.mode("overwrite").parquet(args.output)
    stats["output"] = spark.read.parquet(args.output).count()
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()

"""Token-budget sequence packing (context-window bin packing).

Training pipelines pack variable-length documents into fixed
token-capacity bins (context windows) to minimize padding waste.
This operator implements deterministic Best-Fit-Decreasing packing,
sharded for scale:

- every document gets a shard via the engine-portable md5 hash of
  its id (``functions.splits`` bucket), so packing a 100-TB corpus
  is ``num_shards`` independent sequential problems of bounded size
  — one ``applyInPandas`` group each, no global state;
- within a shard, documents are sorted (tokens DESC, id ASC) and
  placed best-fit (the open bin with the smallest residual that
  still fits; ties by lower bin index).  The sort makes assignment
  a pure function of the shard's contents — invariant to partition
  layout, retries, and engine;
- documents larger than ``capacity`` become singleton oversize bins
  (flagged, for downstream truncation/splitting).

Any-fit guarantees that double as self-validation gates:

- no bin exceeds capacity (oversize singletons excepted);
- at most ONE open bin per shard is <= half-full (two half-empty
  bins would have been merged by best-fit);
- bins_used <= 2 * ceil(total_tokens / capacity) + n_oversize
  (any-fit is a 2-approximation) and >= the LP lower bound.

Why applyInPandas and not SQL: next/best-fit bin assignment is a
sequential fold — each placement depends on all residuals so far —
which is exactly the "custom stateful operator" case the DataFrame
API can't express; the shard hash bounds the sequential extent.
"""

from __future__ import annotations

from bisect import bisect_left, insort

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.splits import hash_bucket


def _pack_one_shard(pdf: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """Best-fit-decreasing over one shard.  Deterministic: input is
    re-sorted (tokens desc, id asc) regardless of arrival order."""
    pdf = pdf.sort_values(
        ["__tokens", "__id"], ascending=[False, True], kind="mergesort"
    )
    residuals: list[tuple[int, int]] = []  # sorted (residual, bin_idx)
    fills: list[int] = []  # bin_idx -> fill
    oversize: list[bool] = []
    out_bin = []
    for tok in pdf["__tokens"].to_numpy():
        tok = int(tok)
        if tok > capacity:
            b = len(fills)
            fills.append(tok)
            oversize.append(True)
            out_bin.append(b)
            continue
        # smallest residual >= tok; ties resolved by the tuple's
        # second element (lower bin index first)
        i = bisect_left(residuals, (tok, -1))
        if i < len(residuals):
            r, b = residuals.pop(i)
            fills[b] += tok
            insort(residuals, (r - tok, b))
            out_bin.append(b)
        else:
            b = len(fills)
            fills.append(tok)
            oversize.append(False)
            insort(residuals, (capacity - tok, b))
            out_bin.append(b)
    return pd.DataFrame(
        {
            "shard": pdf["__shard"].to_numpy(),
            "doc_id": pdf["__id"].to_numpy(),
            "tokens": pdf["__tokens"].to_numpy(),
            "bin_idx": pd.array(out_bin, dtype="int64"),
            "oversize": pd.array(
                [oversize[b] for b in out_bin], dtype="bool"
            ),
        }
    )


def pack_documents(
    docs: DataFrame,
    id_col: str,
    token_col: str,
    *,
    capacity: int,
    num_shards: int = 64,
    seed: int | str = 0,
) -> DataFrame:
    """Assign every document to a (shard, bin_idx) context-window
    bin.  Returns (shard, doc_id, tokens, bin_idx, oversize).

    ``token_col`` is any long column (e.g. ``textstats.token_count``
    or ``bpe_token_count``); rows with NULL or non-positive token
    counts are packed as zero-length (they join whichever bin is
    current — harmless).  Size ``num_shards`` so a shard's documents
    fit one task's memory (packing state is O(open bins), the input
    rows stream through pandas)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    prepped = docs.select(
        F.col(id_col).alias("__id"),
        F.greatest(F.lit(0), F.coalesce(F.col(token_col), F.lit(0)))
        .cast("long")
        .alias("__tokens"),
        hash_bucket([id_col], num_shards, seed=seed).alias("__shard"),
    )
    schema = (
        "shard long, doc_id "
        + docs.schema[id_col].dataType.simpleString()
        + ", tokens long, bin_idx long, oversize boolean"
    )
    return prepped.groupBy("__shard").applyInPandas(
        lambda pdf: _pack_one_shard(pdf, capacity), schema
    )


def packing_report(
    packed: DataFrame,
    *,
    capacity: int,
) -> DataFrame:
    """Per-shard packing summary with the any-fit law gates as
    boolean columns (all must hold): within_capacity, one_halffull,
    bins_bounded.  Input is :func:`pack_documents` output."""
    bins = packed.groupBy("shard", "bin_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("fill"),
        F.max(F.col("oversize").cast("int")).alias("is_oversize"),
    )
    half = capacity // 2
    return (
        bins.groupBy("shard")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("fill").alias("total_tokens"),
            F.sum("is_oversize").alias("n_oversize"),
            F.max("fill").alias("max_fill"),
            F.sum(
                (
                    (F.col("is_oversize") == 0) & (F.col("fill") > capacity)
                ).cast("int")
            ).alias("over_capacity_bins"),
            F.sum(
                ((F.col("is_oversize") == 0) & (F.col("fill") <= half)).cast("int")
            ).alias("halffull_bins"),
            F.sum(F.when(F.col("is_oversize") == 1, F.col("fill")).otherwise(0)).alias(
                "oversize_tokens"
            ),
        )
        .select(
            "shard",
            "n_docs",
            "n_bins",
            "total_tokens",
            "n_oversize",
            "max_fill",
            (F.col("over_capacity_bins") == 0).alias("within_capacity"),
            (F.col("halffull_bins") <= 1).alias("one_halffull"),
            # bounds on the REGULAR bins over the non-oversize token
            # mass (an oversize singleton carries > capacity tokens
            # and would corrupt both sides)
            (
                (
                    F.col("n_bins") - F.col("n_oversize")
                    <= 2
                    * F.ceil(
                        (F.col("total_tokens") - F.col("oversize_tokens")) / capacity
                    )
                    + 1
                )
                & (
                    F.col("n_bins") - F.col("n_oversize")
                    >= F.ceil(
                        (F.col("total_tokens") - F.col("oversize_tokens")) / capacity
                    )
                )
            ).alias("bins_bounded"),
        )
    )

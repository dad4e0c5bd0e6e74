"""Deterministic distributed quality classifier (hashed-feature
logistic regression, the DataComp/fastText filtering stage).

Modern corpus pipelines gate documents with a small linear classifier
(quality vs junk, in-domain vs out).  This is that stage built
Spark-first, with the twist the rest of this repo applies to floats
(fixed-point-oracle-policy): every per-row gradient CONTRIBUTION is
quantized once to nano-units (int64) inside the row, so all
aggregation — partition-local and across the cluster — is exact
integer addition.  Consequence: training is BIT-IDENTICAL under any
partitioning, row order, retry, or cluster size (gated by q98's
``partition_invariant`` — two trainings over different repartitions
must produce byte-equal weights), where standard distributed SGD/LBFGS
drifts with float summation order.

Shapes at 10^12 rows:
- featurization is pure codegen (tokenize → ``transform`` to hashed
  indices + 1/n_tokens values; duplicates just add) — no UDF, no
  shuffle, cache-once;
- each iteration is ONE pass: a mapInPandas kernel computes per-row
  sigmoid margins against the broadcast weight vector (numpy
  ``add.reduceat`` over the concatenated CSR-style arrays) and emits
  the partition's SPARSE accumulated gradient as (idx, grad_nano)
  rows — the only shuffle is groupBy(idx).sum over at most
  min(dim, distinct tokens) rows per partition, and the driver
  collects a vocab-sized (never corpus-sized) gradient;
- the model is ``dim + 1`` doubles (bias at index ``dim``), a few MB
  broadcast per iteration.

Reference note: btl_bloomfilter has no classifier; this operator
belongs to the pipeline-completeness surface (SURVEY §2.10), not the
reference-parity table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import _WS, _clean

__all__ = ["hashed_features", "train_quality_classifier", "score_documents"]

_NANO = 1e9


def hashed_features(
    df: DataFrame, text_col: str, label_col: str | None, *, dim: int = 1 << 18,
    tf_normalize: bool = True,
) -> DataFrame:
    """Pure-codegen featurization: lowercase whitespace tokens hashed
    into ``dim`` buckets (``pmod(xxhash64(token), dim)``), each worth
    ``1/n_tokens`` (L1 tf; repeated buckets add) — or raw count 1.0
    per occurrence with ``tf_normalize=False``, which gives rare
    discriminative tokens a length-independent gradient (use a
    correspondingly smaller lr).  Output columns ``(label double |
    absent, idxs array<int>, vals array<double>)``; empty/NULL text
    rows keep an empty feature list (bias still applies).  Cache the
    result before a multi-iteration train."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    t = _clean(text_col)
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(F.lower(t), rf"[{_WS}]+")
    )
    idxs = F.transform(toks, lambda x: F.pmod(F.xxhash64(x), F.lit(dim)).cast("int"))
    unit = (F.lit(1.0) / F.size(toks)) if tf_normalize else F.lit(1.0)
    vals = F.transform(toks, lambda x: unit)
    cols = [idxs.alias("idxs"), vals.alias("vals")]
    if label_col is not None:
        cols = [F.col(label_col).cast("double").alias("label")] + cols
    # No fan_out here (r6 review): callers control partitioning
    # deliberately — q98 trains at two EXPLICIT partitionings to pin
    # gradient invariance, and the bench featurizes a pre-spread
    # cache; a spread here would override both (and probe .rdd on a
    # caller's repartition plan).  Under-partitioned corpora should be
    # spread by the caller before featurizing.
    return df.select(*cols)


def _iter_gradient(feat: DataFrame, w_b, dim: int, quant: float) -> DataFrame:
    """One pass: per-partition sparse gradient of the mean logistic
    loss, every per-row contribution pre-quantized to int64.  Emits
    (idx, g) rows; idx == dim is the bias, idx == dim+1 carries the
    quantized per-row loss sum (for monitoring), idx == dim+2 the row
    count.

    mapInArrow: the sparse rows arrive as Arrow list arrays whose flat
    values/offsets buffers feed numpy directly — the former pandas
    path materialized a python list object per row and re-concatenated
    per batch (guide §4: r6).  Arithmetic is identical, so gradients
    are bit-identical (q98 partitioning-invariance law unchanged)."""
    import pyarrow as pa

    def fn(batches):
        w = w_b.value
        acc = np.zeros(dim + 1, dtype=np.int64)
        loss_q = 0
        n = 0
        for rb in batches:
            labels = rb.column(0).to_numpy(zero_copy_only=False).astype(np.float64)
            ia = rb.column(1)
            va = rb.column(2)
            lens = pa.compute.list_value_length(ia).to_numpy(zero_copy_only=False).astype(np.int64)
            cat_i = ia.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            cat_v = va.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            # per-row margin: w.x + bias.  reduceat quirks: indices
            # must be < len(prod) and equal consecutive indices return
            # prod[i] — clip, then zero the empty rows explicitly.
            prod = w[cat_i] * cat_v
            if len(prod):
                bounds = np.zeros(len(lens) + 1, dtype=np.int64)
                np.cumsum(lens, out=bounds[1:])
                starts = np.minimum(bounds[:-1], len(prod) - 1)
                margins = np.add.reduceat(prod, starts)
            else:
                margins = np.zeros(len(lens))
            margins[lens == 0] = 0.0
            margins += w[dim]
            with np.errstate(over="ignore"):
                p = 1.0 / (1.0 + np.exp(-margins))
            err = p - labels  # d(loss)/d(margin)
            # per-ENTRY quantized contribution: rint((p-y) * x_j * Q)
            q_entries = np.rint(np.repeat(err, lens) * cat_v * quant).astype(np.int64)
            np.add.at(acc, cat_i, q_entries)
            acc[dim] += int(np.rint(err * quant).astype(np.int64).sum())  # bias (x=1)
            eps = 1e-12
            loss = -(labels * np.log(p + eps) + (1 - labels) * np.log(1 - p + eps))
            loss_q += int(np.rint(loss * quant).astype(np.int64).sum())
            n += len(lens)
        nz = np.nonzero(acc)[0]
        yield pa.record_batch(
            [
                pa.array(np.concatenate([nz, [dim + 1, dim + 2]]), pa.int64()),
                pa.array(
                    np.concatenate([acc[nz], [loss_q, n]]).astype(np.int64), pa.int64()
                ),
            ],
            names=["idx", "g"],
        )

    return feat.select("label", "idxs", "vals").mapInArrow(fn, "idx long, g long")


def train_quality_classifier(
    feat: DataFrame,
    *,
    dim: int = 1 << 18,
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 0.0,
    quant: float = _NANO,
    optimizer: str = "adagrad",
) -> tuple[np.ndarray, list[float]]:
    """Full-batch training on the mean logistic loss; returns
    (weights[dim+1] with bias last, per-iteration mean losses).
    Deterministic under any partitioning: the global gradient is an
    exact int64 sum of per-row quantized contributions, and the
    driver update — plain GD or Adagrad diagonal preconditioning
    (default; hashed bag-of-words is ill-conditioned: hot shared
    tokens dominate the curvature while the discriminative rare
    tokens carry tiny gradients) — is a single-threaded float
    computation on that exact gradient."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if optimizer not in ("adagrad", "gd"):
        raise ValueError("optimizer must be 'adagrad' or 'gd'")
    spark = feat.sparkSession
    w = np.zeros(dim + 1, dtype=np.float64)
    h = np.zeros(dim + 1, dtype=np.float64)
    losses: list[float] = []
    for _ in range(iters):
        w_b = spark.sparkContext.broadcast(w)
        rows = (
            _iter_gradient(feat, w_b, dim, quant)
            .groupBy("idx")
            .agg(F.sum("g").alias("g"))
            .collect()
        )
        w_b.unpersist()
        g = np.zeros(dim + 1, dtype=np.float64)
        loss_sum = 0.0
        n = 0
        for r in rows:
            if r["idx"] == dim + 1:
                loss_sum += r["g"]
            elif r["idx"] == dim + 2:
                n += r["g"]
            else:
                g[r["idx"]] += r["g"]
        if n == 0:
            raise ValueError("empty training input")
        g = g / quant / n
        if l2:
            g += l2 * w
        if optimizer == "adagrad":
            h += g * g
            step = g / (np.sqrt(h) + 1e-10)
            step[h == 0.0] = 0.0
            w = w - lr * step
        else:
            w = w - lr * g
        losses.append(loss_sum / quant / n)
    return w, losses


def score_documents(
    df: DataFrame, text_col: str, weights: np.ndarray, *, dim: int = 1 << 18,
    out_col: str = "quality_prob", tf_normalize: bool = True,
) -> DataFrame:
    """Pure-map scoring: sigmoid(w.x + bias) per document against the
    broadcast weights (Arrow-batched pandas UDF)."""
    spark = df.sparkSession
    w_b = spark.sparkContext.broadcast(np.asarray(weights, dtype=np.float64))

    @F.pandas_udf("double")
    def _score(idxs: pd.Series, vals: pd.Series) -> pd.Series:
        w = w_b.value
        idx_l, val_l = idxs.to_list(), vals.to_list()
        lens = np.fromiter((len(a) for a in idx_l), dtype=np.int64, count=len(idx_l))
        if lens.sum():
            cat_i = np.concatenate([np.asarray(a, dtype=np.int64) for a in idx_l])
            cat_v = np.concatenate([np.asarray(a, dtype=np.float64) for a in val_l])
            prod = w[cat_i] * cat_v
            bounds = np.zeros(len(idx_l) + 1, dtype=np.int64)
            np.cumsum(lens, out=bounds[1:])
            margins = np.add.reduceat(prod, np.minimum(bounds[:-1], len(prod) - 1))
        else:
            margins = np.zeros(len(idx_l))
        margins[lens == 0] = 0.0
        with np.errstate(over="ignore"):
            return pd.Series(1.0 / (1.0 + np.exp(-(margins + w[dim]))))

    # feature columns recomputed inline (no join back); MUST match the
    # training featurization mode
    t = _clean(text_col)
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(F.lower(t), rf"[{_WS}]+")
    )
    idxs = F.transform(toks, lambda x: F.pmod(F.xxhash64(x), F.lit(dim)).cast("int"))
    unit = (F.lit(1.0) / F.size(toks)) if tf_normalize else F.lit(1.0)
    vals = F.transform(toks, lambda x: unit)
    return df.withColumn(out_col, _score(idxs, vals))

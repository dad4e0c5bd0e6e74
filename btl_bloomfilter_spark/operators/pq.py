"""Product quantization (PQ) for embedding tables — the STORAGE-side
scale path of approximate nearest neighbor search.

IVF/LSH (operators/similarity) prune which vectors a query touches;
PQ shrinks what a vector IS: d float32 dims become ``m`` one-byte
codes (Jégou, Douze, Schmid: "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).  At 10^12 vectors the raw float table
is the bottleneck — a 64-d float32 table is 256 B/vector; with m=8
sub-blocks it scans at 8 B/vector, a 32x reduction, and queries
compute asymmetric distances (ADC) from a per-query lookup table
without ever reconstructing the floats.

Stages (same sampling discipline as similarity.fit_centroids):
1. ``fit_pq``: content-keyed sample -> seeded Lloyd k-means per
   contiguous dimension block (driver numpy; deterministic).
2. ``with_pq_codes``: distributed encode, one byte per block
   (mapInArrow, broadcast codebooks; pure map, no shuffle).
3. ``pq_topk``: per-query ADC table (m x K block distances, computed
   once on the driver) broadcast to a vectorized table-gather scan;
   top-k via orderBy+limit (TakeOrderedAndProject — per-partition
   heap, no global sort).

Distances are squared L2.  For cosine ranking, L2-normalize vectors
before encoding: ||a-b||^2 = 2 - 2cos(a,b) is monotone in cosine, so
ascending ADC order IS descending cosine order.

Contract: PQ is a SHORTLIST stage.  Codes cannot separate same-cell
near-ties, so "ADC top-k == exact top-k" is not the quantizer's
promise; "exact top-k ⊆ ADC top-K shortlist" (K a few times k) is —
re-rank the shortlist with exact distances on the float vectors of
just those K rows (a K-row lookup, not a corpus scan).  The recall
tests and q82's gates assert exactly this.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _lloyd(mat: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            pts = mat[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents


def fit_pq(
    df: DataFrame,
    *,
    col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Codebooks of shape (m, 2**nbits, d/m), float64.  The sample is
    the ``sample`` rows with the smallest content hash (content-keyed
    reservoir — partition-layout independent, like
    similarity.fit_centroids); each block trains with its own derived
    seed.  Raises if the dimension is not divisible by ``m`` or
    nbits > 8 (codes are one byte per block)."""
    if nbits < 1 or nbits > 8:
        raise ValueError("nbits must be in [1, 8] (one byte per block)")
    hkey = F.xxhash64(F.col(col).cast("array<double>"), F.lit(seed))
    rows = df.where(F.col(col).isNotNull()).select(col).orderBy(hkey).limit(sample).collect()
    mat = np.asarray([np.asarray(r[0], dtype=np.float64) for r in rows])
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    dsub, k = d // m, 1 << nbits
    return np.stack(
        [_lloyd(mat[:, j * dsub : (j + 1) * dsub], k, iters, seed + 1000 * (j + 1)) for j in range(m)]
    )


def _encode_mat(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float -> (n, m) uint8 nearest-codeword ids."""
    n = mat.shape[0]
    m, _, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        blk = mat[:, j * dsub : (j + 1) * dsub]
        dist = ((blk[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = dist.argmin(axis=1).astype(np.uint8)
    return codes


def with_pq_codes(
    df: DataFrame,
    codebooks: np.ndarray,
    *,
    col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Adds ``out_col: binary`` (m bytes per row; NULL for NULL
    vectors).  Pure map over the broadcast codebooks — this is the
    ingest-once step whose output replaces the float column in the
    10^12-row ANN index."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(np.asarray(codebooks, dtype=np.float64))

    @F.pandas_udf("binary")
    def _enc(embs: pd.Series) -> pd.Series:
        books = b.value
        ok = embs.notna()
        out = pd.Series([None] * len(embs), dtype=object)
        if ok.any():
            mat = np.asarray([np.asarray(e, dtype=np.float64) for e in embs[ok]])
            codes = _encode_mat(mat, books)
            out[np.flatnonzero(ok.to_numpy())] = [c.tobytes() for c in codes]
        return out

    return df.withColumn(out_col, _enc(F.col(col)))


def pq_adc_table(vec, codebooks: np.ndarray) -> np.ndarray:
    """(m, K) table of squared L2 distances from each query sub-vector
    to each codeword — the whole per-query cost that does not touch
    the corpus."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    q = np.asarray(vec, dtype=np.float64)
    return np.stack(
        [((books[j] - q[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(axis=1) for j in range(m)]
    )


def with_pq_distance(
    codes_df: DataFrame,
    vec,
    codebooks: np.ndarray,
    *,
    code_col: str = "pq_code",
    out_col: str = "pq_dist",
) -> DataFrame:
    """Adds ``out_col: double`` — the ADC approximate squared L2 from
    ``vec`` to each coded row (vectorized table gather, no float
    reconstruction)."""
    spark = codes_df.sparkSession
    tbl = spark.sparkContext.broadcast(pq_adc_table(vec, codebooks))

    @F.pandas_udf("double")
    def _dist(codes: pd.Series) -> pd.Series:
        t = tbl.value
        m = t.shape[0]
        ok = codes.notna()
        out = pd.Series(np.full(len(codes), np.nan))
        if ok.any():
            arr = np.frombuffer(b"".join(codes[ok]), dtype=np.uint8).reshape(-1, m)
            out[np.flatnonzero(ok.to_numpy())] = t[np.arange(m)[None, :], arr].sum(axis=1)
        return out

    return codes_df.withColumn(out_col, _dist(F.col(code_col)))


def pq_topk(
    codes_df: DataFrame,
    vec,
    k: int,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Approximate k nearest rows by ADC distance (ascending; ties by
    id for determinism).  TakeOrderedAndProject — no global sort."""
    scored = with_pq_distance(codes_df, vec, codebooks, code_col=code_col)
    return (
        scored.where(F.col("pq_dist").isNotNull())
        .select(id_col, F.round("pq_dist", 9).alias("pq_dist"))
        .orderBy("pq_dist", id_col)
        .limit(k)
    )


def ivfpq_topk(
    codes_df: DataFrame,
    vec,
    k: int,
    codebooks: np.ndarray,
    coarse_cents: np.ndarray,
    *,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    cell_col: str = "__cell",
    nprobe: int = 4,
) -> DataFrame:
    """IVF+PQ (the FAISS IVFPQ shape): probe the ``nprobe`` coarse
    cells nearest the query, ADC-scan only THOSE cells' codes.

    ``codes_df`` must carry both the PQ codes and a coarse cell id —
    build the index once with ``similarity.with_ivf_cells`` +
    :func:`with_pq_codes` and persist it partitioned by cell, so the
    ``isin`` filter prunes partitions at scan time and a query reads
    nprobe/n_cells of the codes, each row 8 bytes.  That compound
    reduction is what makes 10^12-vector search interactive."""
    q = np.asarray(vec, dtype=np.float64)
    d = ((np.asarray(coarse_cents, dtype=np.float64) - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d)[:nprobe]]
    return pq_topk(
        codes_df.where(F.col(cell_col).isin(probe)),
        vec,
        k,
        codebooks,
        id_col=id_col,
        code_col=code_col,
    )

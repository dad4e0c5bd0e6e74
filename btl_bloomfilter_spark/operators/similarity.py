"""Similarity search over embedding columns (array<float>).

- brute_topk: exact cosine top-k, pure JVM expressions
  (F.zip_with/F.aggregate dot product) — the correctness baseline.
- lsh_topk: random-hyperplane LSH bucketing — the scale path: only
  same-bucket (plus optional neighbor-bucket) vectors are scored, so
  a 100TB corpus probes a small slice instead of scanning everything.
- ivf_topk: IVF-style coarse quantization with seeded k-means
  centroids (driver fits on a sample, broadcasts); probes the
  nearest `nprobe` cells.

All scoring math stays in Spark built-ins; the only Python is the
Arrow-batched centroid-assignment kernel in IVF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_to(vec: list[float], col: str = "embedding"):
    """Column: cosine similarity of `col` to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in vec])
    return _dot(F.col(col), q) / (_norm(F.col(col)) * _norm(q))


def brute_topk(df: DataFrame, vec: list[float], k: int, *, id_col: str = "vec_id", col: str = "embedding") -> DataFrame:
    """Exact cosine top-k, deterministic tie-break on id."""
    return (
        df.select(F.col(id_col), F.round(cosine_to(vec, col), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# --------------------- random-hyperplane LSH -------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def _list_matrix(arr) -> tuple[np.ndarray, np.ndarray | None]:
    """(n, dim) float64 matrix + null-row mask from an Arrow
    List/FixedSizeList array by reshaping the flat values buffer —
    one C-level pass, no per-row ``np.asarray`` loop.  Null rows come
    back as zero vectors with the mask set.  Raises on ragged lists
    (embedding columns are fixed-dimension by contract)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    null_mask = None
    if arr.null_count:
        null_mask = ~np.asarray(arr.is_valid())
    flat = arr.flatten()  # values of valid rows, offset/null aware
    vals = flat.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    n_valid = n - (int(null_mask.sum()) if null_mask is not None else 0)
    if n_valid == 0:
        return np.zeros((n, 0), dtype=np.float64), null_mask
    if vals.size % n_valid:
        raise ValueError("ragged embedding lists: rows have differing dimensions")
    dim = vals.size // n_valid
    if null_mask is None:
        return vals.reshape(n, dim), None
    mat = np.zeros((n, dim), dtype=np.float64)
    mat[~null_mask] = vals.reshape(n_valid, dim)
    return mat, null_mask


def _signs_to_buckets(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (mat @ planes.T) > 0
    out = np.zeros(mat.shape[0], dtype=np.int64)
    for b in range(planes.shape[0]):
        out |= signs[:, b].astype(np.int64) << b
    return out


def with_lsh_buckets(
    df: DataFrame, *, col: str = "embedding", n_planes: int = 16, seed: int = 42, out_col: str = "__bucket"
) -> DataFrame:
    """Append the hyperplane-LSH bucket column via mapInArrow: the
    embedding column's values buffer is reshaped to an (n, dim) matrix
    directly (no per-row list→ndarray conversion), then one matmul
    signs all planes.  Null embeddings land in bucket 0.  This is the
    bucket-assignment hot path used by lsh_topk / cosine_near_dup_lsh /
    lsh_index_write; the pandas_udf variants remain for column-level
    composition."""
    import pyarrow as pa

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields] + [f"{out_col} long"]
    )

    def fn(batches):
        planes = None
        for rb in batches:
            emb = rb.column(rb.schema.get_field_index(col))
            mat, null_mask = _list_matrix(emb)
            if mat.shape[1] == 0:
                buckets = np.zeros(rb.num_rows, dtype=np.int64)
            else:
                if planes is None or planes.shape[1] != mat.shape[1]:
                    planes = _hyperplanes(mat.shape[1], n_planes, seed)
                buckets = _signs_to_buckets(mat, planes)
                if null_mask is not None:
                    buckets[null_mask] = 0
            yield pa.record_batch(
                [rb.column(i) for i in range(rb.num_columns)] + [pa.array(buckets, pa.int64())],
                names=[f.name for f in rb.schema] + [out_col],
            )

    return df.mapInArrow(fn, out_schema)


def with_ivf_cells(
    df: DataFrame, cents: np.ndarray, *, col: str = "embedding", out_col: str = "__cell"
) -> DataFrame:
    """Append the nearest-centroid cell id via mapInArrow (same
    buffer-reshape ingestion as :func:`with_lsh_buckets`)."""
    import pyarrow as pa

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields] + [f"{out_col} int"]
    )

    def fn(batches):
        for rb in batches:
            emb = rb.column(rb.schema.get_field_index(col))
            mat, null_mask = _list_matrix(emb)
            if mat.shape[1] == 0:
                cells = np.zeros(rb.num_rows, dtype=np.int32)
            else:
                d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                cells = d.argmin(axis=1).astype(np.int32)
                if null_mask is not None:
                    cells[null_mask] = -1
            yield pa.record_batch(
                [rb.column(i) for i in range(rb.num_columns)] + [pa.array(cells, pa.int32())],
                names=[f.name for f in rb.schema] + [out_col],
            )

    return df.mapInArrow(fn, out_schema)


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 42):
    planes = _hyperplanes(dim, n_planes, seed)

    @pandas_udf("long")
    def bucket(embs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(e, dtype=np.float64) for e in embs])
        if mat.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        signs = (mat @ planes.T) > 0
        out = np.zeros(len(embs), dtype=np.int64)
        for b in range(n_planes):
            out |= signs[:, b].astype(np.int64) << b
        return pd.Series(out)

    return bucket


def lsh_topk(
    df: DataFrame,
    vec: list[float],
    k: int,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's bucket or
    buckets within `probe_hamming` bit flips (multi-probe LSH).
    For repeated queries persist the buckets once with
    :func:`lsh_index_write` and probe via :func:`lsh_topk_indexed`
    (partition pruning instead of recomputing buckets per query)."""
    probes = _probe_buckets(vec, n_planes, seed, probe_hamming)
    bucketed = with_lsh_buckets(df.select(id_col, col), col=col, n_planes=n_planes, seed=seed)
    cand = bucketed.where(F.col("__bucket").isin(probes))
    return (
        cand.select(F.col(id_col), F.round(cosine_to(vec, col), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# ----------------- embedding-cosine near-duplicate pairs -------------


def cosine_pairs_brute(
    df: DataFrame, threshold: float, *, id_col: str = "vec_id", col: str = "embedding"
) -> DataFrame:
    """EXACT near-dup pairs: all (id_a < id_b) with cosine ≥ threshold.
    Pure JVM expressions; quadratic — the correctness baseline and
    oracle-comparable path (use the LSH variant at scale)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(col).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def cosine_near_dup_lsh(
    df: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Scale path: candidate pairs share one of ``bands`` exact-match
    bands of the ``n_planes``-bit hyperplane signature (two vectors at
    angle θ agree on a plane w.p. 1−θ/π, so near-dups collide in some
    band w.h.p.); candidates are then post-filtered by EXACT cosine —
    precision 1.0, recall probabilistic (raise bands / lower band
    width to trade shuffle volume for recall).  Only co-banded pairs
    ever materialize: shuffle is keyed by (band, band-bits)."""
    if n_planes % bands:
        raise ValueError("n_planes must be divisible by bands")
    width = n_planes // bands
    sig = with_lsh_buckets(
        df.select(F.col(id_col).alias("id"), F.col(col).alias("v")),
        col="v",
        n_planes=n_planes,
        seed=seed,
        out_col="sig",
    )
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    mask = (1 << width) - 1
    banded = sig.select("id", "v", "sig", band_idx).withColumn(
        "band_val", F.expr(f"shiftrightunsigned(sig, band * {width}) & {mask}")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (_norm(F.col("a.v")) * _norm(F.col("b.v")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


def _probe_buckets(vec, n_planes: int, seed: int, probe_hamming: int) -> list[int]:
    """Query bucket + all buckets within probe_hamming bit flips."""
    from itertools import combinations

    planes = _hyperplanes(len(vec), n_planes, seed)
    qv = np.asarray(vec, dtype=np.float64)
    qsig = 0
    for b, p in enumerate(planes):
        if float(p @ qv) > 0:
            qsig |= 1 << b
    probes = {qsig}
    for d in range(1, probe_hamming + 1):
        for bits in combinations(range(n_planes), d):
            flip = 0
            for b in bits:
                flip |= 1 << b
            probes.add(qsig ^ flip)
    return sorted(int(x) for x in probes)


def lsh_index_write(
    df: DataFrame,
    path: str,
    *,
    col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
) -> None:
    """Persist an LSH bucket index: the corpus written as parquet
    PARTITIONED BY the hyperplane bucket.  At query time only the
    probed buckets' files are read (partition pruning at the scan —
    the 100-TB path: a top-k probe touches ~(1+multiprobe)/2^planes
    of the corpus instead of scanning it)."""
    bucketed = with_lsh_buckets(df, col=col, n_planes=n_planes, seed=seed)
    bucketed.write.mode("overwrite").partitionBy("__bucket").parquet(path)


def lsh_topk_indexed(
    spark,
    path: str,
    vec: list[float],
    k: int,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Top-k over a persisted LSH index: the bucket filter is a
    partition-column predicate, so Catalyst prunes non-probed buckets
    at the file listing (verify with .explain: PartitionFilters).
    (n_planes, seed) must match the ones used at index-write time."""
    probes = _probe_buckets(vec, n_planes, seed, probe_hamming)
    cand = spark.read.parquet(path).where(F.col("__bucket").isin(probes))
    return (
        cand.select(F.col(id_col), F.round(cosine_to(vec, col), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def lsh_bucket_udf_auto(n_planes: int, seed: int):
    """lsh_bucket_udf that infers the dimension from each batch's
    first non-null row — no eager driver job, no crash on empty
    input; null embeddings land in bucket 0.  Plane generation is
    deterministic per (dim, n_planes, seed), so every worker derives
    identical planes."""

    @pandas_udf("long")
    def bucket(embs: pd.Series) -> pd.Series:
        out = np.zeros(len(embs), dtype=np.int64)
        vecs = [None if e is None else np.asarray(e, dtype=np.float64) for e in embs]
        nonnull = [i for i, v in enumerate(vecs) if v is not None]
        if not nonnull:
            return pd.Series(out)
        planes = _hyperplanes(vecs[nonnull[0]].shape[0], n_planes, seed)
        mat = np.stack([vecs[i] for i in nonnull])
        signs = (mat @ planes.T) > 0
        vals = np.zeros(len(nonnull), dtype=np.int64)
        for b in range(n_planes):
            vals |= signs[:, b].astype(np.int64) << b
        out[nonnull] = vals
        return pd.Series(out)

    return bucket


# ------------------------------ IVF ----------------------------------


def fit_centroids(df: DataFrame, *, col: str = "embedding", n_cells: int = 16, sample: int = 2048, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Seeded k-means on a driver-side sample (Lloyd iterations in
    numpy).  Deterministic given (seed, data).

    The sample is the `sample` rows with the smallest content hash —
    a content-keyed reservoir, NOT a `limit()` prefix (a prefix of a
    sorted/partitioned table trains centroids on a biased head) and
    NOT `df.sample()` (partition-order dependent).  TakeOrdered keeps
    it a single pass with a per-partition top-k, no full sort."""
    hkey = F.xxhash64(F.col(col).cast("array<double>"), F.lit(seed))
    rows = df.select(col).orderBy(hkey).limit(sample).collect()
    mat = np.asarray([np.asarray(r[0], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            pts = mat[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents


def ivf_assign_udf(cents: np.ndarray):
    @pandas_udf("int")
    def assign(embs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(e, dtype=np.float64) for e in embs])
        if mat.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return assign


def ivf_topk(
    df: DataFrame,
    vec: list[float],
    k: int,
    cents: np.ndarray,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    qv = np.asarray(vec, dtype=np.float64)
    d = ((cents - qv[None, :]) ** 2).sum(axis=1)
    probe_cells = [int(c) for c in np.argsort(d)[:nprobe]]
    assigned = with_ivf_cells(df.select(id_col, col), cents, col=col)
    cand = assigned.where(F.col("__cell").isin(probe_cells))
    return (
        cand.select(F.col(id_col), F.round(cosine_to(vec, col), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    n_cells: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    sample: int = 2048,
    iters: int = 10,
    cents: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster embeddings with the library's seeded k-means, then WITHIN
    each cluster greedily keep the smallest-id member of every
    cosine-≥threshold duplicate group.  Returns
    (id, cell, keep boolean, dup_of) — dropped rows carry the kept id
    that removed them (dup_of = -1 for kept rows).

    Greedy law (deterministic, id-ascending): a row is DROPPED iff
    some already-kept row in its cluster has cosine ≥ threshold with
    it; hence (a) no two KEPT rows in one cluster are ≥ threshold,
    and (b) every dropped row's ``dup_of`` is a kept row with
    cosine ≥ threshold — both checked by q47's gate columns.

    100-TB shape: comparisons never leave a cluster — ONE shuffle on
    the cell id (k-means fit reads only a bounded sample); the
    within-cluster pass compares each row against the cluster's KEPT
    set only (matrix-vector per row over ~|kept| ≤ |cluster| rows,
    no c×c matrix).  Cross-cluster near-duplicates are missed by
    design — that recall/cost trade is the published algorithm's; at
    higher recall lower n_cells (bigger clusters) or run
    cosine_near_dup_lsh instead.
    """
    import pandas as pd

    if cents is None:
        cents = fit_centroids(
            df, col=col, n_cells=n_cells, sample=sample, iters=iters, seed=seed
        )
    with_cell = with_ivf_cells(df.select(id_col, col), cents, col=col)
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, cell int, keep boolean, dup_of {id_type}"

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[col]])
        n = len(pdf)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        mat = mat / nrm[:, None]
        ids = pdf[id_col].to_numpy()
        keep = np.zeros(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        kept_rows: list[int] = []
        for i in range(n):
            if kept_rows:
                sims = mat[kept_rows] @ mat[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    dup_of[i] = ids[kept_rows[j]]
                    continue
            keep[i] = True
            kept_rows.append(i)
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": pdf["__cell"].to_numpy(),
                "keep": keep,
                "dup_of": dup_of,
            }
        )

    return with_cell.groupBy("__cell").applyInPandas(dedup_cluster, out_schema)

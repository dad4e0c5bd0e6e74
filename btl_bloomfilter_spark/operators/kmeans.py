"""Distributed integer-exact k-means (Lloyd) over embedding columns.

Embedding clustering is the organizing primitive of several
training-data curation passes — cluster-balanced sampling, SemDeDup's
within-cluster pruning (`operators/dedup.semantic_dedup` does the
pruning but takes its buckets from LSH), topic-stratified eval splits,
and the coarse quantizer of an IVF ANN index (`pq.ivfpq_topk` consumes
exactly the centroids this module trains).  Spark's MLlib KMeans is
float-nondeterministic (result depends on partitioning and on the
random init), which violates this library's rebuild-determinism
protocol and makes cross-engine verification impossible.  This
implementation makes every step EXACT INTEGER ARITHMETIC, so

  * the same input produces byte-identical centroids under ANY
    partitioning (the merge is a sum of int64 cells — associative and
    commutative, same law as the count sketches), and
  * the whole fit is expressible as an unrolled SQL CTE, so q125
    hash-oracles assignments AND distances against DuckDB.

The spec (every engine must follow it exactly):

  quantize   q_i = floor(double(x_i) * scale + 0.5) + offset
             — floor(v + 0.5) instead of round(v): Spark's round is
             HALF_UP, DuckDB's is HALF_EVEN, numpy's is HALF_EVEN;
             floor is exact and identical everywhere, and the +0.5 is
             the same IEEE double op in all three.  The float32 cell
             is widened to double BEFORE the multiply (DuckDB would
             otherwise multiply in float32 and round differently —
             observed off-by-one on real data).  `offset` makes every
             coordinate non-negative so integer division during the
             centroid update agrees between floor (Python //) and
             truncate (DuckDB //) semantics.
  init       centroids 0..k-1 = the quantized vectors of the k rows
             with the smallest (md5-hash60(seed|id), id) — the same
             content-keyed 60-bit hash as `functions/splits`, so the
             init is deterministic, engine-portable and data-spread.
  assign     argmin_j sum_d (q_d - c_jd)^2, ties -> lowest cluster id.
  update     c_jd' = sum(q_d over members) // |members| (floor
             division of non-negative ints); empty clusters keep
             their previous centroid.
  iterate    exactly `iters` assign+update rounds, then one final
             assign.  If an update leaves all centroids unchanged the
             remaining rounds are identities (assign and update are
             deterministic functions of the centroids), so the loop
             may stop early WITHOUT changing the result.

100-TB shape: one `mapInArrow` pass per iteration computes
PER-PARTITION partial sums — each partition ships at most k rows of
(cluster, n, d int64 sums), so the per-iteration shuffle is
O(partitions * k * d) longs regardless of row count, merged by a
map-side-combinable groupBy and collected as k*d rows to the driver
(centroids are broadcast-tiny by construction).  The final assignment
is a pure map.  Fit cost is `iters + 1` scans of the input — cache the
projected (id, vec) DataFrame, or fit on a deterministic subsample
(`functions.splits.sample_flag` composes: the flag is content-keyed,
so the fitted centroids stay reproducible) and spend the one full scan
on assignment only.

Overflow discipline (validated, not assumed): the kernel raises if a
quantized coordinate leaves [0, 2*offset], and fit raises up front if
d * (2*offset)^2 >= 2^63 (the worst single squared distance must fit
an int64).  Per-partition coordinate sums fit while partition rows
< 2^41; global sums while total rows < 2^41 — far beyond 10^12 rows.

Reference relation: btl_bloomfilter has no clustering; this serves
SURVEY's LLM-pipeline curation axis (cluster-balanced mixtures) and
trains `pq.ivfpq_topk`'s coarse cells.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..functions.splits import _hash60
from ..functions.vectors import rows_from_arrow as _rows_from_arrow

__all__ = [
    "DEFAULT_SCALE",
    "DEFAULT_OFFSET",
    "quantize_expr",
    "kmeans_fit",
    "kmeans_assign",
    "kmeans",
    "ivf_flat_topk",
]

DEFAULT_SCALE = 1_000_000  # micro grid, per the repo's fixed-point policy
DEFAULT_OFFSET = 1 << 21  # covers |x| <= 2.097 at the micro grid


def quantize_expr(vec_col: str, scale: int = DEFAULT_SCALE, offset: int = DEFAULT_OFFSET) -> Column:
    """Catalyst twin of the kernel's quantization — used by the parity
    test to pin that the JVM expression and the numpy kernel agree
    element-for-element (both are floor(double(x)*scale + 0.5) +
    offset; Spark's floor(double) returns LONG)."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale)) + F.lit(0.5)) + F.lit(int(offset)),
    )


def _quantize(rows: np.ndarray, scale: int, offset: int) -> np.ndarray:
    q = np.floor(rows * float(scale) + 0.5).astype(np.int64) + int(offset)
    if q.size and (q.min() < 0 or q.max() > 2 * offset):
        raise ValueError(
            f"quantized coordinate outside [0, {2 * offset}] "
            f"(min {q.min()}, max {q.max()}): raise `offset` (and keep "
            "d * (2*offset)^2 < 2^63) so centroid division stays in the "
            "non-negative domain the cross-engine law depends on"
        )
    return q


def _check_bounds(d: int, offset: int) -> None:
    if d * (2 * offset) ** 2 >= 2**63:
        raise ValueError(
            f"d={d} at offset={offset} can overflow int64 squared "
            "distances (d * (2*offset)^2 >= 2^63); lower `offset`/`scale`"
        )


def _assign_chunk(q: np.ndarray, cents: np.ndarray, chunk: int = 2048):
    """Exact argmin over int64 distances; ties -> lowest cluster id
    (np.argmin returns the first minimum).  Chunked so the (n, k, d)
    intermediate stays ~chunk*k*d*8 bytes."""
    n = q.shape[0]
    out_a = np.empty(n, dtype=np.int64)
    out_d = np.empty(n, dtype=np.int64)
    for i in range(0, n, chunk):
        qc = q[i : i + chunk]
        dist = ((qc[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = dist.argmin(axis=1)
        out_a[i : i + chunk] = a
        out_d[i : i + chunk] = dist[np.arange(len(qc)), a]
    return out_a, out_d


def _partials_kernel(cents: np.ndarray, vec_idx: int, scale: int, offset: int):
    """mapInArrow kernel: fold a whole partition into at most k rows of
    (cluster, n, d int64 sums) — the per-iteration shuffle payload."""
    k, d = cents.shape

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa

        acc_n = np.zeros(k, dtype=np.int64)
        acc_s = np.zeros((k, d), dtype=np.int64)
        for batch in batches:
            rows = _rows_from_arrow(batch.column(vec_idx), d)
            if not rows.shape[0]:
                continue
            q = _quantize(rows, scale, offset)
            a, _ = _assign_chunk(q, cents)
            for j in np.unique(a):
                m = a == j
                acc_n[j] += int(m.sum())
                acc_s[j] += q[m].sum(axis=0)
        live = np.flatnonzero(acc_n)
        if len(live):
            yield pa.RecordBatch.from_pydict(
                {
                    "cluster": pa.array(live.astype(np.int32)),
                    "n": pa.array(acc_n[live]),
                    "sums": pa.array([acc_s[j].tolist() for j in live], pa.list_(pa.int64())),
                }
            )

    return run


def kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    offset: int = DEFAULT_OFFSET,
    seed: int | str = 0,
) -> tuple[np.ndarray, dict[str, Any]]:
    """Train integer-exact centroids; returns ((k, d) int64 array in
    the quantized+offset domain, info dict with per-iteration cluster
    sizes and the early-convergence round if any)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    seeds = (
        df.select(id_col, vec_col)
        .withColumn("__h", _hash60([id_col], seed))
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds the {len(seeds)} input rows")
    mat = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in seeds])
    _check_bounds(mat.shape[1], offset)
    cents = _quantize(mat, scale, offset)
    d = cents.shape[1]
    vec_only = df.select(vec_col)
    info: dict[str, Any] = {"sizes": [], "converged_at": None, "k": k, "d": d}
    for t in range(iters):
        parts = vec_only.mapInArrow(
            _partials_kernel(cents, 0, scale, offset),
            "cluster int, n long, sums array<long>",
        )
        merged = (
            parts.select("cluster", "n", F.posexplode("sums").alias("dim", "s"))
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new_cents = cents.copy()
        sizes = np.zeros(k, dtype=np.int64)
        for r in merged:
            new_cents[r.cluster, r.dim] = r.s // r.n  # non-negative: floor == trunc
            sizes[r.cluster] = r.n
        info["sizes"].append(sizes.tolist())
        if np.array_equal(new_cents, cents):
            info["converged_at"] = t + 1  # fixpoint: remaining rounds are identities
            break
        cents = new_cents
    return cents, info


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    offset: int = DEFAULT_OFFSET,
) -> DataFrame:
    """Pure-map assignment: (id, cluster, qdist) with qdist the exact
    integer squared distance in the quantized domain.  No shuffle; the
    centroid table travels in the task closure (k*d*8 bytes)."""
    cents = np.ascontiguousarray(np.asarray(centroids, dtype=np.int64))
    _check_bounds(cents.shape[1], offset)
    id_type = df.schema[id_col].dataType.simpleString()
    d = cents.shape[1]

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            rows = _rows_from_arrow(batch.column(1), d)
            if not rows.shape[0]:
                continue
            q = _quantize(rows, scale, offset)
            a, dist = _assign_chunk(q, cents)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(a.astype(np.int32)), pa.array(dist)],
                names=[id_col, "cluster", "qdist"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        run, f"{id_col} {id_type}, cluster int, qdist long"
    )


def kmeans(
    df: DataFrame,
    k: int,
    iters: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    offset: int = DEFAULT_OFFSET,
    seed: int | str = 0,
) -> tuple[DataFrame, np.ndarray, dict[str, Any]]:
    """Fit + final assignment in one call (iters + 1 scans; cache the
    projected input first when it fits)."""
    cents, info = kmeans_fit(
        df, k, iters, id_col=id_col, vec_col=vec_col, scale=scale, offset=offset, seed=seed
    )
    asg = kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col, scale=scale, offset=offset)
    return asg, cents, info


def ivf_flat_topk(
    df: DataFrame,
    centroids: np.ndarray,
    query_ids: list,
    topk: int,
    nprobe: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    offset: int = DEFAULT_OFFSET,
) -> DataFrame:
    """IVF-flat ANN: for each query (a row of the table named by id),
    probe the ``nprobe`` centroids nearest the query and return the
    exact integer-distance top-``topk`` among vectors ASSIGNED to the
    probed cells — (query_id, rank, vec_id, qdist).

    Everything is the same int64 arithmetic as the fit, so the result
    is deterministic and (given the same centroids) exactly
    reproducible in SQL — q128 hash-oracles it end to end, which no
    float ANN can offer.  With ``nprobe >= k`` the probe set is every
    cell and the result provably equals brute-force top-k (pinned in
    tests); smaller nprobe trades recall for scan fraction exactly as
    IVF is meant to.

    Plan shape: ONE pure-map scan — the kernel knows each query's
    probe set and emits (query, vec, dist) rows only for vectors in a
    probed cell — then one shuffle where WindowGroupLimit keeps top-k
    per query on both sides, so the exchange carries at most
    queries × partitions × topk rows.  At rest, write the assignment
    partitioned by cluster and the probe filter becomes partition
    pruning (same layout note as pq.ivfpq_topk); the scan then reads
    nprobe/k of the corpus.
    """
    from pyspark.sql import Window

    cents = np.ascontiguousarray(np.asarray(centroids, dtype=np.int64))
    k, d = cents.shape
    _check_bounds(d, offset)
    if not 1 <= nprobe:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    nprobe = min(int(nprobe), k)
    if len(set(query_ids)) != len(list(query_ids)):
        # validate BEFORE the table scan — rejecting a bad argument
        # list must not cost a cluster job
        raise ValueError(
            "duplicate query ids: each duplicate would emit its candidates "
            "twice into the same top-k window and silently halve the result"
        )
    qrows = {
        r[id_col]: np.asarray(r[vec_col], dtype=np.float64)
        for r in df.where(F.col(id_col).isin(list(query_ids)))
        .select(id_col, vec_col)
        .collect()
    }
    missing = [q for q in query_ids if q not in qrows]
    if missing:
        raise ValueError(f"query ids not present in the table: {missing}")
    qmat = _quantize(np.stack([qrows[q] for q in query_ids]), scale, offset)
    # probe sets: nprobe nearest centroids per query, ties -> lowest id
    qc = ((qmat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qc, axis=1, kind="stable")[:, :nprobe]
    probe_of = {}  # cluster -> [(query index, qvec)]
    for qi in range(len(query_ids)):
        for c in probes[qi]:
            probe_of.setdefault(int(c), []).append(qi)
    id_type = df.schema[id_col].dataType.simpleString()
    qid_vals = list(query_ids)

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            rows = _rows_from_arrow(batch.column(1), d)
            if not rows.shape[0]:
                continue
            q = _quantize(rows, scale, offset)
            a, _ = _assign_chunk(q, cents)
            ids = batch.column(0)
            out_qi, out_row, out_dist = [], [], []
            for c, qis in probe_of.items():
                m = np.flatnonzero(a == c)
                if not len(m):
                    continue
                for qi in qis:
                    dist = ((q[m] - qmat[qi][None, :]) ** 2).sum(axis=1)
                    out_qi.extend([qi] * len(m))
                    out_row.extend(m.tolist())
                    out_dist.extend(dist.tolist())
            if out_qi:
                yield pa.RecordBatch.from_arrays(
                    [
                        # pin the id column's own arrow type: bare
                        # pa.array() infers int64 for Python ints and
                        # trips schema validation for int/short ids
                        pa.array([qid_vals[i] for i in out_qi], type=ids.type),
                        ids.take(pa.array(out_row, pa.int32())),
                        pa.array(np.asarray(out_dist, dtype=np.int64)),
                    ],
                    names=["query_id", id_col, "qdist"],
                )

    cand = df.select(id_col, vec_col).mapInArrow(
        run, f"query_id {id_type}, {id_col} {id_type}, qdist long"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("qdist"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(topk))
        .select("query_id", "rank", id_col, "qdist")
    )

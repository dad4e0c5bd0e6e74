"""Integer-exact k-means: brute-force parity, partition invariance,
tie/empty-cluster laws, quantization twins, bound validation."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.kmeans import (
    DEFAULT_OFFSET,
    DEFAULT_SCALE,
    kmeans,
    kmeans_assign,
    kmeans_fit,
    quantize_expr,
)


def _hash60_py(seed, vid) -> int:
    return int(hashlib.md5(f"{seed}|{vid}".encode()).hexdigest()[:15], 16)


def _brute_kmeans(ids, X, k, iters, seed, scale=DEFAULT_SCALE, offset=DEFAULT_OFFSET):
    """Independent driver-side implementation of the exact spec."""
    Q = (np.floor(np.asarray(X, dtype=np.float64) * scale + 0.5) + offset).astype(np.int64)
    order = sorted(range(len(ids)), key=lambda i: (_hash60_py(seed, ids[i]), ids[i]))
    C = Q[order[:k]].copy()

    def assign(C):
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        return a, d[np.arange(len(Q)), a]

    for _ in range(iters):
        a, _ = assign(C)
        newC = C.copy()
        for j in range(k):
            m = a == j
            if m.any():
                newC[j] = Q[m].sum(axis=0) // m.sum()
        if np.array_equal(newC, C):
            break
        C = newC
    a, dist = assign(C)
    return C, {int(i): (int(c), int(dd)) for i, c, dd in zip(ids, a, dist)}


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding").cache()


def test_matches_brute_force_exactly(spark, emb):
    rows = emb.collect()
    ids = [r.vec_id for r in rows]
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    bC, basg = _brute_kmeans(ids, X, k=5, iters=3, seed=11)
    asg, cents, info = kmeans(emb, k=5, iters=3, seed=11)
    assert np.array_equal(cents, bC)
    got = {r.vec_id: (r.cluster, r.qdist) for r in asg.collect()}
    assert got == basg
    assert len(info["sizes"]) >= 1 and sum(info["sizes"][0]) == len(ids)


def test_partition_invariance(spark, emb):
    c1, _ = kmeans_fit(emb, k=4, iters=3, seed=2)
    c2, _ = kmeans_fit(emb.repartition(7), k=4, iters=3, seed=2)
    c3, _ = kmeans_fit(emb.repartition(1), k=4, iters=3, seed=2)
    assert np.array_equal(c1, c2) and np.array_equal(c1, c3)


def test_early_convergence_is_a_fixpoint(spark, emb):
    c_long, info = kmeans_fit(emb, k=3, iters=50, seed=0)
    assert info["converged_at"] is not None
    c_exact, _ = kmeans_fit(emb, k=3, iters=info["converged_at"], seed=0)
    assert np.array_equal(c_long, c_exact)


def test_assignment_tie_goes_to_lowest_cluster(spark):
    # point at 0 equidistant from centroids at -q and +q
    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<double>")
    cents = np.asarray([[DEFAULT_OFFSET - 5], [DEFAULT_OFFSET + 5]], dtype=np.int64)
    r = kmeans_assign(df, cents).collect()[0]
    assert (r.cluster, r.qdist) == (0, 25)


def test_duplicate_points_empty_cluster_keeps_centroid(spark):
    # all rows identical: every row lands in the lowest-id cluster of
    # the two identical centroids; cluster 1 stays empty and must keep
    # its init centroid verbatim
    df = spark.createDataFrame(
        [(i, [0.25, -0.5]) for i in range(6)], "vec_id long, embedding array<double>"
    )
    cents, info = kmeans_fit(df, k=2, iters=3, seed=1)
    q = np.floor(np.asarray([0.25, -0.5]) * DEFAULT_SCALE + 0.5).astype(np.int64) + DEFAULT_OFFSET
    assert np.array_equal(cents[0], q) and np.array_equal(cents[1], q)
    assert info["sizes"][0] == [6, 0]


def test_quantize_expr_matches_kernel(spark, emb):
    # the Catalyst twin and the numpy kernel must agree element-for-element
    rows = emb.select("vec_id", quantize_expr("embedding").alias("qv")).collect()
    raw = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}
    for r in rows:
        q = (np.floor(raw[r.vec_id] * DEFAULT_SCALE + 0.5) + DEFAULT_OFFSET).astype(np.int64)
        assert list(q) == list(r.qv)


def test_offset_violation_raises(spark):
    df = spark.createDataFrame([(1, [9.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="quantized coordinate outside"):
        kmeans_fit(df, k=1, iters=1)


def test_int64_bound_check_raises(spark):
    df = spark.createDataFrame([(1, [0.1] * 4)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="overflow int64"):
        kmeans_fit(df, k=1, iters=1, offset=1 << 31)


def test_k_exceeds_rows_raises(spark):
    df = spark.createDataFrame([(1, [0.1])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(df, k=3, iters=1)


def test_assign_plan_is_pure_map(spark, emb):
    cents, _ = kmeans_fit(emb, k=3, iters=1, seed=5)
    plan = kmeans_assign(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ivf_flat_probe_all_equals_brute_force(spark, emb):
    from btl_bloomfilter_spark.operators.kmeans import ivf_flat_topk

    cents, _ = kmeans_fit(emb, k=6, iters=3, seed=9)
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Q = (np.floor(X * DEFAULT_SCALE + 0.5) + DEFAULT_OFFSET).astype(np.int64)
    qids = [int(ids[0]), int(ids[len(ids) // 2])]
    # nprobe >= k probes every cell: must equal exhaustive top-k exactly
    got = ivf_flat_topk(emb, cents, qids, topk=10, nprobe=6).collect()
    for qid in qids:
        qv = Q[list(ids).index(qid)]
        d = ((Q - qv[None, :]) ** 2).sum(axis=1)
        order = sorted(zip(d.tolist(), ids.tolist()))[:10]
        mine = sorted(
            [(r.qdist, r.vec_id) for r in got if r.query_id == qid],
        )
        assert mine == order


def test_ivf_flat_partial_probe_subset_and_recall(spark, emb):
    from btl_bloomfilter_spark.operators.kmeans import ivf_flat_topk, kmeans_assign

    cents, _ = kmeans_fit(emb, k=6, iters=3, seed=9)
    asg = {r.vec_id: r.cluster for r in kmeans_assign(emb, cents).collect()}
    got = ivf_flat_topk(emb, cents, [3], topk=10, nprobe=2).collect()
    assert len(got) == 10 and [r.rank for r in sorted(got, key=lambda r: r.rank)] == list(
        range(1, 11)
    )
    # every candidate comes from a probed cell, and the query's own
    # cell is always probed (distance 0 to its centroid is minimal...
    # not guaranteed in general, but rank-1 must be the query itself
    # whenever its own cell is probed; assert the weaker subset law)
    clusters_used = {asg[r.vec_id] for r in got}
    assert len(clusters_used) <= 2
    # full probe dominates partial probe: partial results are a subset
    # of candidates, so best partial dist >= best full dist
    full = ivf_flat_topk(emb, cents, [3], topk=10, nprobe=6).collect()
    assert min(r.qdist for r in got) >= min(r.qdist for r in full)


def test_ivf_flat_missing_query_raises(spark, emb):
    from btl_bloomfilter_spark.operators.kmeans import ivf_flat_topk

    cents, _ = kmeans_fit(emb, k=3, iters=1, seed=9)
    with pytest.raises(ValueError, match="not present"):
        ivf_flat_topk(emb, cents, [10**9], topk=5, nprobe=2)


def test_q129_planted_twins_recovered_exactly(spark, sf_dir):
    # board query gate at test scale: the 0.999-scaled twins are the
    # ONLY pairs above the 0.95 integer cosine law (max natural cosine
    # in the synthetic corpus is ~0.51), and each twin co-clusters with
    # its original under the L2 fit
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_entry129", "/root/repo/__spark_entry__.py"
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    rows = em.queries()["q129_semantic_dedup_exact"](spark, sf_dir).collect()
    n_planted = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        "vec_id % 25 = 0"
    ).count()
    assert len(rows) == n_planted > 0
    assert all(r.id_b == r.id_a + 100000 and r.id_a % 25 == 0 for r in rows)
    # the law's pieces are exact ints and the twin's cosine is ~1:
    # 10^6 dot^2 vs 902500 na nb must hold with slack
    for r in rows:
        assert 10**6 * r.dot * r.dot >= 902500 * r.norm_a * r.norm_b


def test_ivf_flat_duplicate_query_ids_raise(spark, emb):
    from btl_bloomfilter_spark.operators.kmeans import ivf_flat_topk

    cents, _ = kmeans_fit(emb, k=3, iters=1, seed=9)
    with pytest.raises(ValueError, match="duplicate query ids"):
        ivf_flat_topk(emb, cents, [3, 3], topk=5, nprobe=2)


def test_ivf_flat_int_id_column(spark):
    # pa.array() infers int64 for Python ints; the kernel must pin the
    # id column's own arrow type or mapInArrow schema validation fails
    from btl_bloomfilter_spark.operators.kmeans import ivf_flat_topk, kmeans_fit

    df = spark.createDataFrame(
        [(i, [0.01 * i, -0.02 * i]) for i in range(40)],
        "vec_id int, embedding array<double>",
    )
    cents, _ = kmeans_fit(df, k=2, iters=2, seed=1)
    rows = ivf_flat_topk(df, cents, [5], topk=3, nprobe=2).collect()
    assert [r.vec_id for r in rows if r.rank == 1] == [5]


def test_rows_from_arrow_empty_fixed_width_mismatch_raises():
    import pyarrow as pa

    from btl_bloomfilter_spark.functions.vectors import rows_from_arrow

    empty5 = pa.array([], pa.list_(pa.float64(), 5))
    with pytest.raises(ValueError, match="expected dim 3"):
        rows_from_arrow(empty5, 3)
    assert rows_from_arrow(empty5, 5).shape == (0, 5)

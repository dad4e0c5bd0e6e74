"""Product quantization: ADC-vs-naive exactness, refit determinism,
recall on clustered data, null handling, code width."""
import numpy as np
import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.pq import (
    _encode_mat,
    fit_pq,
    pq_adc_table,
    pq_topk,
    with_pq_codes,
    with_pq_distance,
)


def _blobs(n=400, d=16, n_blobs=8, seed=7):
    rng = np.random.default_rng(seed)
    cents = rng.normal(0, 5.0, size=(n_blobs, d))
    lab = rng.integers(0, n_blobs, size=n)
    return cents[lab] + rng.normal(0, 0.3, size=(n, d))


def _df(spark, mat):
    pdf = pd.DataFrame(
        {"vec_id": range(len(mat)), "embedding": [list(map(float, r)) for r in mat]}
    )
    return spark.createDataFrame(pdf)


@pytest.mark.spark
def test_fit_deterministic_and_shapes(spark):
    mat = _blobs()
    df = _df(spark, mat)
    b1 = fit_pq(df, m=4, nbits=4, sample=300, seed=1)
    b2 = fit_pq(df.repartition(8), m=4, nbits=4, sample=300, seed=1)
    assert b1.shape == (4, 16, 4)
    assert np.array_equal(b1, b2)  # partition-invariant training
    with pytest.raises(ValueError, match="divisible"):
        fit_pq(df, m=5)
    with pytest.raises(ValueError, match="nbits"):
        fit_pq(df, m=4, nbits=9)


@pytest.mark.spark
def test_adc_matches_naive_and_roundtrip(spark):
    mat = _blobs()
    df = _df(spark, mat)
    books = fit_pq(df, m=4, nbits=4, sample=300, seed=2)
    q = mat[17]
    coded = with_pq_codes(df, books)
    rows = with_pq_distance(coded, list(q), books).orderBy("vec_id").collect()
    codes = _encode_mat(mat, books)
    tbl = pq_adc_table(q, books)
    naive = tbl[np.arange(4)[None, :], codes].sum(axis=1)
    got = np.array([r.pq_dist for r in rows])
    assert np.allclose(got, naive, rtol=0, atol=1e-9)  # same arithmetic
    # every code is m bytes
    assert all(len(r.pq_code) == 4 for r in coded.collect())


@pytest.mark.spark
def test_recall_vs_bruteforce(spark):
    # PQ's contract is SHORTLIST quality: the exact top-10 must land
    # in the ADC top-50 shortlist that a re-rank stage then orders
    # exactly (codes can't separate same-cell near-ties, so strict
    # top-10==top-10 is not the quantizer's promise)
    mat = _blobs(n=500, d=16, n_blobs=6, seed=11)
    df = _df(spark, mat)
    books = fit_pq(df, m=8, nbits=6, sample=400, seed=3)
    coded = with_pq_codes(df, books).select("vec_id", "pq_code").cache()
    recalls = []
    for qi in (5, 99, 250):
        q = mat[qi]
        exact = set(np.argsort(((mat - q[None, :]) ** 2).sum(axis=1))[:10].tolist())
        short = {r.vec_id for r in pq_topk(coded, list(q), 50, books).collect()}
        recalls.append(len(exact & short) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    coded.unpersist()


@pytest.mark.spark
def test_ivfpq_shortlist(spark):
    from btl_bloomfilter_spark.operators.pq import ivfpq_topk
    from btl_bloomfilter_spark.operators.similarity import fit_centroids, with_ivf_cells

    mat = _blobs(n=500, d=16, n_blobs=6, seed=21)
    df = _df(spark, mat)
    cents = fit_centroids(df, n_cells=6, sample=400, seed=8)
    books = fit_pq(df, m=8, nbits=6, sample=400, seed=8)
    index = with_ivf_cells(with_pq_codes(df, books), cents).select(
        "vec_id", "pq_code", "__cell"
    ).cache()
    recalls = []
    for qi in (3, 77, 410):
        q = mat[qi]
        exact = set(np.argsort(((mat - q[None, :]) ** 2).sum(axis=1))[:10].tolist())
        short = {r.vec_id for r in ivfpq_topk(index, list(q), 50, books, cents, nprobe=2).collect()}
        recalls.append(len(exact & short) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    # nprobe=all cells degenerates to plain pq_topk
    all_cells = {r.vec_id for r in ivfpq_topk(index, list(mat[3]), 50, books, cents, nprobe=6).collect()}
    plain = {r.vec_id for r in pq_topk(index, list(mat[3]), 50, books).collect()}
    assert all_cells == plain
    index.unpersist()


@pytest.mark.spark
def test_null_vectors(spark):
    pdf = pd.DataFrame({"vec_id": [0, 1], "embedding": [[1.0, 2.0, 3.0, 4.0], None]})
    df = spark.createDataFrame(pdf)
    books = fit_pq(df, m=2, nbits=2, sample=10, seed=4)
    coded = with_pq_codes(df, books)
    rows = {r.vec_id: r.pq_code for r in coded.collect()}
    assert rows[1] is None and rows[0] is not None
    out = pq_topk(coded, [1.0, 2.0, 3.0, 4.0], 5, books)
    assert {r.vec_id for r in out.collect()} == {0}  # null row excluded

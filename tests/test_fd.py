"""Frequent Directions: exactness below capacity, the PSD and spectral
bound guarantees vs the exact Gramian, ledger accounting, merge law,
Arrow paths, state roundtrip, and the distributed build."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.base import Sketch
from btl_bloomfilter_spark.operators.fd import FrequentDirections, exact_gramian


def _data(n=500, d=24, seed=0):
    rng = np.random.default_rng(seed)
    # low-rank + noise: the regime FD is for
    u = rng.normal(size=(n, 4))
    v = rng.normal(size=(4, d))
    return u @ v * 3.0 + rng.normal(size=(n, d)) * 0.3


def _spec_err(A, fd):
    diff = A.T @ A - fd.gram()
    w = np.linalg.eigvalsh(diff)
    return w.min(), w.max()


def test_exact_below_capacity():
    A = _data(n=15, d=8)
    fd = FrequentDirections(ell=16, dim=8)
    fd.update(A)
    # buffer (2*ell=32) never overflowed: sketch holds the raw rows
    assert np.allclose(fd.gram(), A.T @ A)
    assert fd.shrunk_total == 0.0
    assert fd.n_entry == 15


def test_exact_when_dim_leq_ell():
    # <= ell directions exist: every shrink is lossless
    A = _data(n=400, d=6)
    fd = FrequentDirections(ell=8, dim=6)
    fd.update(A)
    lo, hi = _spec_err(A, fd)
    assert abs(lo) < 1e-6 and abs(hi) < 1e-6
    assert fd.shrunk_total == 0.0


def test_psd_and_spectral_bound():
    A = _data(n=800, d=24, seed=1)
    fd = FrequentDirections(ell=8, dim=24)
    fd.update(A)
    lo, hi = _spec_err(A, fd)
    fn2 = float((A * A).sum())
    assert lo >= -1e-6 * fn2          # PSD: sketch never overcounts
    assert hi <= fd.error_bound() + 1e-6 * fn2  # tight ledger certificate
    assert fd.error_bound() <= fn2 / fd.ell + 1e-9  # paper bound
    assert fd.fnorm2 == pytest.approx(fn2)
    # the sketch is non-trivial: top direction aligned within the bound
    exact_top = np.linalg.eigvalsh(A.T @ A)[-1]
    sk_top = np.linalg.eigvalsh(fd.gram())[-1]
    assert exact_top - fd.error_bound() - 1e-6 <= sk_top <= exact_top + 1e-6 * fn2


def test_merge_bound_and_ledger():
    A = _data(n=1200, d=24, seed=2)
    parts = np.array_split(A, 5)
    fds = []
    for p in parts:
        f = FrequentDirections(ell=8, dim=24)
        f.update(p)
        fds.append(f)
    merged = fds[0]
    for f in fds[1:]:
        merged.merge(f)
    fn2 = float((A * A).sum())
    assert merged.fnorm2 == pytest.approx(fn2)
    assert merged.n_entry == A.shape[0]
    lo, hi = _spec_err(A, merged)
    assert lo >= -1e-6 * fn2
    assert hi <= merged.error_bound() + 1e-6 * fn2
    assert merged.error_bound() <= fn2 / 8 + 1e-9


def test_state_roundtrip():
    A = _data(n=300, d=16, seed=3)
    fd = FrequentDirections(ell=6, dim=16)
    fd.update(A)
    back = Sketch.deserialize(fd.serialize())
    assert isinstance(back, FrequentDirections)
    assert np.allclose(back.gram(), fd.gram())
    assert back.fnorm2 == fd.fnorm2 and back.shrunk_total == fd.shrunk_total
    assert back.n_entry == fd.n_entry


def test_update_arrow_paths():
    import pyarrow as pa

    A = _data(n=100, d=8, seed=4)
    lst = pa.array([row.tolist() for row in A], pa.list_(pa.float32()))
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(A.astype(np.float32).ravel()), 8
    )
    ref = FrequentDirections(ell=32, dim=8)
    ref.update(A.astype(np.float32).astype(np.float64))
    for arr in (lst, fsl):
        fd = FrequentDirections(ell=32, dim=8)
        fd.update_arrow(arr)
        assert np.allclose(fd.gram(), ref.gram())
    # ragged raises
    bad = pa.array([[1.0, 2.0], [1.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        FrequentDirections(ell=4, dim=2).update_arrow(bad)
    withnull = pa.array([[1.0, 2.0], None], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        FrequentDirections(ell=4, dim=2).update_arrow(withnull)


def test_exact_gramian_distributed(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = np.array([r.embedding for r in emb.select("embedding").collect()])
    gram, n = exact_gramian(emb.repartition(5), "embedding", rows.shape[1])
    assert n == rows.shape[0]
    assert np.allclose(gram, rows.astype(np.float64).T @ rows.astype(np.float64))


def test_distributed_build_satisfies_bound(spark, sf_dir):
    from btl_bloomfilter_spark.plans.agg import build_sketch

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    fd = build_sketch(
        emb.repartition(7), "embedding", lambda: FrequentDirections(ell=8, dim=dim)
    )
    gram, n = exact_gramian(emb, "embedding", dim)
    assert fd.n_entry == n
    fn2 = float(np.trace(gram))
    assert fd.fnorm2 == pytest.approx(fn2, rel=1e-9)
    diff = gram - fd.gram()
    w = np.linalg.eigvalsh(diff)
    assert w.min() >= -1e-6 * fn2
    assert w.max() <= fd.error_bound() + 1e-6 * fn2
    assert fd.error_bound() <= fn2 / 8 + 1e-9


def test_exact_gramian_rejects_malformed(spark):
    # the review scenario: ragged lengths whose total element count
    # divides the row count would previously reshape into a misaligned
    # matrix and SILENTLY corrupt the "exact" ground truth; nulls died
    # with an opaque reshape error.  Both must raise ValueError now.
    import pyspark.sql.functions as F

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0, 6.0, 7.0, 8.0])],
        "id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="ragged"):
        exact_gramian(ragged.coalesce(1), "embedding", 4)
    withnull = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="null embeddings"):
        exact_gramian(withnull, "embedding", 2)
    wrongdim = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="expected dim"):
        exact_gramian(wrongdim, "embedding", 2)


def test_update_arrow_empty_fixed_size_list():
    # empty FixedSizeList batch previously tripped numpy's
    # reshape(0, -1); the shared converter must return a (0, d) matrix
    import pyarrow as pa

    fd = FrequentDirections(ell=4, dim=3)
    fd.update_arrow(pa.array([], pa.list_(pa.float64(), 3)))
    assert fd.n_entry == 0

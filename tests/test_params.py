"""Sizing/FPR formula tests pinning the reference math
(BloomFilter.hpp:406-429, swig/writeBloom_rolling.cpp:101-103)."""

import math

import pytest

from btl_bloomfilter_spark import params as P


@pytest.mark.parametrize("n", [1_000, 100_000, 10_000_000])
@pytest.mark.parametrize("fpr", [1e-2, 1e-4])
def test_optimal_size_grid(n, fpr):
    m, h = P.calc_optimal_size(n, fpr)
    assert m % 64 == 0
    assert h == max(1, int(-math.log(fpr) / math.log(2) + 0.5))
    raw = -n * h / math.log(1 - fpr ** (1 / h))
    assert raw <= m < raw + 64
    # at the optimal size the theoretical FPR is ~the target
    assert P.fpr_num_inserted(n, m, h) <= fpr * 1.01


@pytest.mark.parametrize("n", [1_000, 100_000])
@pytest.mark.parametrize("fpr", [1e-2, 1e-4])
def test_cli_sizing(n, fpr):
    m, h = P.cli_sizing(n, fpr)
    assert m == math.ceil(-n * math.log(fpr) / math.log(2) ** 2)
    assert h == int(m / n * math.log(2))
    assert P.fpr_num_inserted(n, m, h) <= fpr * 1.2


def test_fpr_monotone_in_n():
    m, h = 1 << 20, 5
    f = [P.fpr_num_inserted(n, m, h) for n in (0, 10, 100, 1000, 10**5)]
    assert f == sorted(f)
    assert f[0] == 0.0


def test_observed_fpr():
    assert P.observed_fpr(0, 1 << 20, 3) == 0.0
    assert P.observed_fpr(1 << 20, 1 << 20, 3) == 1.0
    assert 0 < P.observed_fpr(1000, 1 << 20, 3) < 1e-8


def test_redundancy_fpr_between_bounds():
    m, h, n = 1 << 16, 4, 2000
    r = P.redundancy_fpr(n, m, h)
    assert 0 < r < P.fpr_num_inserted(n, m, h)


def test_cms_dims():
    w, d = P.cms_dims(0.001, 0.01)
    assert w == math.ceil(math.e / 0.001)
    assert d == math.ceil(math.log(100))


def test_hll_rel_error():
    assert abs(P.hll_rel_error(4096) - 1.04 / 64) < 1e-12


def test_checkpoint_dir_rejects_remote_schemes():
    """checkpoint markers are driver-local POSIX I/O — an HDFS/S3 URI
    would write data remotely but markers on the driver's disk and
    resume would silently never trigger (ADVICE r4): fail fast."""
    import pytest

    from btl_bloomfilter_spark.plans.agg import require_local_checkpoint_dir

    require_local_checkpoint_dir("/tmp/ckpt")  # plain path ok
    # file:// is rejected too: Spark's writer would accept it, but the
    # driver-side open()/os.path marker I/O would resolve it as a
    # relative './file:...' path — data written, markers lost
    for bad in (
        "hdfs://nn/ckpt",
        "s3a://bucket/ckpt",
        "s3://b/x",
        "abfs://c@a/x",
        "file:///tmp/ckpt",
    ):
        with pytest.raises(ValueError, match="driver-visible"):
            require_local_checkpoint_dir(bad)

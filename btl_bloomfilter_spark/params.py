"""Bloom-filter sizing and FPR math.

Direct re-expression of the reference formulas:
- optimal size / hash count        BloomFilter.hpp:406-419
- CLI sizing variant               swig/writeBloom_rolling.cpp:101-103
- theoretical FPR for n inserts    BloomFilter.hpp:425-429, BloomFilterUtil.h:28-33
- observed (popcount) FPR          BloomFilter.hpp:346-350
- redundancy FPR                   BloomFilter.hpp:333-341, BloomFilterUtil.h:38-46
- CMS / HLL published bounds       BASELINE.md targets
"""

from __future__ import annotations

import math

__all__ = [
    "calc_optimal_hash_num",
    "calc_optimal_size",
    "cli_sizing",
    "fpr_num_inserted",
    "observed_fpr",
    "redundancy_fpr",
    "cms_dims",
    "hll_rel_error",
]


def calc_optimal_hash_num(fpr: float) -> int:
    """h = ceil(-log2(fpr)) (BloomFilter.hpp:417-419 uses
    -log(fpr)/log(2), rounded up via unsigned cast of +0.5... we mirror
    the common convention: round half up)."""
    return max(1, int(-math.log(fpr) / math.log(2) + 0.5))


def calc_optimal_size(n: int, fpr: float, hash_num: int | None = None) -> tuple[int, int]:
    """(m_bits, h): m = -n*h / ln(1 - fpr^(1/h)) rounded UP to a
    multiple of 64 (BloomFilter.hpp:406-415)."""
    h = hash_num if hash_num is not None else calc_optimal_hash_num(fpr)
    non64 = -float(n) * h / math.log(1.0 - fpr ** (1.0 / h))
    m = int((non64 + 63) // 64 * 64)
    return m, h


def cli_sizing(n: int, fpr: float) -> tuple[int, int]:
    """CLI variant (swig/writeBloom_rolling.cpp:101-103):
    m = ceil(-n ln p / ln^2 2); h = floor(m/n * ln 2)."""
    m = int(math.ceil(-float(n) * math.log(fpr) / (math.log(2) ** 2)))
    h = max(1, int((m / float(n)) * math.log(2)))
    return m, h


def fpr_num_inserted(n: int, m_bits: int, hash_num: int) -> float:
    """Theoretical FPR after n inserts: (1 - (1 - 1/m)^(n*h))^h
    (BloomFilter.hpp:425-429)."""
    if m_bits <= 0:
        return 1.0
    return (1.0 - (1.0 - 1.0 / m_bits) ** (float(n) * hash_num)) ** hash_num


def observed_fpr(popcount: int, m_bits: int, hash_num: int) -> float:
    """(pop/m)^h (BloomFilter.hpp:346-350)."""
    return (popcount / float(m_bits)) ** hash_num


def redundancy_fpr(n: int, m_bits: int, hash_num: int) -> float:
    """Average FPR over the insertion history, log-sum-exp style
    (BloomFilter.hpp:333-341 / BloomFilterUtil.h:38-46):
    mean over i=1..n of fpr_num_inserted(i)."""
    if n <= 0:
        return 0.0
    acc = 0.0
    # closed-loop like the reference (loop over inserted count)
    for i in range(1, n + 1):
        acc += fpr_num_inserted(i, m_bits, hash_num)
    return acc / n


def cms_dims(eps: float, delta: float) -> tuple[int, int]:
    """Count-min width/depth from the published guarantee:
    w = ceil(e/eps), d = ceil(ln(1/delta))."""
    w = int(math.ceil(math.e / eps))
    d = int(math.ceil(math.log(1.0 / delta)))
    return w, max(1, d)


def hll_rel_error(m_registers: int) -> float:
    """Published HLL standard error 1.04/sqrt(m)."""
    return 1.04 / math.sqrt(m_registers)


def blocked_fpr(n: int, m_bits: int, hash_num: int, block_bits: int) -> float:
    """Analytic FPR of a register-blocked Bloom filter (Putze, Sanders
    & Singler, JEA 2009 — "Cache-, Hash- and Space-Efficient Bloom
    Filters", eq. for blocked filters): each key confines all
    ``hash_num`` bits to ONE ``block_bits``-bit block, so the filter is
    a mixture of tiny standard filters whose loads are
    Binomial(n, B/m) ≈ Poisson(n·B/m):

        fpr = Σ_i  Poisson(λ = n·B/m)(i) · f_std(B, i, hash_num)
        f_std(B, i, h) = (1 − (1 − 1/B)^(i·h))^h

    Always ≥ the flat filter's FPR at equal m/n/h — the documented
    price of one-cache-line builds/probes; the penalty shrinks as B
    grows.  The Poisson tail is truncated once terms cannot change
    the sum at double precision.
    """
    if n <= 0:
        return 0.0
    lam = n * block_bits / m_bits
    one_minus = 1.0 - 1.0 / block_bits
    # log-space pmf over a ±40σ window (a plain recurrence underflows
    # for λ ≳ 700); unaccounted tail mass is charged f_std = 1, so the
    # result stays an UPPER bound — the safe direction for a gate
    lo = max(0, int(lam - 40.0 * math.sqrt(lam + 1.0) - 50.0))
    hi = int(lam + 40.0 * math.sqrt(lam + 1.0) + 50.0)
    llam = math.log(lam) if lam > 0 else float("-inf")
    total = 0.0
    mass = 0.0
    for i in range(lo, hi + 1):
        lp = -lam if i == 0 else (-lam + i * llam - math.lgamma(i + 1.0))
        p = math.exp(lp)
        mass += p
        total += p * (1.0 - one_minus ** (i * hash_num)) ** hash_num
    return min(total + (1.0 - mass), 1.0)

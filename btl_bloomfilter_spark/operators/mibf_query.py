"""miBF query-support statistics — pure-Python ports of
`MIBFQuerySupport.hpp` / `MIBloomFilter.hpp` scoring math.

All functions are driver-side pure math (no Spark, no scipy):
- frame probabilities            MIBloomFilter.hpp:65-77,664-707
- 7-key candidate sort           MIBFQuerySupport.hpp:230-246
- stat-tie equivalence tests     MIBFQuerySupport.hpp:285-364
- binomial saturation CDF        MIBFQuerySupport.hpp:544-553
- candidate summarization        MIBFQuerySupport.hpp:555-596
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


def n_choose_k(n: int, k: int) -> float:
    return math.comb(n, k)


def calc_prob_single_frame(occupancy: float, hash_num: int, freq: float, allowed_misses: int = 0) -> float:
    """Per-frame random-match probability for one ID
    (MIBloomFilter.hpp:65-77): sum over i = h-miss..h of
    C(h,i)·occ^i·(1-occ)^(h-i)·(1-(1-freq)^i)."""
    prob_total = 0.0
    for i in range(hash_num - allowed_misses, hash_num + 1):
        prob = n_choose_k(hash_num, i)
        prob *= occupancy**i
        prob *= (1.0 - occupancy) ** (hash_num - i)
        prob *= 1.0 - (1.0 - freq) ** i
        prob_total += prob
    return prob_total


def calc_frame_probs(mibf, allowed_miss: int = 0) -> tuple[dict[int, float], float]:
    """(per-ID frame probability, saturated proportion)
    (MIBloomFilter.hpp:664-679): freq = ID count / total IDs,
    occupancy = popcount/m."""
    # popcount via the filter's byte-cumulative LUT (unpackbits would
    # materialize an m_bits-byte temporary — 8x the filter's state)
    mibf._ensure_byte_cum()
    occupancy = float(mibf._byte_cum[-1]) / mibf.m_bits
    counts = mibf.get_id_counts()
    total = sum(counts.values())
    sat_prop = mibf.pop_saturated() / max(total, 1)
    probs = {
        i: calc_prob_single_frame(occupancy, mibf.hash_num, c / total, allowed_miss)
        for i, c in counts.items()
    }
    return probs, sat_prop


def calc_frame_probs_strand(mibf, allowed_miss: int = 0) -> tuple[dict[int, float], float]:
    """Strand-aware frame probabilities (MIBloomFilter.hpp:688-707):
    like :func:`calc_frame_probs` but ID frequencies come from
    getIDCountsStrand, so both strand variants of an ID pool into one
    frequency.  Faithful port notes: (a) the normalizing total sums the
    WHOLE count table including the id-0 (empty-slot) bucket — the
    reference's strand loop iterates from begin() where the plain
    version starts at i=1; (b) satProp divides by that same total."""
    mibf._ensure_byte_cum()
    occupancy = float(mibf._byte_cum[-1]) / mibf.m_bits
    counts, saturated = mibf.get_id_counts_strand()
    total = sum(counts.values())  # includes the id-0 bucket (see above)
    sat_prop = saturated / max(total, 1)
    probs = {
        i: calc_prob_single_frame(occupancy, mibf.hash_num, c / total, allowed_miss)
        for i, c in counts.items()
        if i != 0
    }
    return probs, sat_prop


@dataclass
class QueryResult:
    """CountResult/QueryResult fields (MIBFQuerySupport.hpp:61-82)."""

    id: int = 0
    count: int = 0
    nonSatCount: int = 0
    totalCount: int = 0
    totalNonSatCount: int = 0
    nonSatFrameCount: int = 0
    solidCount: int = 0
    frameProb: float = 0.0


def sort_key(r: QueryResult):
    """7-key lexicographic sort (MIBFQuerySupport.hpp:230-246):
    nonSatFrameCount > count > solidCount > nonSatCount >
    totalNonSatCount > totalCount desc, then frameProb desc (the
    reference orders a first when a.frameProb > b.frameProb)."""
    return (
        -r.nonSatFrameCount,
        -r.count,
        -r.solidCount,
        -r.nonSatCount,
        -r.totalNonSatCount,
        -r.totalCount,
        -r.frameProb,
    )


def is_roughly_equal_counts(a: int, b: int, extra_count: int) -> bool:
    """±extraCount equivalence (MIBFQuerySupport.hpp:285-293)."""
    if a > b:
        return a <= b + extra_count
    return b <= a + extra_count


def compare_std_err(a: int, b: int) -> bool:
    """±√count overlap (MIBFQuerySupport.hpp:298-308)."""
    sa, sb = math.sqrt(a), math.sqrt(b)
    if a > b:
        return (a - sa) <= (b + sb)
    return (b - sb) <= (a + sa)


def compare_std_err_larger(a: int, b: int, extra_count: float) -> bool:
    """a roughly-equal-or-larger than b with scaled stderr
    (MIBFQuerySupport.hpp:313-319)."""
    sa = math.sqrt(a) * extra_count
    sb = math.sqrt(b) * extra_count
    return (a - sa) <= (b + sb)


def is_valid(a: QueryResult, b: QueryResult) -> bool:
    """any-count stderr overlap with the best (MIBFQuerySupport.hpp:341-352)."""
    return (
        compare_std_err(b.count, a.count)
        or compare_std_err(b.totalNonSatCount, a.totalNonSatCount)
        or compare_std_err(b.nonSatFrameCount, a.nonSatFrameCount)
        or compare_std_err(b.solidCount, a.solidCount)
        or compare_std_err(b.nonSatCount, a.nonSatCount)
        or compare_std_err(b.totalCount, a.totalCount)
    )


def is_roughly_equal_or_larger(a: QueryResult, b: QueryResult, extra_count: float) -> bool:
    """(MIBFQuerySupport.hpp:357-364)"""
    return (
        compare_std_err_larger(a.count, b.count, extra_count)
        and compare_std_err_larger(a.totalNonSatCount, b.totalNonSatCount, extra_count)
        and compare_std_err_larger(a.nonSatFrameCount, b.nonSatFrameCount, extra_count)
        and compare_std_err_larger(a.solidCount, b.solidCount, extra_count)
        and compare_std_err_larger(a.nonSatCount, b.nonSatCount, extra_count)
        and compare_std_err_larger(a.totalCount, b.totalCount, extra_count)
    )


def check_count_agreement(b: QueryResult, a: QueryResult) -> bool:
    """best-hit agreement veto (MIBFQuerySupport.hpp:372-379)."""
    return (
        b.nonSatFrameCount >= a.nonSatFrameCount
        and b.count >= a.count
        and b.solidCount >= a.solidCount
        and b.nonSatCount >= a.nonSatCount
        and b.totalNonSatCount >= a.totalNonSatCount
        and b.totalCount >= a.totalCount
    )


def binom_cdf(k: int, n: int, p: float) -> float:
    """Binomial CDF P(X ≤ k) — log-space (lgamma) pmf, no scipy.
    math.comb → float overflows past n ≈ 1030, and evaluated window
    counts routinely exceed that for multi-KB documents."""
    if k < 0:
        return 0.0
    if k >= n:
        return 1.0
    if p <= 0.0:
        return 1.0
    if p >= 1.0:
        return 0.0
    lp, lq = math.log(p), math.log1p(-p)
    lgn = math.lgamma(n + 1)
    total = 0.0
    for i in range(0, k + 1):
        ll = lgn - math.lgamma(i + 1) - math.lgamma(n - i + 1) + i * lp + (n - i) * lq
        total += math.exp(ll)
    return min(total, 1.0)


def calc_sat(evaluated_values: int, single_event_prob: float, saturated_count: int) -> float:
    """P(saturation is explainable by chance)
    (MIBFQuerySupport.hpp:544-553): binomial CDF at satCount-1."""
    if not saturated_count:
        return 0.0
    return binom_cdf(saturated_count - 1, evaluated_values, single_event_prob)


def summarize_candidates(
    candidates: list[QueryResult],
    *,
    min_count: int = 0,
    extra_count: float = 1.0,
    best_hit_agree: bool = True,
) -> list[QueryResult]:
    """summarizeCandiates (MIBFQuerySupport.hpp:555-596): keep
    candidates statistically tied with the best under the 7-key order,
    optionally vetoing everything when the top two disagree."""
    if not candidates:
        return []
    best = max(candidates, key=lambda r: r.nonSatFrameCount)
    if best.nonSatFrameCount < min_count:
        return []
    signif = [r for r in candidates if is_valid(r, best)]
    if len(signif) <= 1:
        return signif
    signif.sort(key=sort_key)
    out = [r for r in signif if is_roughly_equal_or_larger(signif[0], r, extra_count)]
    if best_hit_agree and len(out) >= 2 and not check_count_agreement(out[0], out[1]):
        return []
    return out

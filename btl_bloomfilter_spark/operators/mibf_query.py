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


# six statistical counters in QueryResult, in sort_key's tie-test set
_STAT_COLS = (
    "count",
    "solidCount",
    "nonSatCount",
    "nonSatFrameCount",
    "totalCount",
    "totalNonSatCount",
)


def summarize_candidates_batch(
    tall,
    frame_probs: dict,
    results: list,
    *,
    min_count=0,
    extra_count: float = 1.0,
    best_hit_agree: bool = True,
) -> None:
    """Vectorized summarizeCandiates (MIBFQuerySupport.hpp:555-596)
    over a whole tally table at once — numpy segment reduces instead
    of a per-row pandas groupby + itertuples loop (VERDICT r4 #2: that
    loop was the last Python-loop-bound stage on the distributed full
    classify path).

    ``tall`` is a pandas DataFrame with columns (row, id) + the six
    counters; candidate order within a row (= the reference's
    candidate-list order) is its appearance order.  Fills
    ``results[row]`` with the surviving QueryResults in 7-key order —
    bit-for-bit the same lists ``summarize_candidates`` produces row
    by row (pinned by the batch-vs-loop parity test).
    """
    import numpy as np

    if tall is None or not len(tall):
        return
    t = tall.sort_values("row", kind="stable").reset_index(drop=True)
    row = t["row"].to_numpy(np.int64)
    ids = t["id"].to_numpy(np.int64)
    cnt = {c: t[c].to_numpy(np.int64) for c in _STAT_COLS}
    fprob = t["id"].map(frame_probs).fillna(0.0).to_numpy(np.float64)

    if isinstance(min_count, dict):
        # per-ID candidate gate (vector<unsigned> minCount,
        # MIBFQuerySupport.hpp:95) applies BEFORE best selection
        floor_arr = np.array([min_count.get(int(i), 0) for i in ids], dtype=np.int64)
        keep = cnt["count"] >= floor_arr
        if not keep.all():
            row, ids, fprob = row[keep], ids[keep], fprob[keep]
            cnt = {c: v[keep] for c, v in cnt.items()}
        floor = 0
    else:
        floor = int(min_count)
    n = row.size
    if n == 0:
        return

    def _starts(r):
        return np.concatenate([[0], np.flatnonzero(np.diff(r)) + 1]).astype(np.int64)

    starts = _starts(row)
    nseg = starts.size
    lens = np.diff(np.concatenate([starts, [n]]))
    seg = np.repeat(np.arange(nseg), lens)

    # best = FIRST candidate achieving the segment max nonSatFrameCount
    # (python max() keeps the first of ties — tied ids can differ in
    # the other five counters, so the choice matters for is_valid)
    nsfc = cnt["nonSatFrameCount"]
    segmax = np.maximum.reduceat(nsfc, starts)
    pos = np.arange(n)
    best_idx = np.minimum.reduceat(np.where(nsfc == segmax[seg], pos, n), starts)
    alive_seg = segmax >= floor

    # is_valid(r, best): ±√count interval overlap on ANY of the six
    signif = np.zeros(n, dtype=bool)
    for c in _STAT_COLS:
        x = cnt[c][best_idx][seg].astype(np.float64)
        y = cnt[c].astype(np.float64)
        hi = np.maximum(x, y)
        lo = np.minimum(x, y)
        signif |= (hi - np.sqrt(hi)) <= (lo + np.sqrt(lo))
    signif &= alive_seg[seg]
    if not signif.any():
        return
    row, ids, fprob = row[signif], ids[signif], fprob[signif]
    cnt = {c: v[signif] for c, v in cnt.items()}
    n = row.size

    # stable 7-key sort within rows (sort_key order; lexsort's LAST
    # key is most significant, stability preserves candidate order)
    order = np.lexsort(
        [
            -fprob,
            -cnt["totalCount"],
            -cnt["totalNonSatCount"],
            -cnt["nonSatCount"],
            -cnt["solidCount"],
            -cnt["count"],
            -cnt["nonSatFrameCount"],
            row,
        ]
    )
    row, ids, fprob = row[order], ids[order], fprob[order]
    cnt = {c: v[order] for c, v in cnt.items()}
    starts = _starts(row)
    nseg = starts.size
    lens = np.diff(np.concatenate([starts, [n]]))
    seg = np.repeat(np.arange(nseg), lens)

    # out-filter: is_roughly_equal_or_larger(head, r) on ALL six
    ec = float(extra_count)
    ok = np.ones(n, dtype=bool)
    for c in _STAT_COLS:
        a = cnt[c][starts][seg].astype(np.float64)  # segment head (signif[0])
        b = cnt[c].astype(np.float64)
        ok &= (a - np.sqrt(a) * ec) <= (b + np.sqrt(b) * ec)

    # best-hit agreement veto on the first two SURVIVORS of a segment
    if best_hit_agree:
        cs = np.cumsum(ok)
        seg_base = cs[starts] - ok[starts]
        rank = cs - seg_base[seg]  # 1-based among survivors where ok
        first_i = np.full(nseg, -1, dtype=np.int64)
        second_i = np.full(nseg, -1, dtype=np.int64)
        m1 = ok & (rank == 1)
        m2 = ok & (rank == 2)
        first_i[seg[m1]] = np.flatnonzero(m1)
        second_i[seg[m2]] = np.flatnonzero(m2)
        has2 = second_i >= 0
        if has2.any():
            agree = np.ones(nseg, dtype=bool)
            f = first_i[has2]
            s = second_i[has2]
            a2 = np.ones(f.size, dtype=bool)
            for c in _STAT_COLS:
                a2 &= cnt[c][f] >= cnt[c][s]
            agree[has2] = a2
            ok &= agree[seg]

    keep_idx = np.flatnonzero(ok)
    for i in keep_idx:
        results[int(row[i])].append(
            QueryResult(
                id=int(ids[i]),
                count=int(cnt["count"][i]),
                solidCount=int(cnt["solidCount"][i]),
                nonSatCount=int(cnt["nonSatCount"][i]),
                nonSatFrameCount=int(cnt["nonSatFrameCount"][i]),
                totalCount=int(cnt["totalCount"][i]),
                totalNonSatCount=int(cnt["totalNonSatCount"][i]),
                frameProb=float(fprob[i]),
            )
        )

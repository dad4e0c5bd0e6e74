"""miBF query-support math ports (pure functions, no Spark)."""

import math

import pytest

from btl_bloomfilter_spark.operators.mibf_query import (
    QueryResult,
    binom_cdf,
    calc_prob_single_frame,
    calc_sat,
    check_count_agreement,
    compare_std_err,
    is_roughly_equal_counts,
    is_valid,
    sort_key,
    summarize_candidates,
)


def test_prob_single_frame():
    """Pin the formula (MIBloomFilter.hpp:65-77)."""
    # no misses: C(h,h) occ^h (1-(1-f)^h)
    occ, h, f = 0.3, 3, 0.25
    expect = occ**3 * (1 - (1 - f) ** 3)
    assert calc_prob_single_frame(occ, h, f, 0) == pytest.approx(expect)
    # allowing misses adds lower-order terms monotonically
    assert calc_prob_single_frame(occ, h, f, 1) > calc_prob_single_frame(occ, h, f, 0)
    assert 0 <= calc_prob_single_frame(0.99, 5, 0.9, 5) <= 1


def test_sort_candidates_7key_order():
    a = QueryResult(id=1, nonSatFrameCount=5, count=10)
    b = QueryResult(id=2, nonSatFrameCount=5, count=12)
    c = QueryResult(id=3, nonSatFrameCount=6, count=1)
    d = QueryResult(id=4, nonSatFrameCount=5, count=10, solidCount=1)
    e = QueryResult(id=5, nonSatFrameCount=5, count=10, frameProb=0.5)
    f = QueryResult(id=6, nonSatFrameCount=5, count=10, frameProb=0.1)
    order = sorted([a, b, c, d, e, f], key=sort_key)
    assert order[0].id == 3  # nonSatFrameCount dominates
    assert order[1].id == 2  # then count
    assert order[2].id == 4  # then solidCount
    # frameProb DESCENDING is the final tiebreak (reference
    # sortCandidates: a before b when a.frameProb > b.frameProb)
    ids_tail = [r.id for r in order[3:]]
    assert ids_tail.index(5) < ids_tail.index(6)


def test_stat_ties():
    assert is_roughly_equal_counts(10, 12, 2)
    assert not is_roughly_equal_counts(10, 13, 2)
    assert compare_std_err(100, 110)  # 100+10 >= 110-10.48
    assert not compare_std_err(100, 150)
    a = QueryResult(count=100)
    b = QueryResult(count=105)
    assert is_valid(a, b)


def test_check_count_agreement():
    top = QueryResult(nonSatFrameCount=5, count=10, solidCount=2, nonSatCount=8, totalNonSatCount=9, totalCount=11)
    runner = QueryResult(nonSatFrameCount=4, count=9, solidCount=1, nonSatCount=7, totalNonSatCount=8, totalCount=10)
    assert check_count_agreement(top, runner)
    disagree = QueryResult(nonSatFrameCount=4, count=11)
    assert not check_count_agreement(top, disagree)


def test_binom_cdf_large_n_no_overflow():
    """Regression: math.comb → float overflowed past n ≈ 1030; window
    counts of multi-KB documents routinely exceed that."""
    v = calc_sat(2000, 0.1, 600)
    assert v == 1.0 or 0.0 <= v <= 1.0
    assert binom_cdf(1000, 2000, 0.5) == pytest.approx(0.5, abs=0.02)
    assert binom_cdf(5000, 50000, 0.1) == pytest.approx(0.5, abs=0.02)


def test_binom_cdf_and_calc_sat():
    # against a hand-computed binomial
    assert binom_cdf(1, 3, 0.5) == pytest.approx(0.5)  # P(X<=1) for Bin(3,.5)
    assert binom_cdf(3, 3, 0.5) == 1.0
    assert calc_sat(10, 0.1, 0) == 0.0
    assert calc_sat(10, 0.1, 1) == pytest.approx((0.9) ** 10)
    assert 0 < calc_sat(20, 0.3, 5) < 1


def test_summarize_candidates():
    best = QueryResult(id=1, nonSatFrameCount=50, count=50, totalCount=50, nonSatCount=50, totalNonSatCount=50)
    tied = QueryResult(id=2, nonSatFrameCount=48, count=48, totalCount=48, nonSatCount=48, totalNonSatCount=48)
    far = QueryResult(id=3, nonSatFrameCount=5, count=5, totalCount=5, nonSatCount=5, totalNonSatCount=5)
    out = summarize_candidates([far, tied, best], extra_count=1.0, best_hit_agree=True)
    ids = [r.id for r in out]
    assert ids[0] == 1 and 2 in ids and 3 not in ids
    # min_count gate
    assert summarize_candidates([far], min_count=10) == []
    # disagreement veto: runner-up higher on one axis, lower on another
    odd = QueryResult(id=4, nonSatFrameCount=49, count=55, totalCount=49, nonSatCount=49, totalNonSatCount=49)
    vetoed = summarize_candidates([best, odd], extra_count=2.0, best_hit_agree=True)
    assert vetoed == [] or len(vetoed) == 1


def test_frame_probs_integration(spark):
    """calcFrameProbs over a real built miBF."""
    import numpy as np
    from btl_bloomfilter_spark.operators.mibf import build_mibf
    from btl_bloomfilter_spark.operators.mibf_query import calc_frame_probs

    rng = np.random.default_rng(0)
    rows = []
    for ref in (1, 2, 3):
        vocab = [f"r{ref}w{i}" for i in range(80)]
        for _ in range(12):
            rows.append((" ".join(rng.choice(vocab, 25)), ref))
    df = spark.createDataFrame(rows, "text string, ref_id long")
    mibf = build_mibf(df, "text", "ref_id", m_bits=1 << 16, hash_num=3, k=8)
    probs, sat_prop = calc_frame_probs(mibf)
    assert set(probs) == {1, 2, 3}
    assert all(0 <= p < 0.2 for p in probs.values())
    assert 0 <= sat_prop <= 1


def test_summarize_batch_matches_loop():
    """summarize_candidates_batch (vectorized, VERDICT r4 #2) must
    reproduce summarize_candidates row by row bit-for-bit — small
    counter ranges force heavy ties so every branch (first-of-ties
    best, stderr overlap, 7-key sort stability, veto) is exercised."""
    import numpy as np
    import pandas as pd

    from btl_bloomfilter_spark.operators.mibf_query import (
        QueryResult,
        summarize_candidates,
        summarize_candidates_batch,
    )

    rng = np.random.default_rng(97)
    cols = ["count", "solidCount", "nonSatCount", "nonSatFrameCount", "totalCount", "totalNonSatCount"]
    for trial in range(30):
        n_rows = int(rng.integers(1, 12))
        recs = []
        for r in range(n_rows):
            ids = rng.choice(np.arange(1, 9), size=int(rng.integers(0, 6)), replace=False)
            for i in ids:
                recs.append(
                    [r, int(i)] + [int(v) for v in rng.integers(0, 5, size=6)]
                )
        if not recs:
            continue
        tall = pd.DataFrame(recs, columns=["row", "id"] + cols)
        # shuffle row order but keep per-row candidate order stable by
        # grouping, to mimic the chunked-acc interleaving classify_full
        # can produce
        perm = rng.permutation(len(tall))
        tall = tall.iloc[perm].reset_index(drop=True)
        frame_probs = {i: float(rng.random()) for i in range(1, 9)}
        min_count = (
            {i: int(rng.integers(0, 3)) for i in range(1, 9)}
            if trial % 3 == 0
            else int(rng.integers(0, 3))
        )
        extra_count = float(rng.choice([0.5, 1.0, 2.0]))
        bha = bool(trial % 2)

        # loop oracle: per-row candidate order = appearance order
        want = {}
        for r, sub in tall.groupby("row", sort=False):
            if isinstance(min_count, dict):
                keep = sub["count"].to_numpy() >= np.array(
                    [min_count.get(int(i), 0) for i in sub["id"]]
                )
                sub = sub[keep]
                floor = 0
            else:
                floor = min_count
            cands = [
                QueryResult(
                    id=int(t.id), count=int(t.count), solidCount=int(t.solidCount),
                    nonSatCount=int(t.nonSatCount), nonSatFrameCount=int(t.nonSatFrameCount),
                    totalCount=int(t.totalCount), totalNonSatCount=int(t.totalNonSatCount),
                    frameProb=float(frame_probs.get(int(t.id), 0.0)),
                )
                for t in sub.itertuples()
            ]
            want[int(r)] = summarize_candidates(
                cands, min_count=floor, extra_count=extra_count, best_hit_agree=bha
            )

        got = [[] for _ in range(n_rows)]
        summarize_candidates_batch(
            tall, frame_probs, got,
            min_count=min_count, extra_count=extra_count, best_hit_agree=bha,
        )
        for r in range(n_rows):
            assert got[r] == want.get(r, []), (trial, r, got[r], want.get(r))


def test_tally_numpy_matches_pandas_chain():
    """_tally_numpy must be byte-identical (values AND row order) to
    the two-stage pandas groupby(sort=False) chain it replaced —
    order feeds summarize's first-of-ties best selection."""
    import numpy as np
    import pandas as pd

    from btl_bloomfilter_spark.operators.mibf import _tally_numpy

    def pandas_tally(sub):
        per_frame = sub.groupby(["row", "frame", "id"], sort=False).agg(
            slots=("id", "size"),
            nonsat_slots=("slot_nonsat", "sum"),
            frame_sat=("frame_sat", "first"),
            miss0=("miss0", "first"),
        ).reset_index()
        return (
            per_frame.assign(
                has_nonsat=(per_frame["nonsat_slots"] > 0).astype(int),
                nonsat_frame=(~per_frame["frame_sat"]).astype(int),
                solid_frame=((~per_frame["frame_sat"]) & per_frame["miss0"]).astype(int),
            )
            .groupby(["row", "id"], sort=False)
            .agg(
                count=("frame", "size"),
                solidCount=("solid_frame", "sum"),
                nonSatCount=("has_nonsat", "sum"),
                nonSatFrameCount=("nonsat_frame", "sum"),
                totalCount=("slots", "sum"),
                totalNonSatCount=("nonsat_slots", "sum"),
            )
            .reset_index()
        )

    rng = np.random.default_rng(73)
    for trial in range(25):
        n_frames = int(rng.integers(1, 60))
        h = int(rng.integers(1, 5))
        rows_of_frame = np.sort(rng.integers(0, 8, size=n_frames))
        recs = []
        for f in range(n_frames):
            fs = bool(rng.random() < 0.3)
            m0 = bool(rng.random() < 0.7)
            for _ in range(h):
                recs.append(
                    (int(rows_of_frame[f]), f, int(rng.integers(1, 6)),
                     bool(rng.random() < 0.8), fs, m0)
                )
        sub = pd.DataFrame(
            recs, columns=["row", "frame", "id", "slot_nonsat", "frame_sat", "miss0"]
        )
        # random chunk-style row subset too (the chunked path filters df)
        for s in (sub, sub[rng.random(len(sub)) < 0.6]):
            if not len(s):
                continue
            got = _tally_numpy(s)
            want = pandas_tally(s)
            assert list(got.columns) == list(want.columns)
            for c in got.columns:
                assert got[c].tolist() == want[c].tolist(), (trial, c)
    # empty input
    empty = pd.DataFrame(
        {c: [] for c in ["row", "frame", "id", "slot_nonsat", "frame_sat", "miss0"]}
    )
    assert len(_tally_numpy(empty)) == 0


def test_summarize_batch_hypothesis_parity():
    """Property form of the batch-vs-loop parity: hypothesis explores
    adversarial tally shapes (all-ties, singletons, zero counters,
    large extra_count) and shrinks failures to minimal cases."""
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from btl_bloomfilter_spark.operators.mibf_query import (
        QueryResult,
        summarize_candidates,
        summarize_candidates_batch,
    )

    cols = ["count", "solidCount", "nonSatCount", "nonSatFrameCount", "totalCount", "totalNonSatCount"]

    cand = st.tuples(
        st.integers(1, 4),                      # id
        *[st.integers(0, 3) for _ in cols],     # six counters (tiny → ties)
    )
    rows_strategy = st.lists(st.lists(cand, min_size=0, max_size=5), min_size=1, max_size=6)

    @settings(max_examples=120, deadline=None)
    @given(
        rows=rows_strategy,
        min_count=st.one_of(st.integers(0, 3), st.just("dict")),
        extra_count=st.sampled_from([0.5, 1.0, 3.0]),
        bha=st.booleans(),
        probs=st.lists(st.floats(0, 1, allow_nan=False), min_size=4, max_size=4),
    )
    def check(rows, min_count, extra_count, bha, probs):
        recs = []
        for r, cands in enumerate(rows):
            seen = set()
            for tup in cands:
                if tup[0] in seen:  # one candidate per (row, id)
                    continue
                seen.add(tup[0])
                recs.append([r, tup[0]] + list(tup[1:]))
        if not recs:
            return
        tall = pd.DataFrame(recs, columns=["row", "id"] + cols)
        frame_probs = {i + 1: probs[i] for i in range(4)}
        mc = {i + 1: i % 3 for i in range(4)} if min_count == "dict" else min_count
        want = {}
        for r, sub in tall.groupby("row", sort=False):
            if isinstance(mc, dict):
                keep = sub["count"].to_numpy() >= np.array(
                    [mc.get(int(i), 0) for i in sub["id"]]
                )
                sub = sub[keep]
                floor = 0
            else:
                floor = mc
            cands = [
                QueryResult(
                    id=int(t.id), count=int(t.count), solidCount=int(t.solidCount),
                    nonSatCount=int(t.nonSatCount), nonSatFrameCount=int(t.nonSatFrameCount),
                    totalCount=int(t.totalCount), totalNonSatCount=int(t.totalNonSatCount),
                    frameProb=float(frame_probs.get(int(t.id), 0.0)),
                )
                for t in sub.itertuples()
            ]
            want[int(r)] = summarize_candidates(
                cands, min_count=floor, extra_count=extra_count, best_hit_agree=bha
            )
        got = [[] for _ in range(len(rows))]
        summarize_candidates_batch(
            tall, frame_probs, got, min_count=mc, extra_count=extra_count, best_hit_agree=bha
        )
        for r in range(len(rows)):
            assert got[r] == want.get(r, []), (r, got[r], want.get(r))

    check()

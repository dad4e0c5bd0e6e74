"""Dedup + similarity operators on corpora with planted duplicates."""

import numpy as np
import pytest

from pyspark.sql import functions as F


def _corpus(rng, n=120):
    vocab = [f"tok{i:03d}" for i in range(300)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(30, 60))) for _ in range(n)]
    # planted: 5 exact dups, 5 near-dups (90% token overlap)
    pairs = []
    for i in range(5):
        docs.append(docs[i])  # exact copy of doc i
        pairs.append((i, n + i))
    near_pairs = []
    for i in range(5, 10):
        toks = docs[i].split()
        cut = max(1, len(toks) // 10)
        mutated = toks[:-cut] + list(rng.choice(vocab, size=cut))
        docs.append(" ".join(mutated))
        near_pairs.append((i, n + 5 + (i - 5)))
    return docs, pairs, near_pairs


@pytest.fixture(scope="module")
def corpus_df(spark):
    rng = np.random.default_rng(42)
    docs, exact_pairs, near_pairs = _corpus(rng)
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "doc_id long, text string").cache()
    return df, exact_pairs, near_pairs


def test_exact_dedup(spark, corpus_df):
    from btl_bloomfilter_spark.operators.dedup import exact_dedup, exact_dedup_keep

    df, exact_pairs, _ = corpus_df
    n = df.count()
    groups = exact_dedup(df, "text", "doc_id").toPandas()
    assert groups.n_copies.sum() == n
    assert (groups.n_copies > 1).sum() == len(exact_pairs)
    kept = exact_dedup_keep(df, "text", "doc_id")
    assert kept.count() == n - len(exact_pairs)
    # keeper is the min doc_id of each dup pair
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    for a, b in exact_pairs:
        assert a in kept_ids and b not in kept_ids


def test_ngram_jaccard_finds_near_dups(spark, corpus_df):
    from btl_bloomfilter_spark.operators.dedup import ngram_jaccard_pairs

    df, exact_pairs, near_pairs = corpus_df
    out = ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5).toPandas()
    found = {(int(r.id_a), int(r.id_b)) for _, r in out.iterrows()}
    for p in exact_pairs:
        assert p in found
        assert out[(out.id_a == p[0]) & (out.id_b == p[1])].jaccard.iloc[0] == 1.0
    for p in near_pairs:
        assert p in found, (p, found)


def test_minhash_dedup_finds_planted(spark, corpus_df):
    from btl_bloomfilter_spark.operators.dedup import minhash_dedup

    df, exact_pairs, near_pairs = corpus_df
    out = minhash_dedup(df, "text", "doc_id", num_perm=128, bands=32, threshold=0.5).toPandas()
    found = {(int(r.id_a), int(r.id_b)) for _, r in out.iterrows()}
    for p in exact_pairs:
        assert p in found
        assert out[(out.id_a == p[0]) & (out.id_b == p[1])].est_jaccard.iloc[0] == 1.0
    hit_near = sum(p in found for p in near_pairs)
    assert hit_near >= 4  # minhash is probabilistic; ≥4/5 at j≈0.85
    # no wild false positives: random docs share few shingles
    fp = [p for p in found if p not in set(exact_pairs) | set(near_pairs)]
    assert len(fp) <= 2


def test_simhash_near_dups(spark, corpus_df):
    from btl_bloomfilter_spark.operators.dedup import simhash, simhash_candidates

    df, exact_pairs, near_pairs = corpus_df
    sh = simhash(df, "text", "doc_id").cache()
    out = simhash_candidates(sh, max_hamming=3).toPandas()
    found = {(int(r.id_a), int(r.id_b)) for _, r in out.iterrows()}
    for p in exact_pairs:
        assert p in found
        assert out[(out.id_a == p[0]) & (out.id_b == p[1])].hamming.iloc[0] == 0
    # identical texts → identical simhash
    vals = {r.id: r.simhash for r in sh.collect()}
    for a, b in exact_pairs:
        assert vals[a] == vals[b]


def test_ngram_jaccard_hot_shingle_cap(spark):
    """A stopword trigram planted in EVERY doc makes the uncapped
    self-join quadratic; the doc-frequency cap removes it from the
    universe and the result equals brute-force Jaccard over the
    capped shingle set."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i:03d}" for i in range(400)]
    docs = []
    for i in range(60):
        body = list(rng.choice(vocab, size=12))
        docs.append("the quick fox " + " ".join(body))  # hot prefix trigrams
    # one planted near-dup pair sharing most non-hot shingles
    docs.append(docs[0].replace(docs[0].split()[-1], "zzz"))
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "doc_id long, text string")

    from btl_bloomfilter_spark.operators.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.3, max_doc_freq=30).toPandas()

    # brute-force oracle over the capped universe
    def grams(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = [grams(d) for d in docs]
    from collections import Counter

    freq = Counter(g for s in sets for g in s)
    sets = [{g for g in s if freq[g] <= 30} for s in sets]
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            if inter:
                j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
                if j >= 0.3:
                    want[(a, b)] = j
    got = {(int(r.id_a), int(r.id_b)): r.jaccard for _, r in out.iterrows()}
    assert got == want
    assert (0, 60) in got  # the planted pair survives the cap


@pytest.mark.parametrize("radius", [3, 7])
def test_simhash_blocking_complete_at_radius(spark, corpus_df, radius):
    """Every pair within the requested hamming radius must be found —
    brute-force cross-check (the pigeonhole guarantee of (d+1)-band
    blocking, for a radius where 4 bands would silently lose pairs)."""
    from btl_bloomfilter_spark.operators.dedup import simhash, simhash_candidates

    df, _, _ = corpus_df
    sh = simhash(df, "text", "doc_id").cache()
    vals = {int(r.id): int(r.simhash) for r in sh.collect()}
    ids = sorted(vals)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")
            if d <= radius:
                want.add((a, b))
    out = simhash_candidates(sh, max_hamming=radius).toPandas()
    found = {(int(r.id_a), int(r.id_b)) for _, r in out.iterrows()}
    assert found == want
    assert (out.hamming <= radius).all()


def test_simhash_candidates_rejects_lossy_blocking():
    from btl_bloomfilter_spark.operators.dedup import simhash_candidates

    with pytest.raises(ValueError):
        simhash_candidates(None, max_hamming=8, bands=8)  # bands must exceed radius


def test_simhash_radius_zero_exact_pairs(spark, corpus_df):
    """Regression: max_hamming=0 → one 64-bit band; the band mask must
    not overflow BIGINT (2^64-1 literal). Radius 0 returns exactly the
    identical-fingerprint pairs."""
    from btl_bloomfilter_spark.operators.dedup import simhash, simhash_candidates

    df, exact_pairs, _ = corpus_df
    sh = simhash(df, "text", "doc_id").cache()
    out = simhash_candidates(sh, max_hamming=0).toPandas()
    found = {(int(r.id_a), int(r.id_b)) for _, r in out.iterrows()}
    vals = {int(r.id): int(r.simhash) for r in sh.collect()}
    want = {
        (a, b)
        for i, a in enumerate(sorted(vals))
        for b in sorted(vals)[i + 1 :]
        if vals[a] == vals[b]
    }
    assert found == want
    assert set(exact_pairs) <= found
    assert (out.hamming == 0).all()


def test_cosine_near_dup_empty_and_null_safe(spark):
    """Regression: the LSH bucket UDF must not run an eager job or
    crash on empty/null input."""
    from btl_bloomfilter_spark.operators.similarity import cosine_near_dup_lsh

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert cosine_near_dup_lsh(empty, 0.9).count() == 0
    withnull = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0, 0.01])], "vec_id long, embedding array<double>"
    )
    out = cosine_near_dup_lsh(withnull, 0.9, n_planes=8, bands=4).toPandas()
    assert {(int(r.id_a), int(r.id_b)) for _, r in out.iterrows()} == {(1, 3)}


def test_minhash_estimates_jaccard(spark, corpus_df):
    """MinHash signature agreement ≈ true Jaccard (unbiased)."""
    from btl_bloomfilter_spark.operators.dedup import (
        minhash_signatures,
        minhash_jaccard_estimate,
        ngram_jaccard_pairs,
    )

    df, _, near_pairs = corpus_df
    sigs = minhash_signatures(df, "text", "doc_id", num_perm=256)
    pairs = spark.createDataFrame(near_pairs, "id_a long, id_b long")
    est = {(r.id_a, r.id_b): r.est_jaccard for r in minhash_jaccard_estimate(sigs, pairs).collect()}
    true = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.0).collect()
        if (r.id_a, r.id_b) in est
    }
    for p in near_pairs:
        assert abs(est[p] - true[p]) < 0.15, (p, est[p], true[p])


# ----------------------------- similarity ----------------------------


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((80, 32)).astype(np.float64)
    # make ids 60..79 near-copies of 0..19
    base[60:] = base[:20] + 0.01 * rng.standard_normal((20, 32))
    rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache(), base


def test_brute_topk_exact(spark, emb_df):
    from btl_bloomfilter_spark.operators.similarity import brute_topk

    df, base = emb_df
    q = [float(x) for x in base[0]]
    out = brute_topk(df.where(F.col("vec_id") != 0), q, 5).toPandas()
    # numpy oracle
    mat = base[1:]
    ids = np.arange(1, 80)
    cos = (mat @ base[0]) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(base[0]))
    want = ids[np.argsort(-cos)][:5]
    assert out.vec_id.tolist() == want.tolist()
    assert int(out.vec_id.iloc[0]) == 60  # the planted near-copy of 0


def test_lsh_topk_recall(spark, emb_df):
    from btl_bloomfilter_spark.operators.similarity import brute_topk, lsh_topk

    df, base = emb_df
    q = [float(x) for x in base[5]]
    brute = brute_topk(df.where(F.col("vec_id") != 5), q, 5).toPandas()
    approx = lsh_topk(df.where(F.col("vec_id") != 5), q, 5, n_planes=4, probe_hamming=2).toPandas()
    # near-copy must be found; recall@5 ≥ 3/5
    assert 65 in approx.vec_id.tolist()
    assert len(set(brute.vec_id) & set(approx.vec_id)) >= 3


def test_ivf_topk(spark, emb_df):
    from btl_bloomfilter_spark.operators.similarity import brute_topk, fit_centroids, ivf_topk

    df, base = emb_df
    cents = fit_centroids(df, n_cells=8, sample=80, seed=1)
    assert cents.shape == (8, 32)
    q = [float(x) for x in base[3]]
    out = ivf_topk(df.where(F.col("vec_id") != 3), q, 5, cents, nprobe=4).toPandas()
    assert 63 in out.vec_id.tolist()  # planted near-copy found
    brute = brute_topk(df.where(F.col("vec_id") != 3), q, 5).toPandas()
    assert len(set(brute.vec_id) & set(out.vec_id)) >= 3


def test_cosine_near_dup_pairs(spark, emb_df):
    """Embedding-cosine near-dup: the LSH-banded scale path has
    precision 1.0 by construction (exact-cosine post-filter) and must
    recall the planted near-copies; the brute path is the oracle."""
    from btl_bloomfilter_spark.operators.similarity import (
        cosine_near_dup_lsh,
        cosine_pairs_brute,
    )

    df, base = emb_df
    brute = cosine_pairs_brute(df, 0.95).toPandas()
    want = {(int(r.id_a), int(r.id_b)) for _, r in brute.iterrows()}
    # the 20 planted near-copies dominate the >=0.95 set
    assert {(i, 60 + i) for i in range(20)} <= want
    got_df = cosine_near_dup_lsh(df, 0.95, n_planes=16, bands=8).toPandas()
    got = {(int(r.id_a), int(r.id_b)) for _, r in got_df.iterrows()}
    assert got <= want  # precision 1.0 (exact post-filter)
    assert len(got & want) / len(want) >= 0.9  # recall on near-dups


def test_lsh_persisted_index_prunes_partitions(spark, emb_df, tmp_path):
    """lsh_index_write + lsh_topk_indexed: identical results to the
    on-the-fly bucket path, and the bucket predicate lands in the
    scan's PartitionFilters (files of non-probed buckets never read)."""
    from btl_bloomfilter_spark.operators.similarity import (
        lsh_index_write,
        lsh_topk,
        lsh_topk_indexed,
    )

    df, base = emb_df
    path = str(tmp_path / "lsh_index")
    lsh_index_write(df, path, n_planes=4, seed=42)
    q = [float(x) for x in base[5]]
    live = lsh_topk(df, q, 5, n_planes=4, probe_hamming=1).toPandas()
    idx = lsh_topk_indexed(spark, path, q, 5, n_planes=4, probe_hamming=1)
    got = idx.toPandas()
    assert got.vec_id.tolist() == live.vec_id.tolist()
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "__bucket" in plan.split("PartitionFilters")[1][:200]


def test_fit_centroids_stable_under_reordering(spark, emb_df):
    """Centroid fit samples by content hash, not a partition prefix —
    the same data in any row/partition order yields identical centroids."""
    from btl_bloomfilter_spark.operators.similarity import fit_centroids

    df, _ = emb_df
    c1 = fit_centroids(df, n_cells=4, sample=40, seed=9)
    shuffled = df.orderBy(F.desc("vec_id")).repartition(7)
    c2 = fit_centroids(shuffled, n_cells=4, sample=40, seed=9)
    np.testing.assert_allclose(c1, c2)


def test_multimodal_plumbing(spark):
    from btl_bloomfilter_spark.operators.multimodal import (
        extract_features,
        frame_sample,
        media_stats,
        synthetic_media_df,
        decode_real,
        FEATURE_DIM,
    )

    media = synthetic_media_df(spark, 30).cache()
    assert media.count() == 30
    feats = extract_features(media).select("media_id", "features").toPandas()
    assert all(len(f) == FEATURE_DIM for f in feats.features)
    # deterministic across runs
    feats2 = extract_features(media).select("media_id", "features").toPandas()
    a = feats.sort_values("media_id").features.tolist()
    b = feats2.sort_values("media_id").features.tolist()
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    frames = frame_sample(media, every_ms=60_000).toPandas()
    assert (frames.ts_ms % 60_000 == 0).all()
    stats = media_stats(media).toPandas()
    assert set(stats.kind) == {"image", "audio", "video"}
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00", "image")


def test_simhash_blocked_complete_radius_11(spark):
    """e=2 ball enumeration (radius 11 at 4 blocks) must still be
    complete — brute-force cross-check on synthetic fingerprints
    planted at controlled distances."""
    from btl_bloomfilter_spark.operators.dedup import simhash_candidates_blocked

    rng = np.random.default_rng(7)
    base = [int(x) for x in rng.integers(0, 2**63, size=30, dtype=np.int64)]
    fps = list(base)
    for i, b in enumerate(base[:10]):
        flips = rng.choice(64, size=(i % 12) + 1, replace=False)  # distances 1..12
        m = 0
        for f in flips:
            m |= 1 << int(f)
        fps.append(b ^ m)
    sh = spark.createDataFrame(
        [(i, np.int64(np.uint64(f)).item() if f < 2**63 else f - 2**64) for i, f in enumerate(fps)],
        "id long, simhash long",
    )
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            if bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1") <= 11:
                want.add((i, j))
    out = simhash_candidates_blocked(sh, max_hamming=11).toPandas()
    found = {(int(r.id_a), int(r.id_b)) for _, r in out.iterrows()}
    assert found == want
    assert (out.hamming <= 11).all()


def test_simhash_blocked_rejects_unselective_radius():
    from btl_bloomfilter_spark.operators.dedup import simhash_candidates_blocked

    with pytest.raises(ValueError):
        simhash_candidates_blocked(None, max_hamming=12)  # e=3 refused


def test_simhash_bucket_stats_surfaces_planted_skew(spark):
    """A planted hot fingerprint (many identical simhashes) must show
    up as a dominant anchor bucket in the audit stats."""
    from btl_bloomfilter_spark.operators.dedup import simhash_bucket_stats

    rng = np.random.default_rng(3)
    uniq = [int(x) for x in rng.integers(0, 2**62, size=200, dtype=np.int64)]
    hot = [123456789] * 300  # 300 copies of one fingerprint
    sh = spark.createDataFrame(
        [(i, v) for i, v in enumerate(uniq + hot)], "id long, simhash long"
    )
    stats = simhash_bucket_stats(sh).toPandas().sort_values("block")
    assert len(stats) == 4
    assert (stats.max_bucket >= 300).all()  # the hot value dominates every block
    # and the non-hot mass stays spread out
    assert (stats.avg_bucket < 10).all()


def test_with_lsh_buckets_matches_pandas_udf(spark):
    """The Arrow buffer-reshape bucket kernel must agree bit-for-bit
    with the pandas_udf variant (persisted indexes are probed by
    either), and null embeddings land in bucket 0."""
    from btl_bloomfilter_spark.operators.similarity import (
        lsh_bucket_udf_auto,
        with_lsh_buckets,
        with_ivf_cells,
        ivf_assign_udf,
        fit_centroids,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(300)]
    rows.append((300, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = (
        with_lsh_buckets(df, n_planes=12, seed=9, out_col="b")
        .select("vec_id", "b")
        .toPandas()
        .set_index("vec_id")["b"]
    )
    b = (
        df.select("vec_id", lsh_bucket_udf_auto(12, 9)(F.col("embedding")).alias("b"))
        .toPandas()
        .set_index("vec_id")["b"]
    )
    assert (a.sort_index() == b.sort_index()).all()
    assert a[300] == 0
    cents = fit_centroids(df.where(F.col("embedding").isNotNull()), n_cells=4, sample=128)
    ca = (
        with_ivf_cells(df.where(F.col("embedding").isNotNull()), cents, out_col="c")
        .select("vec_id", "c")
        .toPandas()
        .set_index("vec_id")["c"]
    )
    cb = (
        df.where(F.col("embedding").isNotNull())
        .select("vec_id", ivf_assign_udf(cents)(F.col("embedding")).alias("c"))
        .toPandas()
        .set_index("vec_id")["c"]
    )
    assert (ca.sort_index() == cb.sort_index()).all()


def test_simhash_large_radius_falls_back_with_warning(spark, corpus_df):
    """Radius >= 12 (blocked path refuses e > 2) must fall back to
    pigeonhole bands — complete, warned — instead of raising (ADVICE
    r3: the raise was a behavior regression vs the pre-blocking
    default)."""
    import warnings

    from btl_bloomfilter_spark.operators.dedup import simhash, simhash_candidates

    df, exact_pairs, _ = corpus_df
    sh = simhash(df, "text", "doc_id").cache()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = simhash_candidates(sh, max_hamming=12)
        pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert any("falling back" in str(x.message) for x in rec)
    # completeness vs brute force at the same radius
    pdf = sh.toPandas()
    fp = pdf.set_index("id")["simhash"].to_dict()
    ids = sorted(fp)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1") <= 12
    }
    assert pairs == want
    with pytest.raises(ValueError):
        simhash_candidates(sh, max_hamming=64)


def test_winnow_guarantee_and_determinism():
    """Winnowing selection law (SIGMOD'03): every window of w
    consecutive k-gram positions contains >= 1 selection (gap <= w),
    and identical content selects identical (pos, fp) — the anchor
    property duplicate_spans relies on."""
    from btl_bloomfilter_spark.functions import hashing as H
    from btl_bloomfilter_spark.operators.dedup import _winnow_from_buffers

    rng = np.random.default_rng(3)
    text = "".join(rng.choice(list("abcdefghij "), size=800))
    k, w = 12, 8
    seeds = H.seed_table(0)
    buf, offs = H._flatten_utf8([text, text, text[:5]])
    rows, pos, fp = _winnow_from_buffers(buf, offs, k, w, seeds)
    p0 = pos[rows == 0]
    assert p0.size > 0 and (np.diff(p0) <= w).all() and (np.diff(p0) > 0).all()
    # identical rows select identically
    np.testing.assert_array_equal(p0, pos[rows == 1])
    np.testing.assert_array_equal(fp[rows == 0], fp[rows == 1])
    # row shorter than k yields nothing
    assert (rows == 2).sum() == 0
    # short-but->=k row selects exactly one fingerprint
    buf2, offs2 = H._flatten_utf8(["abcdefghijklm"])  # 13 chars, 2 windows
    r2, p2, f2 = _winnow_from_buffers(buf2, offs2, k, w, seeds)
    assert r2.size == 1


@pytest.mark.spark
def test_duplicate_spans_planted_oracle(spark):
    """Recall vs a brute-force oracle on planted spans: every planted
    span above the detection floor is found at the right offsets with
    the right length (within the documented 2(w+k) edge slack); a
    planted span below min_len is NOT reported; unrelated random docs
    produce no pairs."""
    from btl_bloomfilter_spark.operators.dedup import duplicate_spans

    rng = np.random.default_rng(7)
    letters = list("abcdefghijklmnopqrstuvwxyz ")
    k, w, min_len = 12, 8, 60
    slack = 2 * (w + k)

    def rand_doc(n):
        return "".join(rng.choice(letters, size=n))

    docs = {i: rand_doc(500) for i in range(30)}
    planted = []  # (id_a, id_b, start_a, start_b, length)
    for j, (src, dst, plen) in enumerate([(0, 20, 300), (1, 21, 200), (2, 22, 120)]):
        o_src, o_dst = 50 + 10 * j, 90 + 17 * j
        span = docs[src][o_src : o_src + plen]
        docs[dst] = docs[dst][:o_dst] + span + docs[dst][o_dst + plen :]
        planted.append((src, dst, o_src, o_dst, plen))
    # a sub-threshold span: anchors exist (>= w+k-1) but span < min_len
    short_span = docs[3][100:140]  # 40 bytes
    docs[23] = docs[23][:60] + short_span + docs[23][100:]
    # brute-force oracle sanity: the planted spans really are the
    # longest common substrings of their pairs
    import difflib

    for src, dst, o_src, o_dst, plen in planted:
        m = difflib.SequenceMatcher(None, docs[src], docs[dst], autojunk=False).find_longest_match(
            0, len(docs[src]), 0, len(docs[dst])
        )
        assert m.size >= plen and abs(m.a - o_src) <= m.size - plen + 1

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = duplicate_spans(df, "text", "doc_id", k=k, w=w, min_len=min_len).toPandas()
    found = {(r.id_a, r.id_b): r for r in got.itertuples()}
    for src, dst, o_src, o_dst, plen in planted:
        key = (min(src, dst), max(src, dst))
        assert key in found, f"planted span {key} missed"
        r = found[key]
        assert r.span_len >= plen - slack, (r.span_len, plen)
        assert r.span_len <= plen + slack
        assert abs(r.start_a - o_src) <= slack and abs(r.start_b - o_dst) <= slack
    # nothing below the detection threshold, nothing spurious
    assert (3, 23) not in found
    assert set(found) == {(min(s, d), max(s, d)) for s, d, *_ in planted}
    assert (got["span_len"] >= min_len).all()


@pytest.mark.spark
def test_duplicate_spans_fingerprints_passthrough(spark):
    """Passing a precomputed (persisted) winnow_fingerprints DF must
    yield exactly the direct result — the documented cache pattern for
    large runs."""
    from btl_bloomfilter_spark.operators.dedup import duplicate_spans, winnow_fingerprints

    rng = np.random.default_rng(41)
    letters = list("abcdefghijklmnop ")
    docs = {i: "".join(rng.choice(letters, size=300)) for i in range(12)}
    span = docs[0][40:200]
    docs[7] = docs[7][:50] + span + docs[7][210:]
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    direct = duplicate_spans(df, "text", "doc_id", k=12, w=8, min_len=60).toPandas()
    fps = winnow_fingerprints(df, "text", "doc_id", k=12, w=8).persist()
    try:
        via = duplicate_spans(
            df, "text", "doc_id", k=12, w=8, min_len=60, fingerprints=fps
        ).toPandas()
    finally:
        fps.unpersist()
    key = ["id_a", "id_b", "start_a", "start_b", "span_len", "n_anchors"]
    assert sorted(map(tuple, direct[key].values.tolist())) == sorted(
        map(tuple, via[key].values.tolist())
    )
    assert ((direct.id_a == 0) & (direct.id_b == 7)).any()


@pytest.mark.spark
def test_drop_hot_fingerprints_matches_inline_cap(spark):
    """drop_hot_fingerprints (pre-aggregated anti-join — the
    degenerate-corpus escape hatch) must yield the same spans as
    duplicate_spans' in-line cap, and actually remove the hot groups."""
    from btl_bloomfilter_spark.operators.dedup import (
        drop_hot_fingerprints,
        duplicate_spans,
        winnow_fingerprints,
    )

    rng = np.random.default_rng(59)
    base = "".join(rng.choice(list("abcdefgh "), size=400))
    shared = "".join(rng.choice(list("ABCDEFGH"), size=120))
    boiler = "ZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZ"  # hot in every doc
    rows = []
    for i in range(30):
        filler = "".join(rng.choice(list("abcdefgh "), size=300))
        text = boiler + filler + (shared if i < 2 else "") + boiler
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, w, cap = 12, 8, 10
    fps = winnow_fingerprints(df, "text", "doc_id", k=k, w=w).persist()
    try:
        filtered = drop_hot_fingerprints(fps, cap)
        # hot fingerprints really gone
        maxn = (
            filtered.groupBy("fp").count().agg(F.max("count")).collect()[0][0]
        )
        assert maxn is not None and maxn <= cap
        a = duplicate_spans(
            df, "text", "doc_id", k=k, w=w, min_len=60, max_anchor_freq=cap
        ).toPandas()
        b = duplicate_spans(
            df, "text", "doc_id", k=k, w=w, min_len=60,
            max_anchor_freq=cap, fingerprints=filtered,
        ).toPandas()
        key = ["id_a", "id_b", "start_a", "start_b", "span_len", "n_anchors"]
        assert sorted(map(tuple, a[key].values.tolist())) == sorted(
            map(tuple, b[key].values.tolist())
        )
        # the planted cross-doc span between docs 0 and 1 survives
        assert ((a.id_a == 0) & (a.id_b == 1)).any()
    finally:
        fps.unpersist()


@pytest.mark.spark
def test_semantic_dedup_laws_and_planted(spark):
    """semantic_dedup (SemDeDup-style): planted jittered copies drop,
    and the greedy laws hold — no two KEPT rows in a cluster are
    >= threshold, and every dropped row's dup_of is a kept row with
    cosine >= threshold (verified brute-force driver-side)."""
    from btl_bloomfilter_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(67)
    dim, n_base = 16, 120
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(n_base)]
    # plant near-identical copies of the first 15 vectors (tiny jitter)
    for i in range(15):
        v = base[i] + rng.normal(0, 0.005, size=dim)
        rows.append((1000 + i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, n_cells=6, threshold=0.95, seed=7
    ).toPandas().sort_values("vec_id").reset_index(drop=True)
    assert len(out) == len(rows)
    vecs = {i: np.asarray(v) / np.linalg.norm(v) for i, v in rows}
    kept = out[out.keep]
    dropped = out[~out.keep]
    # planted copies: copy and original share a cell with cosine ~0.9999
    # >> threshold, so at most one of each (orig, copy) pair survives —
    # unless k-means split them across cells; count that split case
    same_cell = 0
    cell_of = dict(zip(out.vec_id, out.cell))
    for i in range(15):
        if cell_of[i] == cell_of[1000 + i]:
            same_cell += 1
            assert not (bool(out[out.vec_id == i].keep.iloc[0])
                        and bool(out[out.vec_id == 1000 + i].keep.iloc[0])), i
    assert same_cell >= 10  # near-identical vectors co-cluster almost always
    # law (a): no kept pair within one cell >= threshold
    for cell, grp in kept.groupby("cell"):
        ids = grp.vec_id.tolist()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                assert float(vecs[ids[x]] @ vecs[ids[y]]) < 0.95, (ids[x], ids[y])
    # law (b): every dropped row points at a kept >= threshold neighbor
    kept_ids = set(kept.vec_id)
    for r in dropped.itertuples():
        assert r.dup_of in kept_ids
        assert float(vecs[r.vec_id] @ vecs[r.dup_of]) >= 0.95


# ---------------------------------------------------------------------------
# Mash distance
# ---------------------------------------------------------------------------


def test_mash_distance_recovers_planted_mutation_rate(spark):
    import math

    from pyspark.sql import functions as F

    from btl_bloomfilter_spark.operators.dedup import mash_distance, minhash_signatures

    rng = __import__("random").Random(156)
    vocab = [f"w{i}" for i in range(5000)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(300))) for i in range(60)
    ]
    rows = []
    for rate_code, p in ((0, 0.0), (1, 0.05), (2, 0.15)):
        for i, text in docs:
            toks = text.split(" ")
            mut = [
                (t + "~") if rng.random() < p else t for t in toks
            ]
            rows.append((i, text))
            rows.append((100000 * (rate_code + 1) + i, " ".join(mut)))
    df = spark.createDataFrame(set(rows), "id long, text string").toDF("id", "text")
    sigs = minhash_signatures(df, "text", "id", num_perm=256, shingle_n=3)
    pairs = spark.createDataFrame(
        [(i, 100000 * (rc + 1) + i) for rc in (0, 1, 2) for i in range(60)],
        "id_a long, id_b long",
    )
    out = mash_distance(sigs, pairs, shingle_n=3).withColumn(
        "rate_code", (F.col("id_b") / 100000).cast("int") - 1
    )
    means = {
        r.rate_code: r.m
        for r in out.groupBy("rate_code").agg(F.avg("mash_d").alias("m")).collect()
    }
    assert means[0] == 0.0  # identical docs: every slot equal -> j=1 -> d=0
    for rc, p in ((1, 0.05), (2, 0.15)):
        expected = -math.log(1.0 - p)
        assert abs(means[rc] - expected) < 0.012, (rc, means[rc], expected)
    # monotone in the planted rate
    assert means[0] < means[1] < means[2]
    # j=0 edge: disjoint docs cap at d=1
    dis = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff"), (2, "zz yy xx ww vv uu")], "id long, text string"
    )
    s2 = minhash_signatures(dis, "text", "id", num_perm=64, shingle_n=3)
    p2 = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert mash_distance(s2, p2, shingle_n=3).collect()[0].mash_d == 1.0

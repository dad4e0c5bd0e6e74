"""Weighted MinHash: hand-computed capped weighted Jaccard, exact
signature parity vs a brute python expansion of the same md5 format,
estimator unbiasedness across seeds, cap semantics, hot-bucket filter,
and DuckDB-twin frame parity."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.wminhash import (
    token_counts,
    weighted_minhash_pairs,
    weighted_minhash_pairs_sql,
    weighted_signatures,
)

DOCS = [
    (1, "alpha alpha beta"),
    (2, "alpha beta beta"),
    (3, "alpha alpha alpha alpha alpha alpha beta"),  # cap clamps the alphas
    (4, "gamma delta epsilon"),
    (5, "alpha alpha beta"),  # exact dup of 1
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _brute_sig(docs, num_perm, cap, seed):
    """Reference expansion minhash with the exact on-wire hash format."""
    out = {}
    for did, text in docs:
        counts = {}
        for tok in text.split():
            counts[tok] = min(counts.get(tok, 0) + 1, cap)
        for perm in range(num_perm):
            best = None
            for tok, c in counts.items():
                for rep in range(1, c + 1):
                    key = f"{seed}|{tok}|{rep}|{perm}".encode()
                    h = int(hashlib.md5(key).hexdigest()[:15], 16)
                    best = h if best is None or h < best else best
            out[(did, perm)] = best
    return out


def _brute_jw(a_text, b_text, cap):
    ca, cb = {}, {}
    for tok in a_text.split():
        ca[tok] = min(ca.get(tok, 0) + 1, cap)
    for tok in b_text.split():
        cb[tok] = min(cb.get(tok, 0) + 1, cap)
    inter = sum(min(ca.get(t, 0), cb.get(t, 0)) for t in set(ca) | set(cb))
    union = sum(max(ca.get(t, 0), cb.get(t, 0)) for t in set(ca) | set(cb))
    return inter, union


def test_token_counts_cap_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "  x x x  y \x0B "), (2, None), (3, "")], "doc_id long, text string"
    )
    got = {
        (r.id, r.token): r.c
        for r in token_counts(df, "text", "doc_id", cap=2).collect()
    }
    assert got == {(1, "x"): 2, (1, "y"): 1}


def test_signature_matches_brute_expansion(spark):
    sigs = weighted_signatures(
        _df(spark), "text", "doc_id", num_perm=6, cap=3, seed=7
    ).collect()
    brute = _brute_sig(DOCS, num_perm=6, cap=3, seed=7)
    assert len(sigs) == len(brute)
    for r in sigs:
        assert brute[(r.id, r.perm)] == r.sig


def test_pairs_exact_jaccard_and_dup(spark):
    out = weighted_minhash_pairs(
        _df(spark), "text", "doc_id", num_perm=16, cap=3, min_matches=1, seed=1
    ).toPandas()
    rows = {(r.id_a, r.id_b): r for r in out.itertuples()}
    # exact dup pair (1,5): all 16 perms match, exact_jw == 1
    r15 = rows[(1, 5)]
    assert r15.match_cnt == 16 and r15.est_jw == 1.0 and r15.exact_jw == 1.0
    # (1,2): counts a2b1 vs a1b2 -> inter 2, union 4
    if (1, 2) in rows:
        r12 = rows[(1, 2)]
        assert (r12.inter_c, r12.union_c) == (2, 4) and r12.exact_jw == 0.5
    # every reported exact matches brute force
    texts = dict(DOCS)
    for (a, b), r in rows.items():
        inter, union = _brute_jw(texts[a], texts[b], cap=3)
        assert (r.inter_c, r.union_c) == (inter, union)
    # doc 4 shares no token with anything
    assert not any(4 in k for k in rows)


def test_estimator_unbiased_across_seeds(spark):
    df = _df(spark)
    texts = dict(DOCS)
    inter, union = _brute_jw(texts[1], texts[2], cap=3)
    true_jw = inter / union
    ests = []
    for seed in range(20):
        out = weighted_minhash_pairs(
            df, "text", "doc_id", num_perm=8, cap=3, min_matches=1, seed=seed
        ).toPandas()
        m = out[(out.id_a == 1) & (out.id_b == 2)]
        ests.append(float(m.est_jw.iloc[0]) if len(m) else 0.0)
    # mean of 20x8 = 160 Bernoulli(J_w) draws: within 4 sigma
    se = np.sqrt(true_jw * (1 - true_jw) / 160)
    assert abs(np.mean(ests) - true_jw) <= 4 * se


def test_hot_bucket_limit_drops_degenerate_buckets(spark):
    # every doc shares 'alpha'; a limit of 1 kills buckets shared by
    # 2+ docs, so the exact-dup pair (1,5) can no longer reach
    # min_matches
    out = weighted_minhash_pairs(
        _df(spark), "text", "doc_id", num_perm=8, cap=3, min_matches=1,
        seed=3, hot_bucket_limit=1,
    ).toPandas()
    assert not len(out[(out.id_a == 1) & (out.id_b == 5)])


def test_duckdb_twin_frame_parity(spark, tmp_path):
    import duckdb

    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text"])
    p = str(tmp_path / "docs.parquet")
    pdf.to_parquet(p)
    kw = dict(num_perm=16, cap=3, min_matches=2, seed=11, hot_bucket_limit=4)
    got = (
        weighted_minhash_pairs(
            spark.createDataFrame(pdf), "text", "doc_id", **kw
        )
        .toPandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW d AS SELECT * FROM '{p}'")
    want = con.sql(
        f"SELECT * FROM {weighted_minhash_pairs_sql('d', 'text', 'doc_id', **kw)} q"
    ).df()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_param_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        token_counts(df, "text", "doc_id", cap=0)
    with pytest.raises(ValueError):
        weighted_signatures(df, "text", "doc_id", num_perm=0)
    with pytest.raises(ValueError):
        weighted_minhash_pairs(df, "text", "doc_id", num_perm=8, min_matches=9)

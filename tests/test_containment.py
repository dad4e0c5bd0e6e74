"""containment_join: brute-force parity (exactness of the one-sided
prefix filter), asymmetry, planted-fragment recovery, edge cases."""

import itertools

import pytest

from btl_bloomfilter_spark.operators.setjoin import containment_join, ordered_token_sets


def _brute(docs, t):
    """All ordered pairs with |Ta ∩ Tb| >= ceil(t*|Ta|) (exact math on
    rationals: inter * 10**9 >= round-up comparison done via integers)."""
    import math

    out = set()
    for (ia, ta), (ib, tb) in itertools.permutations(docs.items(), 2):
        if not ta:
            continue
        inter = len(ta & tb)
        if inter >= math.ceil(t * len(ta) - 1e-9):
            out.add((ia, ib, inter, len(ta)))
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "quick brown fox",                       # ⊆ 1 fully
    3: "brown fox jumps high above",            # partial overlap with 1
    4: "completely unrelated words here",
    5: "the quick brown fox jumps over the lazy dog extra tail words",  # 1 ⊆ 5
    6: "",                                      # empty → never a sub side
    7: None,
}


def _tok(s):
    return set(s.split()) if s else set()


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in CORPUS.items()], "id int, text string"
    )


@pytest.mark.parametrize("t", [1.0, 0.8, 0.5, 0.3])
def test_matches_brute_force(spark, docs_df, t):
    got = {
        (r["id_sub"], r["id_sup"], r["inter_n"], r["sub_sz"])
        for r in containment_join(docs_df, "text", "id", threshold=t).collect()
    }
    want = _brute({i: _tok(s) for i, s in CORPUS.items()}, t)
    assert got == want, (t, got ^ want)


def test_asymmetry(spark, docs_df):
    rows = {
        (r["id_sub"], r["id_sup"]): r
        for r in containment_join(docs_df, "text", "id", threshold=1.0).collect()
    }
    assert (2, 1) in rows          # fragment inside source
    assert (1, 2) not in rows      # source not inside fragment
    assert (1, 5) in rows and (5, 1) not in rows


def test_token_sets_passthrough(spark, docs_df):
    sets = ordered_token_sets(docs_df, "text", "id").persist()
    try:
        a = {
            (r["id_sub"], r["id_sup"])
            for r in containment_join(
                docs_df, "text", "id", threshold=0.5, token_sets=sets
            ).collect()
        }
        b = {
            (r["id_sub"], r["id_sup"])
            for r in containment_join(docs_df, "text", "id", threshold=0.5).collect()
        }
        assert a == b
    finally:
        sets.unpersist()


def test_threshold_validation(spark, docs_df):
    with pytest.raises(ValueError):
        containment_join(docs_df, "text", "id", threshold=0.0)
    with pytest.raises(ValueError):
        containment_join(docs_df, "text", "id", threshold=1.5)


def test_planted_fragments_bulk(spark):
    # 60 base docs of distinct vocab + a 40%-prefix fragment for every
    # third doc: every fragment must be found inside ONLY its source
    # at threshold 1.0 (vocabularies are disjoint across docs).
    rows = []
    for i in range(60):
        words = [f"w{i}_{j}" for j in range(20)]
        rows.append((i, " ".join(words)))
        if i % 3 == 0:
            rows.append((1000 + i, " ".join(words[:8])))
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        (r["id_sub"], r["id_sup"])
        for r in containment_join(df, "text", "id", threshold=1.0).collect()
    }
    assert got == {(1000 + i, i) for i in range(0, 60, 3)}

"""ROUGE-N paired-text metrics (operators/evaltext): hand-computed
clipping, brute Counter oracle, degenerate-pair exclusion, DuckDB
twin parity incl. the vertical-tab whitespace edge."""

import random
from collections import Counter

import pytest

from btl_bloomfilter_spark.operators.evaltext import rouge_n, rouge_n_sql


def _brute(cand: str, ref: str, n: int):
    def grams(t):
        toks = [x for x in t.replace("\x0b", " ").split() if x]
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    cg, rg = grams(cand), grams(ref)
    tc, tr = sum(cg.values()), sum(rg.values())
    if tc == 0 or tr == 0:
        return None
    o = sum(min(c, rg[g]) for g, c in cg.items())
    return tc, tr, o, o / tc, o / tr, 2 * o / (tc + tr)


def test_hand_computed_clipping(spark):
    df = spark.createDataFrame(
        [(1, "the cat the cat sat", "the cat sat on the mat")],
        "id long, cand string, ref string",
    )
    r = rouge_n(df, ["id"], "cand", "ref", n=1).collect()[0]
    # cand {the:2,cat:2,sat:1}, ref {the:2,cat:1,sat:1,on:1,mat:1}
    assert (r.cand_grams, r.ref_grams, r.overlap) == (5, 6, 4)
    assert r.precision == 4 / 5 and r.recall == 4 / 6 and r.f1 == 8 / 11


def test_bigrams_identity_and_exclusions(spark):
    rows = [
        (1, "a b c d", "a b c d"),        # identical -> all 1.0
        (2, "a", "a b"),                  # cand has no bigram -> excluded
        (3, "   ", "a b"),                # empty cand -> excluded
        (4, "x y z", "p q r"),            # disjoint -> all 0.0
        (5, None, "a b"),                 # NULL cand -> excluded
    ]
    df = spark.createDataFrame(rows, "id long, cand string, ref string")
    got = {r.id: r for r in rouge_n(df, ["id"], "cand", "ref", n=2).collect()}
    assert set(got) == {1, 4}
    assert got[1].precision == got[1].recall == got[1].f1 == 1.0
    assert got[4].overlap == 0 and got[4].f1 == 0.0


@pytest.mark.parametrize("n", [1, 2, 3])
def test_matches_brute_counter_oracle(spark, n):
    rng = random.Random(150 + n)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    for i in range(60):
        cand = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 15)))
        ref = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 15)))
        rows.append((i, cand, ref))
    df = spark.createDataFrame(rows, "id long, cand string, ref string")
    got = {r.id: r for r in rouge_n(df, ["id"], "cand", "ref", n=n).collect()}
    for i, cand, ref in rows:
        want = _brute(cand, ref, n)
        if want is None:
            assert i not in got
            continue
        tc, tr, o, p, rc, f1 = want
        r = got[i]
        assert (r.cand_grams, r.ref_grams, r.overlap) == (tc, tr, o)
        assert (r.precision, r.recall, r.f1) == (p, rc, f1)


def test_duckdb_twin_parity_with_ws_edge(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(7)
    vocab = ["tok%d" % i for i in range(8)]
    rows = []
    for i in range(40):
        c = " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 10)))
        r = " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 10)))
        rows.append((i, c, r))
    rows.append((98, "a\x0bb c", "a b\x0bc"))   # vertical tab must split in BOTH engines
    rows.append((99, "a\tb\nc", "a b c"))
    pdf = pd.DataFrame(rows, columns=["id", "cand", "ref"])
    p = str(tmp_path / "rp.parquet")
    pdf.to_parquet(p)
    got = (
        rouge_n(spark.read.parquet(p), ["id"], "cand", "ref", n=2)
        .orderBy("id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(rouge_n_sql("t", "id", "cand", "ref", n=2) + " ORDER BY id").df()
    assert got.values.tolist() == want.values.tolist()
    assert 98 in got["id"].values and got.loc[got.id == 99, "f1"].iloc[0] == 1.0


def test_contract_errors(spark):
    df = spark.createDataFrame([(1, "a", "a")], "id long, cand string, ref string")
    with pytest.raises(ValueError):
        rouge_n(df, ["id"], "cand", "ref", n=0)
    with pytest.raises(ValueError):
        rouge_n(df, [], "cand", "ref")
    with pytest.raises(ValueError):
        rouge_n_sql("t", "id", "cand", "ref", n=0)


# ---------------------------------------------------------------------------
# token-level edit distance / WER
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.evaltext import token_edit_stats


def _brute_lev(a, b):
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[n][m]


def test_token_edit_matches_brute(spark):
    rng = random.Random(158)
    vocab = ["a", "b", "c", "dd", "ee"]
    rows = []
    for i in range(80):
        c = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 14)))
        r = " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 14)))
        rows.append((i, c, r))
    df = spark.createDataFrame(rows, "id long, cand string, ref string")
    got = {r.id: r for r in token_edit_stats(df, ["id"], "cand", "ref").collect()}
    for i, c, r in rows:
        a, b = c.split(), r.split()
        row = got[i]
        assert (row.cand_len, row.ref_len) == (len(a), len(b))
        assert row.edit_distance == _brute_lev(a, b), (i, a, b)
        assert row.wer == row.edit_distance / len(b)


def test_token_edit_semantics(spark):
    rows = [
        (1, "x y z", "x y z"),          # identical -> 0
        (2, "", "x y"),                  # empty cand -> dist = ref_len, wer = 1
        (3, "x y", ""),                  # empty ref -> EXCLUDED (wer undefined)
        (4, None, "x"),                  # NULL cand = empty
        (5, "a\tb\x0bc", "a b c"),       # shared whitespace class
        (6, "y x", "x y"),               # order matters (ROUGE-1 would say 1.0)
    ]
    df = spark.createDataFrame(rows, "id long, cand string, ref string")
    got = {r.id: r for r in token_edit_stats(df, ["id"], "cand", "ref").collect()}
    assert got[1].edit_distance == 0 and got[1].wer == 0.0
    assert got[2].edit_distance == 2 and got[2].wer == 1.0
    assert 3 not in got
    assert got[4].edit_distance == 1
    assert got[5].edit_distance == 0
    assert got[6].edit_distance == 2 and got[6].wer == 1.0
    with pytest.raises(ValueError):
        token_edit_stats(df, [], "cand", "ref")


def test_token_edit_planted_substitutions_exact(spark):
    # substitution-only mutations: distance == mutation count EXACTLY
    rng = random.Random(9)
    rows = []
    for i in range(40):
        toks = [f"w{rng.randrange(50)}" for _ in range(60)]
        k = rng.randrange(0, 12)
        pos = rng.sample(range(60), k)
        mut = list(toks)
        for p in pos:
            mut[p] = mut[p] + "~"
        rows.append((i, " ".join(mut), " ".join(toks), k))
    df = spark.createDataFrame(
        [(i, c, r) for i, c, r, _ in rows], "id long, cand string, ref string"
    )
    got = {r.id: r.edit_distance for r in token_edit_stats(df, ["id"], "cand", "ref").collect()}
    for i, _, _, k in rows:
        assert got[i] == k

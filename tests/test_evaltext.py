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

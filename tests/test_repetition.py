"""Gopher repetition-family stats: cross-engine parity + hand-computed
planted values (overlap-counted char fractions, clamped to 1)."""
import pandas as pd
import pytest

from btl_bloomfilter_spark.functions import textstats as T


@pytest.mark.spark
def test_repetition_stats_cross_engine(spark, tmp_path):
    import duckdb

    rep5 = "one two three four five"
    rows = [
        (1, "a b a b a b"),                          # heavy 2-gram repetition
        (2, "all distinct words here now"),          # no repetition
        (3, None),
        (4, ""),
        (5, f"{rep5} six {rep5} seven"),             # repeated 5-gram phrase
        (6, "x\ny\nx\nz\nx"),                        # duplicate lines
        (7, "w " * 400),                             # degenerate: clamp to 1
    ]
    pdf = pd.DataFrame(rows, columns=["id", "text"])
    path = str(tmp_path / "rep.parquet")
    pdf.to_parquet(path)

    got = (
        spark.read.parquet(path)
        .select("id", *T.repetition_stats("text"))
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    sql = T.repetition_stats_sql("text")
    want = con.sql(
        "SELECT id, " + ", ".join(f"{e} AS {k}" for k, e in sql.items()) + " FROM t ORDER BY id"
    ).df().reset_index(drop=True)
    for c in sql:
        assert got[c].tolist() == pytest.approx(want[c].tolist()), c

    out = {int(r.id): r for r in got.itertuples()}
    # id=1: grams2 = [a b, b a, a b, b a, a b]; top 'a b' count 3 × len 3 = 9
    # cleaned length 11 → 9/11
    assert out[1].top_2gram_char_frac == pytest.approx(round(9 / 11, 6))
    assert not bool(out[1].passes_repetition)
    # id=2: no repeated grams, but the doc is SHORT, so the single
    # longest 2-gram ('distinct words', count 1 × len 14) occupies
    # 14/27 > 0.2 of the text — the top-gram rule correctly fails
    # short texts (Gopher applies repetition rules to long docs)
    assert out[2].top_2gram_char_frac == pytest.approx(round(14 / 27, 6))
    assert not bool(out[2].passes_repetition)
    assert out[2].dup_5gram_char_frac == 0.0
    assert out[2].dup_line_char_frac == 0.0
    # id=3/4: empty → all zeros, passes
    for i in (3, 4):
        assert out[i].top_2gram_char_frac == 0.0
        assert out[i].dup_5gram_char_frac == 0.0
        assert bool(out[i].passes_repetition)
    # id=5: the 5-gram "one two three four five" occurs twice (23 chars,
    # 2 × 23 = 46 occupied), cleaned length = 57 → 46/57
    assert out[5].dup_5gram_char_frac == pytest.approx(round(46 / 57, 6))
    # id=6: lines x,y,x,z,x → dup chars = 5 - 3(distinct) = 2? chars on
    # repeat lines = total line chars 5 - distinct line chars 3 = 2;
    # total cleaned chars 9 → 2/9
    assert out[6].dup_line_char_frac == pytest.approx(round(2 / 9, 6))
    # id=7: 400 × 'w ' → occupied 'w w' chars 3×399 >> total → clamped
    assert out[7].top_2gram_char_frac == 1.0
    assert not bool(out[7].passes_repetition)


@pytest.mark.spark
def test_repetition_fold_matches_bruteforce(spark):
    """Randomized adversarial check of the sorted-run fold: 60 texts
    with tie-heavy tiny vocabularies vs a brute-force Python oracle
    (count every n-gram with dict, same overlap/clamp/round spec)."""
    import random

    rng = random.Random(73)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    texts = []
    for _ in range(60):
        n = rng.randint(0, 25)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    texts += ["", "a", "a a a a a a"]

    def brute(text):
        words = text.split()
        total = max(len(text.strip()), 1)

        def grams(n):
            return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]

        def top(n):
            cnt = {}
            for g in grams(n):
                cnt[g] = cnt.get(g, 0) + 1
            occ = max([c * len(g) for g, c in cnt.items()], default=0)
            return round(min(occ / total, 1.0), 6)

        def dup(n):
            cnt = {}
            for g in grams(n):
                cnt[g] = cnt.get(g, 0) + 1
            d = sum(c * len(g) for g, c in cnt.items() if c > 1)
            return round(min(d / total, 1.0), 6)

        return top(2), top(3), dup(5)

    pdf = pd.DataFrame({"id": range(len(texts)), "text": texts})
    got = (
        spark.createDataFrame(pdf)
        .select("id", *T.repetition_stats("text"))
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    for i, text in enumerate(texts):
        t2, t3, d5 = brute(text)
        assert got.top_2gram_char_frac[i] == pytest.approx(t2), (i, text)
        assert got.top_3gram_char_frac[i] == pytest.approx(t3), (i, text)
        assert got.dup_5gram_char_frac[i] == pytest.approx(d5), (i, text)

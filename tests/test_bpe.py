"""BPE trainer/encoder: hand-computed Sennrich golden merges, parity
with an independent naive reimplementation, roundtrip + no-mergeable-
pair laws, distributed==driver encode, partition-invariant training."""
import random

import pytest

from btl_bloomfilter_spark.operators.bpe import (
    EOW,
    _encode_word,
    learn_bpe,
    train_bpe,
    with_bpe_tokens,
    bpe_token_count,
    word_counts,
)


def naive_learn_bpe(words, num_merges):
    """Independent reference: recount every pair from scratch each
    round (no incremental index) — same tie-break."""
    vocab = [(list(w) + [EOW], int(n)) for w, n in words if w]
    merges = []
    for _ in range(num_merges):
        counts = {}
        for s, n in vocab:
            for p in zip(s, s[1:]):
                counts[p] = counts.get(p, 0) + n
        live = {p: c for p, c in counts.items() if c >= 2}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        merges.append(best)
        a, b = best
        for j, (s, n) in enumerate(vocab):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[j] = (out, n)
    return merges


def test_sennrich_golden():
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    got = learn_bpe(words, 6)
    assert got == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
    ]


def test_matches_naive_reference():
    rng = random.Random(5)
    alphabet = "abcdef"
    words = [
        ("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))), rng.randint(1, 20))
        for _ in range(120)
    ]
    assert learn_bpe(words, 40) == naive_learn_bpe(words, 40)


def test_encode_roundtrip_and_saturation():
    rng = random.Random(9)
    words = [
        ("".join(rng.choice("abcde") for _ in range(rng.randint(1, 10))), rng.randint(1, 9))
        for _ in range(60)
    ] + [("héllo", 4), ("héllo", 2)]
    merges = learn_bpe(words, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in words:
        toks = _encode_word(w, ranks)
        # roundtrip: concatenation reproduces word + marker
        assert "".join(toks) == w + EOW
        # saturation: no adjacent pair is still mergeable
        assert all((a, b) not in ranks for a, b in zip(toks, toks[1:]))


def test_learning_order_independent():
    rng = random.Random(3)
    words = [
        ("".join(rng.choice("xyz") for _ in range(rng.randint(1, 6))), rng.randint(1, 5))
        for _ in range(50)
    ]
    m1 = learn_bpe(words, 20)
    m2 = learn_bpe(list(reversed(words)), 20)
    assert m1 == m2


@pytest.mark.spark
def test_train_and_encode_distributed(spark):
    rows = [
        ("the lowest lower low", ),
        ("newest news is the newest", ),
        ("wide widest wider", ),
    ] * 20
    df = spark.createDataFrame(rows, "text string")
    m1 = train_bpe(df, "text", 25)
    m8 = train_bpe(df.repartition(8), "text", 25)
    assert m1 == m8 and len(m1) > 0  # partition-invariant training
    # min_count prunes the word table before the collect; a threshold
    # above every word's count empties it
    assert train_bpe(df, "text", 25, min_count=10_000) == []
    out = with_bpe_tokens(df.limit(3), "text", m1).collect()
    ranks = {p: i for i, p in enumerate(m1)}
    for r in out:
        want = []
        for w in r.text.split():
            want.extend(_encode_word(w, ranks))
        assert r.bpe_tokens == want  # distributed == driver encode
    cnt = bpe_token_count(df.limit(3), "text", m1).collect()
    assert all(c.bpe_token_count == len(o.bpe_tokens) for c, o in zip(cnt, out))


@pytest.mark.spark
def test_unicode_whitespace_train_encode_agree(spark):
    # U+00A0 is whitespace to Python str.split() but NOT to the
    # trainer's Java \s+ — the encode kernel must side with the
    # trainer or tokenize words the vocabulary never saw
    from pyspark.sql import functions as F
    from btl_bloomfilter_spark.operators.bpe import EOW

    df = spark.createDataFrame([("caf bar baz",)] * 8, "text string")
    assert {r.word for r in word_counts(df, "text").collect()} == {"caf bar", "baz"}
    merges = train_bpe(df, "text", 10)
    out = with_bpe_tokens(df.limit(1), "text", merges).collect()[0]
    joined = "".join(out.bpe_tokens)
    # one EOW per trainer-word: the \xa0 word stays whole
    assert joined == "caf bar" + EOW + "baz" + EOW


@pytest.mark.spark
def test_word_counts_guard(spark):
    df = spark.createDataFrame([(f"bad{EOW}word",)], "text string")
    with pytest.raises(Exception, match="EOW"):
        word_counts(df, "text").collect()

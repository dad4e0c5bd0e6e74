"""Blocklist screening (C4 §2.2 badwords-stage shape) and character
entropy: Python-truth, planted edge cases, and exact cross-engine
(Spark vs DuckDB twin) parity — the same three-way standard as the
other textstats families."""

import math
import random
from collections import Counter

import pandas as pd
import pytest

from btl_bloomfilter_spark.functions import textstats as T

TERMS = ["badword", "gambling"]
PHRASES = ("dark pattern",)

PLANTED = [
    "hello world",
    "",
    None,
    "aaaa",
    "ab\x0Bc",                      # vertical tab (the \s trap class)
    "abç ççé",                      # non-ASCII chars are boundaries
    "x BADWORD y",                  # case-folded term hit
    "badwordish",                   # sub-token NEAR-MISS: must not hit
    "mybadword",                    # prefix near-miss: must not hit
    "a dark pattern appears",       # phrase hit
    "Dark  Pattern!",               # phrase hit across space run + case
    "dark patterns",                # phrase near-miss (trailing s)
    "gambling-free zone",           # hyphen is a word boundary: hit
    "badword badword gambling",     # distinct-terms semantics: 2 not 3
    "ends with badword",
    "badword starts",
    "dark\npattern",                # newline separator still one phrase
]


def _truth(t):
    toks = [w for w in __import__("re").split(r"[^a-z0-9]+", (t or "").lower()) if w]
    terms = sorted(set(toks) & set(TERMS))
    norm = " " + " ".join(toks) + " "
    nph = sum(f" {p} " in norm for p in PHRASES)
    return ",".join(terms), len(terms), nph, bool(terms) or nph > 0


@pytest.mark.spark
def test_blocklist_planted_and_cross_engine(spark):
    import duckdb

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PLANTED)], "id long, text string"
    )
    got = (
        df.select("id", *T.blocklist_screen("text", TERMS, phrases=PHRASES))
        .orderBy("id")
        .toPandas()
    )
    for _, r in got.iterrows():
        csv, nt, np_, b = _truth(PLANTED[int(r.id)])
        assert r.blocked_terms_csv == csv, PLANTED[int(r.id)]
        assert r.n_blocked_terms == nt and r.n_blocked_phrases == np_
        assert bool(r.blocked) == b
    # the defining boundary cases, asserted explicitly
    by = {PLANTED[int(r.id)]: r for _, r in got.iterrows() if PLANTED[int(r.id)]}
    assert not by["badwordish"].blocked and not by["mybadword"].blocked
    assert not by["dark patterns"].blocked
    assert by["gambling-free zone"].blocked
    assert by["badword badword gambling"].n_blocked_terms == 2
    assert by["Dark  Pattern!"].n_blocked_phrases == 1

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(len(PLANTED)), "text": PLANTED}))
    S = T.blocklist_screen_sql("text", TERMS, phrases=PHRASES)
    sel = ", ".join(f"{v} AS {k}" for k, v in S.items())
    want = con.sql(f"SELECT id, {sel} FROM t ORDER BY id").df()
    for c in ("blocked_terms_csv", "n_blocked_terms", "n_blocked_phrases", "blocked"):
        assert [str(x) for x in got[c]] == [str(x) for x in want[c]], c


def test_blocklist_rejects_unnormalized_terms():
    with pytest.raises(ValueError):
        T.blocklist_screen("text", ["BadWord"])
    with pytest.raises(ValueError):
        T.blocklist_screen("text", ["two words"])  # phrases go in phrases=
    with pytest.raises(ValueError):
        T.blocklist_screen("text", ["ok"], phrases=("single",))
    with pytest.raises(ValueError):
        T.blocklist_screen_sql("text", ["o'brien"])  # quote can't be valid


def _ent_truth(t):
    t = t or ""
    n = len(t)
    if n == 0:
        return 0, 0, 0
    cs = Counter(t)
    s = sum(c * round(math.log(c) * 1e6) for c in cs.values())
    return n, len(cs), round(math.log(n) * 1e6) - s // n


@pytest.mark.spark
def test_char_entropy_python_truth_and_laws(spark):
    rng = random.Random(7)
    rand = [
        "".join(rng.choice("abcdef \n\x0Bçz0") for _ in range(rng.randrange(0, 60)))
        for _ in range(40)
    ]
    texts = PLANTED + rand + ["zzzzzzzz", "abcdefgh"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = df.select("id", *T.char_entropy("text")).orderBy("id").toPandas()
    for _, r in got.iterrows():
        n, d, e = _ent_truth(texts[int(r.id)])
        assert (r.n_chars, r.distinct_chars, r.entropy_micro_nats) == (n, d, e), (
            repr(texts[int(r.id)])
        )
    by = {texts[int(r.id)]: r for _, r in got.iterrows() if texts[int(r.id)]}
    # laws: constant text has zero entropy; 8 uniform distinct chars
    # have exactly ln(8) micro-nats (integer identity: s term is 0)
    assert by["zzzzzzzz"].entropy_micro_nats == 0
    assert by["abcdefgh"].entropy_micro_nats == round(math.log(8) * 1e6)


@pytest.mark.spark
def test_char_entropy_cross_engine(spark):
    """Exact Spark == DuckDB on planted + random rows via the staged
    unnest oracle (the q84 shape, per-row here)."""
    import duckdb

    rng = random.Random(11)
    texts = PLANTED + [
        "".join(rng.choice("abc déf\x0B\n.!") for _ in range(rng.randrange(0, 40)))
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = df.select("id", *T.char_entropy("text")).orderBy("id").toPandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(len(texts)), "text": texts}))
    want = con.sql(
        """
        WITH ch AS (SELECT id, unnest(string_split(coalesce(text,''), '')) AS c FROM t),
        chf AS (SELECT * FROM ch WHERE c <> ''),
        cnt AS (SELECT id, c, count(*)::BIGINT AS cc FROM chf GROUP BY id, c),
        per AS (SELECT id, sum(cc)::BIGINT AS n, count(*)::BIGINT AS runs,
                       sum(cc * (round(ln(cc)*1000000)::BIGINT))::BIGINT AS s
                FROM cnt GROUP BY id)
        SELECT t.id, coalesce(per.n, 0) AS n_chars,
               CASE WHEN coalesce(per.n,0) > 0 THEN per.runs ELSE 0 END AS distinct_chars,
               CASE WHEN coalesce(per.n,0) > 0
                    THEN (round(ln(per.n)*1000000)::BIGINT - (per.s // per.n))
                    ELSE 0::BIGINT END AS entropy_micro_nats
        FROM t LEFT JOIN per ON t.id = per.id ORDER BY t.id
        """
    ).df()
    for c in ("n_chars", "distinct_chars", "entropy_micro_nats"):
        assert [int(x) for x in got[c]] == [int(x) for x in want[c]], c

"""Chi-square keyness: hand-computed 2x2 statistic, brute-force
Python parity (same integer algebra + one IEEE division), DuckDB-twin
bit parity, planted-enrichment direction, min_count and guards."""

import random
import re
import struct

import pytest

from btl_bloomfilter_spark.operators.keyness import chi2_keyness, chi2_keyness_sql

_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")


def _toks(t):
    s = (t or "").strip(" \t\n\x0B\f\r")
    return _WS_RE.split(s) if s else []


def _brute(texts_a, texts_b, min_count=1):
    ca, cb = {}, {}
    for t in texts_a:
        for w in _toks(t):
            ca[w] = ca.get(w, 0) + 1
    for t in texts_b:
        for w in _toks(t):
            cb[w] = cb.get(w, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    n = na + nb
    out = {}
    for w in set(ca) | set(cb):
        a, b = ca.get(w, 0), cb.get(w, 0)
        t = a + b
        if t < min_count:
            continue
        diff = a * nb - b * na
        den = t * (n - t) * na * nb
        # mirror the engines' TWO-rounding path (int->double each side,
        # then divide), not Python's one-rounding exact-rational /
        chi2 = float(n * diff * diff) / float(den) if den > 0 else 0.0
        d = "a" if diff > 0 else ("b" if diff < 0 else "-")
        out[w] = (a, b, na, nb, d, chi2)
    return out


def _rows(df):
    return {
        r.term: (r.cnt_a, r.cnt_b, r.n_a, r.n_b, r.enriched_in, r.chi2)
        for r in df.collect()
    }


@pytest.mark.spark
def test_hand_case_and_direction(spark):
    # A: 'x x y', B: 'y y z' -> n_a=3, n_b=3, n=6
    # term x: a=2,b=0 -> diff=6,  chi2 = 6*36/(2*4*9) = 3.0, in 'a'
    # term y: a=1,b=2 -> diff=-3, chi2 = 6*9/(3*3*9)  = 0.666.., 'b'
    # term z: a=0,b=1 -> diff=-3, chi2 = 6*9/(1*5*9)  = 1.2, 'b'
    da = spark.createDataFrame([("x x y",)], "text string")
    db = spark.createDataFrame([("y y z",)], "text string")
    got = _rows(chi2_keyness(da, db, "text", min_count=1))
    assert got["x"] == (2, 0, 3, 3, "a", 6 * 36 / (2 * 4 * 9))
    assert got["y"] == (1, 2, 3, 3, "b", 6 * 9 / (3 * 3 * 9))
    assert got["z"] == (0, 1, 3, 3, "b", 6 * 9 / (1 * 5 * 9))
    with pytest.raises(ValueError):
        chi2_keyness(da, db, "text", min_count=0)


@pytest.mark.spark
@pytest.mark.parametrize("seed", [1, 2])
def test_brute_force_parity(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(15)]
    skew = [f"only_a{i}" for i in range(3)]
    ta = [" ".join(rng.choices(vocab + skew, k=rng.randint(0, 12))) for _ in range(80)]
    tb = [" ".join(rng.choices(vocab, k=rng.randint(0, 12))) for _ in range(80)]
    da = spark.createDataFrame([(t,) for t in ta], "text string")
    db = spark.createDataFrame([(t,) for t in tb], "text string")
    got = _rows(chi2_keyness(da, db, "text", min_count=1))
    assert got == _brute(ta, tb)
    # planted A-only terms must be enriched in 'a'
    assert all(got[w][4] == "a" for w in got if w.startswith("only_a"))


@pytest.mark.spark
def test_duckdb_twin_bit_parity(spark):
    import duckdb

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(10)]
    ta = [" ".join(rng.choices(vocab, k=rng.randint(1, 10))) for _ in range(120)]
    tb = [" ".join(rng.choices(vocab[:7], k=rng.randint(1, 10))) for _ in range(120)]
    da = spark.createDataFrame([(t,) for t in ta], "text string")
    db = spark.createDataFrame([(t,) for t in tb], "text string")
    s_rows = [tuple(r) for r in chi2_keyness(da, db, "text", min_count=2, top_n=10).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE a (text TEXT)")
    con.execute("CREATE TABLE b (text TEXT)")
    con.executemany("INSERT INTO a VALUES (?)", [(t,) for t in ta])
    con.executemany("INSERT INTO b VALUES (?)", [(t,) for t in tb])
    sql = chi2_keyness_sql("a", "b", "text", min_count=2, top_n=10)
    d_rows = [tuple(r) for r in con.execute(f"SELECT * FROM {sql} q").fetchall()]
    assert len(s_rows) == len(d_rows) == 10
    for s, d in zip(s_rows, d_rows):
        assert s[:6] == d[:6]
        assert struct.pack("<d", s[6]) == struct.pack("<d", d[6])

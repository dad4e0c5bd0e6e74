"""Collocation lift: hand-computed contingency margins, brute-force
Python parity (ints + one IEEE division — the same arithmetic both
engines run), DuckDB-twin parity including bit-equal lift doubles,
min_count/top_n semantics, whitespace/NULL edges."""

import random
import re
import struct

import pytest

_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")

from btl_bloomfilter_spark.operators.collocations import (
    collocations,
    collocations_sql,
)


def _brute(texts, min_count=1):
    """{(w1, w2): (c_xy, c_x, c_y, n, lift)} over adjacent pairs."""
    cnt = {}
    for t in texts:
        s = (t or "").strip(" \t\n\x0B\f\r")
        toks = _WS_RE.split(s) if s else []
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    n = sum(cnt.values())
    lm, rm = {}, {}
    for (a, b), c in cnt.items():
        lm[a] = lm.get(a, 0) + c
        rm[b] = rm.get(b, 0) + c
    # two-rounding path (int->double each side, then divide), mirroring
    # both engines exactly rather than Python's exact-rational /
    return {
        (a, b): (c, lm[a], rm[b], n, float(c * n) / float(lm[a] * rm[b]))
        for (a, b), c in cnt.items()
        if c >= min_count
    }


def _rows(df):
    return {
        (r.w1, r.w2): (r.c_xy, r.c_x, r.c_y, r.n_pairs, r.lift) for r in df.collect()
    }


@pytest.mark.spark
def test_hand_case(spark):
    # pairs: (a,b)x2 (a,c)x1 (c,a)x1 -> N=4; margins: c_x[a]=3, c_x[c]=1,
    # c_y[b]=2, c_y[c]=1, c_y[a]=1
    df = spark.createDataFrame([("a b",), ("a b",), ("a c a",)], "text string")
    got = _rows(collocations(df, "text", min_count=1))
    assert got == {
        ("a", "b"): (2, 3, 2, 4, (2 * 4) / (3 * 2)),
        ("a", "c"): (1, 3, 1, 4, (1 * 4) / (3 * 1)),
        ("c", "a"): (1, 1, 1, 4, (1 * 4) / (1 * 1)),
    }


@pytest.mark.spark
def test_edges_and_min_count(spark):
    df = spark.createDataFrame(
        [(None,), ("",), ("   ",), ("solo",), ("x\x0By",), ("x y",), ("x y",)],
        "text string",
    )
    got = _rows(collocations(df, "text", min_count=2))
    # \x0B is whitespace in the shared class -> 'x y' appears 3 times
    assert got == {("x", "y"): (3, 3, 3, 3, 1.0)}
    with pytest.raises(ValueError):
        collocations(df, "text", min_count=0)


@pytest.mark.spark
@pytest.mark.parametrize("seed", [1, 2])
def test_brute_force_parity(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(0, 15))) for _ in range(150)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = _rows(collocations(df, "text", min_count=1))
    assert got == _brute(texts)


@pytest.mark.spark
def test_duckdb_twin_bit_parity_and_topn(spark):
    import duckdb

    rng = random.Random(9)
    vocab = [f"t{i}" for i in range(8)]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(2, 12))) for _ in range(200)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    sdf = collocations(df, "text", min_count=2, top_n=25)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (text TEXT)")
    con.executemany("INSERT INTO docs VALUES (?)", [(t,) for t in texts])
    sql = collocations_sql("docs", "text", min_count=2, top_n=25)
    d_rows = [tuple(r) for r in con.execute(f"SELECT * FROM {sql} q").fetchall()]
    # ORDER matters (lift desc, w1, w2 is total) and lift must be
    # BIT-identical, not approximately equal
    assert len(s_rows) == len(d_rows) == 25
    for s, d in zip(s_rows, d_rows):
        assert s[:6] == d[:6]
        assert struct.pack("<d", s[6]) == struct.pack("<d", d[6])
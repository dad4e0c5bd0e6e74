"""Sliding-window chunking: Python-truth parity, DuckDB twin parity,
coverage/overlap laws, edge docs."""

import random
import re

import pytest

from btl_bloomfilter_spark.operators.chunking import chunk_documents, chunk_documents_sql

_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")


def _py_chunks(doc_id, text, size, overlap):
    if text is None:
        return []
    t = text.strip(" \t\n\x0B\f\r")
    toks = _WS_RE.split(t) if t else []
    step = size - overlap
    out = []
    i = 0
    while i * step < len(toks):
        s = i * step
        piece = toks[s : s + size]
        out.append((doc_id, i, s, len(piece), " ".join(piece)))
        i += 1
    return out


@pytest.mark.spark
@pytest.mark.parametrize("size,overlap", [(8, 0), (8, 3), (5, 4), (1, 0), (50, 10)])
def test_parity_python_truth(spark, size, overlap):
    rng = random.Random(size * 100 + overlap)
    docs = {
        i: " ".join(f"w{rng.randrange(40)}" for _ in range(rng.randint(0, 30)))
        for i in range(40)
    }
    docs[100] = None
    docs[101] = "  \t "
    docs[102] = "single"
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = sorted(
        map(tuple, chunk_documents(df, "text", "doc_id", size=size, overlap=overlap).collect())
    )
    want = sorted(
        c for i, t in docs.items() for c in _py_chunks(i, t, size, overlap)
    )
    assert got == want


@pytest.mark.spark
def test_duckdb_twin_parity(spark):
    import duckdb

    rng = random.Random(3)
    rows = [
        (i, " ".join(f"t{rng.randrange(30)}" for _ in range(rng.randint(0, 25))))
        for i in range(50)
    ] + [(100, None), (101, " \x0B "), (102, "one two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, chunk_documents(df, "text", "doc_id", size=6, overlap=2).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = sorted(
        map(tuple, con.sql(chunk_documents_sql("d", "text", "doc_id", size=6, overlap=2)).fetchall())
    )
    assert got == want


@pytest.mark.spark
def test_coverage_and_overlap_laws(spark):
    toks = [f"w{i}" for i in range(23)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, "text", "doc_id", size=10, overlap=4).collect(),
        key=lambda r: r.chunk_idx,
    )
    # full coverage, correct overlap between neighbours
    seen = set()
    for r in rows:
        piece = r.chunk_text.split(" ")
        assert piece == toks[r.tok_start : r.tok_start + 10]
        assert r.n_tokens == len(piece) > 0
        seen.update(range(r.tok_start, r.tok_start + r.n_tokens))
    assert seen == set(range(23))
    for a, b in zip(rows, rows[1:]):
        assert b.tok_start - a.tok_start == 6  # step = size - overlap


def test_validation():
    with pytest.raises(ValueError):
        chunk_documents(None, "t", "id", size=0)
    with pytest.raises(ValueError):
        chunk_documents(None, "t", "id", size=5, overlap=5)
    with pytest.raises(ValueError):
        chunk_documents_sql("d", "t", "id", size=5, overlap=-1)

"""Integer PageRank: exact Python-reference equality, cross-engine
parity, partition invariance, structural sanity."""

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.pagerank import pagerank_int, pagerank_int_sql


def _py_ref(edges, iters, scale=1_000_000, dn=85, dd=100):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (dd - dn) * scale // dd
    r = {n: scale for n in nodes}
    for _ in range(iters):
        mass = {n: 0 for n in nodes}
        for s, d in edges:
            mass[d] += (dn * r[s]) // (dd * deg[s])
        r = {n: base + mass[n] for n in nodes}
    return r


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(3)
    edges = {(int(rng.integers(0, 40)), int(rng.integers(0, 40))) for _ in range(200)}
    edges |= {(i, 7) for i in range(20, 35)}  # node 7: heavily linked
    edges |= {(50, 0)}  # 50: source-only; node 99 appears nowhere
    edges |= {(1, 60)}  # 60: sink (no out-edges, leaks mass)
    return sorted(edges)


@pytest.mark.spark
def test_pagerank_matches_python_reference(spark, graph):
    df = spark.createDataFrame(graph, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_int(df, iters=5).collect()}
    assert got == _py_ref(graph, 5)


@pytest.mark.spark
def test_pagerank_cross_engine(spark, graph, tmp_path):
    import duckdb
    import pandas as pd

    path = str(tmp_path / "e.parquet")
    pd.DataFrame(graph, columns=["src", "dst"]).to_parquet(path)
    got = {
        r.node: r.rank
        for r in pagerank_int(spark.read.parquet(path), iters=8).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.sql(
            pagerank_int_sql(f"SELECT src, dst FROM '{path}'", iters=8)
        ).fetchall()
    )
    assert got == want


@pytest.mark.spark
def test_pagerank_partition_invariant_and_sane(spark, graph):
    df = spark.createDataFrame(graph, "src long, dst long")
    a = {r.node: r.rank for r in pagerank_int(df.repartition(3), iters=4).collect()}
    b = {r.node: r.rank for r in pagerank_int(df.repartition(19), iters=4).collect()}
    assert a == b
    # heavily-linked node outranks a source-only node
    assert a[7] > a[50]
    # source-only node holds exactly base + 0 in-mass steady state
    base = (100 - 85) * 1_000_000 // 100
    assert a[50] == base


def test_pagerank_invalid_args(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        pagerank_int(df, iters=0)
    with pytest.raises(ValueError):
        pagerank_int(df, scale=0)
    with pytest.raises(ValueError):
        pagerank_int(df, damping_num=100)
    with pytest.raises(ValueError):
        pagerank_int_sql("SELECT 1", iters=0)

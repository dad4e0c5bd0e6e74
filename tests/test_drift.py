"""PSI drift report: hand-computed planted case, identical-corpus
zero drift, cross-engine exact parity (numeric + categorical + NULL
buckets)."""
import math

import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.drift import psi_report, psi_report_sql


@pytest.mark.spark
def test_psi_planted_hand_computed(spark):
    ref = spark.createDataFrame([(v,) for v in [1.0] * 80 + [5.0] * 20], "x double")
    cur = spark.createDataFrame([(v,) for v in [1.0] * 50 + [5.0] * 50], "x double")
    out = psi_report(ref, cur, "x", edges=[3.0]).toPandas().sort_values("bucket")
    # buckets: 0 (<=3), 1 (>3); K=2, smoothing (c+1)/(n+2)
    p0, q0 = 81 / 102, 51 / 102
    p1, q1 = 21 / 102, 51 / 102
    want = (p0 - q0) * math.log(p0 / q0) + (p1 - q1) * math.log(p1 / q1)
    got_total = out.psi_total.iloc[0]
    assert abs(got_total - want) < 1e-6
    assert out.bucket.tolist() == ["0", "1"]
    assert out.ref_count.tolist() == [80, 20]


@pytest.mark.spark
def test_psi_identical_corpus_is_zero(spark):
    df = spark.createDataFrame([(float(i % 7),) for i in range(500)], "x double")
    out = psi_report(df, df, "x", edges=[2.0, 4.0]).toPandas()
    assert (out.psi_nano == 0).all()
    assert (out.psi_total == 0.0).all()


@pytest.mark.spark
def test_psi_cross_engine_exact(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(17)
    mk = lambda mu, n: [
        (rng.gauss(mu, 2.0) if rng.random() > 0.03 else None,
         rng.choice(["web", "code", "chat", None]))
        for _ in range(n)
    ]
    con = duckdb.connect()
    paths = {}
    for name, rows in (("refd", mk(0.0, 800)), ("curd", mk(1.2, 600))):
        p = str(tmp_path / f"{name}.parquet")
        pd.DataFrame(rows, columns=["x", "src"]).to_parquet(p)
        paths[name] = p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    edges = [-2.0, -0.5, 0.0, 0.5, 2.0, 3.5]
    for kwargs, col in (({"edges": edges}, "x"), ({}, "src")):
        got = (
            psi_report(
                spark.read.parquet(paths["refd"]),
                spark.read.parquet(paths["curd"]),
                col, **kwargs,
            )
            .toPandas().sort_values("bucket").reset_index(drop=True)
        )
        want = (
            con.sql(psi_report_sql("refd", "curd", col, **kwargs))
            .df().sort_values("bucket").reset_index(drop=True)
        )
        assert got["bucket"].tolist() == want["bucket"].tolist(), col
        assert got["ref_count"].tolist() == want["ref_count"].tolist(), col
        # quantized contributions EXACTLY equal -> totals exactly equal
        assert got["psi_nano"].tolist() == want["psi_nano"].tolist(), col
        assert got["psi_total"].tolist() == want["psi_total"].tolist(), col
        # NULL bucket present on both sides
        sentinel = "-1" if kwargs else "\x00"
        assert sentinel in got["bucket"].tolist(), col


@pytest.mark.spark
def test_psi_direction_sensible(spark):
    # a real shift produces a clearly positive PSI
    ref = spark.createDataFrame([(float(i % 10),) for i in range(1000)], "x double")
    cur = spark.createDataFrame([(float(i % 3),) for i in range(1000)], "x double")
    out = psi_report(ref, cur, "x", edges=[2.5, 5.0, 7.5]).toPandas()
    assert out.psi_total.iloc[0] > 0.25  # "action needed" territory

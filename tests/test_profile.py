"""Column profiler: planted nulls/distincts, typed min/max dispatch,
cross-engine parity, approx mode bound."""
import math

import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.profile import (
    profile_columns,
    profile_columns_sql,
)


@pytest.mark.spark
def test_profile_planted(spark):
    rows = [
        (1, 2.5, "a"), (2, None, "b"), (3, 7.25, None), (4, 2.5, "a"),
    ]
    df = spark.createDataFrame(rows, "id long, x double, s string")
    out = {
        r.column: r
        for r in profile_columns(df, ["id", "x", "s"]).toPandas().itertuples()
    }
    assert out["id"].n_null == 0 and out["id"].n_distinct == 4
    assert out["id"].min_num == 1.0 and out["id"].max_num == 4.0
    assert out["x"].n_null == 1 and out["x"].null_frac == 0.25
    assert out["x"].n_distinct == 2 and out["x"].max_num == 7.25
    assert out["s"].n_distinct == 2
    assert out["s"].min_str == "a" and out["s"].max_str == "b"
    assert pd.isna(out["s"].min_num) and pd.isna(out["id"].min_str)


@pytest.mark.spark
def test_profile_cross_engine(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(23)
    rows = [
        (
            i,
            None if rng.random() < 0.1 else rng.uniform(-50, 50),
            None if rng.random() < 0.2 else rng.choice(["alpha", "beta", "o'x", "zz"]),
        )
        for i in range(1000)
    ]
    pdf = pd.DataFrame(rows, columns=["id", "val", "tag"])
    path = str(tmp_path / "p.parquet")
    pdf.to_parquet(path)

    got = (
        profile_columns(spark.read.parquet(path), ["id", "val", "tag"])
        .toPandas().sort_values("column").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW p AS SELECT * FROM '{path}'")
    want = (
        con.sql(
            profile_columns_sql(
                "p", {"id": "num", "val": "num", "tag": "str"}, ["id", "val", "tag"]
            )
        )
        .df().sort_values("column").reset_index(drop=True)
    )
    for c in ("n_rows", "n_null", "null_frac", "n_distinct", "min_num",
              "max_num", "min_str", "max_str"):
        ga = got[c].fillna("~") if got[c].dtype == object else got[c].fillna(-9)
        wa = want[c].fillna("~") if want[c].dtype == object else want[c].fillna(-9)
        assert ga.tolist() == wa.tolist(), c


@pytest.mark.spark
def test_profile_approx_mode(spark):
    rows = [(i % 500, f"s{i % 211}") for i in range(5000)]
    df = spark.createDataFrame(rows, "a long, b string")
    out = {
        r.column: r
        for r in profile_columns(df, ["a", "b"], exact_distinct=False)
        .toPandas().itertuples()
    }
    # HLL++ default rsd=5%
    assert abs(out["a"].n_distinct - 500) / 500 < 0.15
    assert abs(out["b"].n_distinct - 211) / 211 < 0.15

"""Dataset mixing: feasibility arithmetic, proportion targets,
cross-engine identical selection, determinism, validation."""
import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.mixing import (
    mixture_sample,
    mixture_sample_sql,
    mixture_thresholds,
)


def test_mixture_thresholds_arithmetic():
    counts = {"web": 7000, "code": 2000, "chat": 1000}
    w = {"web": 0.7, "code": 0.2, "chat": 0.1}
    thr, t = mixture_thresholds(counts, w)
    assert t == 10000  # exactly feasible
    assert all(v == 1_000_000 for v in thr.values())  # keep everything
    # halve the target: rates halve
    thr2, t2 = mixture_thresholds(counts, w, total=5000)
    assert t2 == 5000
    assert all(v == 500_000 for v in thr2.values())
    # bottleneck source binds the feasible size
    thr3, t3 = mixture_thresholds({"web": 7000, "code": 2000, "chat": 10}, w)
    assert t3 == 100  # 10 / 0.1
    with pytest.raises(ValueError):
        mixture_thresholds({"web": 1}, {"web": 0.5, "code": 0.5})
    with pytest.raises(ValueError):
        mixture_thresholds({"web": 1}, {"web": 2.0})


@pytest.mark.spark
def test_mixture_proportions_and_determinism(spark):
    rows = [(i, ["web", "web", "web", "web", "web", "web", "code", "code", "chat"][i % 9]) for i in range(9000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"web": 0.5, "code": 0.3, "chat": 0.2}
    out = mixture_sample(df, "source", ["doc_id"], w, total=3000).toPandas()
    got = out.source.value_counts().to_dict()
    # Bernoulli variance: within 15% of target per source
    for s, frac in w.items():
        assert abs(got[s] - frac * 3000) < 0.15 * frac * 3000 + 20, (s, got)
    # rerun + repartition -> identical ids
    out2 = mixture_sample(
        df.repartition(17, "source"), "source", ["doc_id"], w, total=3000
    ).toPandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


@pytest.mark.spark
def test_mixture_cross_engine_identical(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(31)
    rows = [
        (i, rng.choice(["web"] * 6 + ["code"] * 3 + ["chat"]), f"t{i}")
        for i in range(4000)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    path = str(tmp_path / "mix.parquet")
    pdf.to_parquet(path)
    w = {"web": 0.6, "code": 0.25, "chat": 0.15}

    got = (
        mixture_sample(
            spark.read.parquet(path), "source", ["doc_id"], w, seed="mx", total=2500
        )
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW mixt AS SELECT * FROM '{path}'")
    want = (
        con.sql(mixture_sample_sql("mixt", "source", ["doc_id"], w, seed="mx", total=2500))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    # the SELECTION ITSELF must be identical, row for row
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["source"].tolist() == want["source"].tolist()


@pytest.mark.spark
def test_mixture_drops_unweighted_sources(spark):
    rows = [(i, ["web", "junk"][i % 2]) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(df, "source", ["doc_id"], {"web": 1.0}).toPandas()
    assert set(out.source) == {"web"}
    assert len(out) == 50  # w=1, T=n_web: keep all web rows

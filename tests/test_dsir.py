"""DSIR hashed-gram importance weights: directional sanity, exact
fixed-point cross-engine parity, partition invariance, profile
reuse, empty/NULL candidates."""
import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.dsir import (
    bucket_counts,
    dsir_log_weights,
    dsir_log_weights_sql,
)


def _score(spark, target_rows, raw_rows, cand_rows, **kw):
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    cand = spark.createDataFrame(cand_rows, "doc_id long, text string")
    nb = kw.pop("num_buckets", 256)
    tc = bucket_counts(target, "text", num_buckets=nb, **kw)
    rc = bucket_counts(raw, "text", num_buckets=nb, **kw)
    return dsir_log_weights(cand, "text", "doc_id", tc, rc, num_buckets=nb, **kw)


@pytest.mark.spark
def test_dsir_directional(spark):
    # target is science-y, raw is spam-y: a science candidate must
    # out-weigh a spam candidate
    target = [(i, "peer reviewed study of protein folding dynamics") for i in range(8)]
    raw = [(i, "buy cheap pills now best discount offer click") for i in range(8)]
    cands = [
        (100, "reviewed study of protein dynamics"),
        (101, "cheap pills discount offer click now"),
        (102, None),
    ]
    out = {
        r.doc_id: r
        for r in _score(spark, target, raw, cands).toPandas().itertuples()
    }
    assert out[100].log_weight > 0 > out[101].log_weight
    assert out[102].n_grams == 0 and pd.isna(out[102].log_weight)


@pytest.mark.spark
def test_dsir_cross_engine_exact(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(11)
    sci = ["study", "model", "data", "result", "method", "o'brien"]
    spam = ["buy", "cheap", "now", "offer", "click", "deal"]

    def mk(words, n, start):
        return [
            (start + i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 15))) or None)
            for i in range(n)
        ]

    frames = {
        "target_t": mk(sci, 40, 0),
        "raw_t": mk(sci + spam, 120, 1000),
        "cand_t": mk(sci + spam, 80, 5000),
    }
    con = duckdb.connect()
    paths = {}
    for name, rows in frames.items():
        p = str(tmp_path / f"{name}.parquet")
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p)
        paths[name] = p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    nb, seed = 64, "s1"
    tc = bucket_counts(
        spark.read.parquet(paths["target_t"]), "text", num_buckets=nb, seed=seed
    )
    rc = bucket_counts(
        spark.read.parquet(paths["raw_t"]), "text", num_buckets=nb, seed=seed
    )
    got = (
        dsir_log_weights(
            spark.read.parquet(paths["cand_t"]), "text", "doc_id", tc, rc,
            num_buckets=nb, seed=seed,
        )
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        con.sql(
            dsir_log_weights_sql(
                "cand_t", "text", "doc_id", "target_t", "raw_t",
                num_buckets=nb, seed=seed,
            )
        )
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    # long sums must be EXACTLY equal across engines
    assert got["lr_micro_sum"].tolist() == want["lr_micro_sum"].tolist()
    assert got["n_grams"].tolist() == want["n_grams"].tolist()
    assert got["log_weight"].fillna(0).tolist() == want["log_weight"].fillna(0).tolist()


@pytest.mark.spark
def test_dsir_partition_invariance(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} shared words here") for i in range(60)]
    target = [(i, "tok1 tok2 shared") for i in range(10)]
    t = spark.createDataFrame(target, "doc_id long, text string")
    c = spark.createDataFrame(rows, "doc_id long, text string")
    tc = bucket_counts(t, "text", num_buckets=128)
    rc = bucket_counts(c, "text", num_buckets=128)
    a = dsir_log_weights(c, "text", "doc_id", tc, rc, num_buckets=128).toPandas()
    b = dsir_log_weights(
        c.repartition(17, "text"), "text", "doc_id", tc, rc, num_buckets=128
    ).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a["lr_micro_sum"].tolist() == b["lr_micro_sum"].tolist()


@pytest.mark.spark
def test_dsir_unseen_bucket_floor(spark):
    # a candidate gram hashing to a bucket absent from BOTH profiles
    # takes the floor ratio (coalesce path), not an error/NULL
    import math

    target = [(1, "aaa bbb")]          # T_t = 3 grams
    raw = [(1, "ccc ddd eee")]         # T_r = 5 grams
    cands = [(9, "zzzzz unseen gram entirely")]
    out = _score(spark, target, raw, cands, num_buckets=8192).toPandas().iloc[0]
    assert out.n_grams == 7  # 4 unigrams + 3 bigrams
    floor = round(math.log(1 / (3 + 8192)) * 1e6) - round(
        math.log(1 / (5 + 8192)) * 1e6
    )
    # no candidate gram collides with the <=8 profile buckets (md5 is
    # deterministic, so this either always holds or never does)
    assert out.lr_micro_sum == 7 * floor

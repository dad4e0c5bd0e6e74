"""Unigram-LM quality scoring: hand-computed planted case, exact
fixed-point determinism, cross-engine parity, train-once/score-many
reuse, empty/NULL documents, min_count OOV path."""
import math

import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.lmscore import (
    lm_doc_scores,
    lm_doc_scores_sql,
    unigram_lm,
)


@pytest.mark.spark
def test_lm_planted_hand_computed(spark):
    # training corpus = all three docs: a=4, b=2 -> T=6, V=2, denom=9
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in lm_doc_scores(docs, "text", "doc_id").toPandas().itertuples()
    }
    nll_a = round(-math.log(5 / 9) * 1e6)
    nll_b = round(-math.log(3 / 9) * 1e6)
    assert out[1].n_tokens == 4 and out[1].oov_tokens == 0
    assert out[1].nll_micro_sum == 3 * nll_a + nll_b
    assert out[1].mean_nll == round((3 * nll_a + nll_b) / 4 / 1e6, 6)
    assert out[2].nll_micro_sum == nll_a + nll_b
    # doc 2 is less typical (more mass on the rare token) than doc 1
    assert out[2].mean_nll > out[1].mean_nll
    # empty doc: present, zero tokens, NULL score
    assert out[3].n_tokens == 0 and pd.isna(out[3].mean_nll)


@pytest.mark.spark
def test_lm_min_count_oov_floor(spark):
    # min_count=2 trims 'rare' (cnt 1): kept counts a=3 -> T=3, V=1,
    # denom=5; rare scores at the OOV floor -ln(1/5)
    docs = spark.createDataFrame(
        [(1, "a a a rare")], "doc_id long, text string"
    )
    out = lm_doc_scores(docs, "text", "doc_id", min_count=2).toPandas().iloc[0]
    nll_a = round(-math.log(4 / 5) * 1e6)
    oov = round(-math.log(1 / 5) * 1e6)
    assert out.oov_tokens == 1
    assert out.nll_micro_sum == 3 * nll_a + oov


@pytest.mark.spark
def test_lm_cross_engine_parity(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(7)
    vocab = ["Alpha", "beta", "GAMMA", "delta", "o'brien", "zeta"]
    rows = []
    for i in range(120):
        n = rng.randint(0, 25)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n)) or None))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = str(tmp_path / "lm.parquet")
    pdf.to_parquet(path)

    got = (
        lm_doc_scores(spark.read.parquet(path), "text", "doc_id", min_count=2)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    want = (
        con.sql(lm_doc_scores_sql("documents", "text", "doc_id", min_count=2))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # fixed-point sums must be EXACTLY equal (long arithmetic),
    # not approximately
    assert got["nll_micro_sum"].tolist() == want["nll_micro_sum"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert got["oov_tokens"].tolist() == want["oov_tokens"].tolist()
    ga, wa = got["mean_nll"].fillna(-1), want["mean_nll"].fillna(-1)
    assert ga.tolist() == wa.tolist()


@pytest.mark.spark
def test_lm_train_once_score_shard(spark):
    # score a shard against a FIXED trusted-corpus LM: OOV terms hit
    # the floor; identical text scores identically across shards
    trusted = spark.createDataFrame(
        [(1, "good clean prose here"), (2, "clean prose")],
        "doc_id long, text string",
    )
    lm = unigram_lm(trusted, "text")
    shard = spark.createDataFrame(
        [(10, "clean prose"), (11, "zzzz qqqq")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in lm_doc_scores(shard, "text", "doc_id", lm=lm)
        .toPandas()
        .itertuples()
    }
    assert out[10].oov_tokens == 0
    assert out[11].oov_tokens == 2
    # all-OOV doc scores strictly worse than the in-distribution one
    assert out[11].mean_nll > out[10].mean_nll


@pytest.mark.spark
def test_lm_partition_invariance(spark):
    # exact long sums make the score independent of partition layout
    rows = [(i, f"tok{i % 5} tok{i % 3} shared") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = lm_doc_scores(docs, "text", "doc_id").toPandas()
    b = lm_doc_scores(docs.repartition(13, "text"), "text", "doc_id").toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a["nll_micro_sum"].tolist() == b["nll_micro_sum"].tolist()

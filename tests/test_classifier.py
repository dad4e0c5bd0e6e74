"""Deterministic hashed-feature logistic regression: bit-identical
training under different partitionings (the headline law), separable
corpus convergence, agreement with a single-machine numpy reference,
edge rows."""

import random

import numpy as np
import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.classifier import (
    hashed_features,
    score_documents,
    train_quality_classifier,
)

DIM = 1 << 12


def _corpus(n=300, seed=1):
    rng = random.Random(seed)
    good = ["clean", "prose", "useful", "document", "text", "report"]
    junk = ["zzspam", "zzjunk", "zzbad", "zzscam"]
    rows = []
    for i in range(n):
        y = i % 2
        words = rng.choices(good, k=rng.randint(4, 10))
        if y:
            words += rng.choices(junk, k=rng.randint(2, 5))
        rng.shuffle(words)
        rows.append((i, " ".join(words), float(y)))
    return rows


@pytest.mark.spark
def test_partition_invariant_bitwise(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    w = {}
    for parts in (3, 17):
        feat = hashed_features(df.repartition(parts), "text", "label", dim=DIM).cache()
        feat.count()
        w[parts], losses = train_quality_classifier(feat, dim=DIM, iters=6, lr=2.0)
        feat.unpersist()
        assert losses == sorted(losses, reverse=True) or losses[-1] < losses[0]
    assert np.array_equal(w[3], w[17])  # BIT-identical, not approx


@pytest.mark.spark
def test_matches_numpy_reference(spark):
    # same quantized-gradient algorithm run serially in numpy must
    # produce the same weights (the distribution adds nothing)
    rows = _corpus(120, seed=5)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    feat = hashed_features(df, "text", "label", dim=DIM).cache()
    got, _ = train_quality_classifier(feat, dim=DIM, iters=4, lr=1.5, optimizer="gd")
    pdf = feat.toPandas()
    feat.unpersist()

    w = np.zeros(DIM + 1)
    for _ in range(4):
        acc = np.zeros(DIM + 1, dtype=np.int64)
        for _, r in pdf.iterrows():
            ix = np.asarray(r["idxs"], dtype=np.int64)
            v = np.asarray(r["vals"], dtype=np.float64)
            m = float(np.dot(w[ix], v)) + w[DIM]
            p = 1.0 / (1.0 + np.exp(-m))
            err = p - r["label"]
            np.add.at(acc, ix, np.rint(err * v * 1e9).astype(np.int64))
            acc[DIM] += int(np.rint(err * 1e9))
        g = acc / 1e9 / len(pdf)
        w = w - 1.5 * g
    assert np.array_equal(got, w)


@pytest.mark.spark
def test_separable_corpus_scores(spark):
    rows = _corpus(400, seed=9)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    feat = hashed_features(df, "text", "label", dim=DIM).cache()
    # full-batch GD oscillates before capture at this lr — judged on
    # the final loss and accuracy, not monotonicity
    w, losses = train_quality_classifier(feat, dim=DIM, iters=40, lr=30.0)
    feat.unpersist()
    assert losses[-1] < 0.1 < losses[0]
    scored = score_documents(df, "text", w, dim=DIM)
    acc = scored.select(
        ((F.col("quality_prob") > 0.5).cast("double") == F.col("label")).cast("long").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    assert acc >= 0.95, acc


@pytest.mark.spark
def test_edge_rows(spark):
    df = spark.createDataFrame(
        [(1, None, 0.0), (2, "", 1.0), (3, "  \t ", 0.0), (4, "zzspam zzspam", 1.0)],
        "doc_id long, text string, label double",
    )
    feat = hashed_features(df, "text", "label", dim=DIM)
    w, _ = train_quality_classifier(feat, dim=DIM, iters=2, lr=1.0)
    out = score_documents(df, "text", w, dim=DIM).collect()
    assert len(out) == 4 and all(0.0 <= r.quality_prob <= 1.0 for r in out)


def test_validation():
    with pytest.raises(ValueError):
        hashed_features(None, "t", "label", dim=1)
    with pytest.raises(ValueError):
        train_quality_classifier(None, iters=0)

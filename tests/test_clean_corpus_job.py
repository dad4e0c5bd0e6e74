"""End-to-end corpus-preparation job: quality gates → redaction →
dedup → deterministic split, written partitionBy(split)."""
import os

import pytest

from pyspark.sql import functions as F


@pytest.mark.spark
def test_clean_corpus_job_end_to_end(spark, tmp_path):
    import jobs.clean_corpus as cj

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant: exact duplicates of 5 docs, one PII doc, one lorem page
    dups = base.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    extra = spark.createDataFrame(
        [
            (200001, "contact me at spam@example.org " + "word " * 60, "en", "srcX", 300),
            (200002, "lorem ipsum dolor " + "word " * 60, "en", "srcX", 300),
        ],
        base.schema,
    )
    inp = str(tmp_path / "in.parquet")
    base.unionByName(dups).unionByName(extra).write.parquet(inp)
    out = str(tmp_path / "clean.parquet")

    stats = cj.main(
        [
            "--input", inp, "-o", out,
            "--gopher", "--repetition", "--redact-pii", "--exact-dedup",
            "--min-words", "10",
            "--split", "train=0.8,val=0.1,test=0.1", "--seed", "7",
        ]
    )
    n_in = stats["input"]
    assert n_in == base.count() + 7
    # gates drop nothing catastrophic but the pipeline is monotone
    assert stats["after_gopher"] <= n_in
    assert stats["after_repetition"] <= stats["after_gopher"]
    assert stats["after_exact_dedup"] <= stats["after_repetition"]
    assert stats["output"] == stats["after_exact_dedup"] > 0

    got = spark.read.parquet(out)
    # split partition dirs exist and cover the output
    parts = {d for d in os.listdir(out) if d.startswith("split=")}
    assert parts <= {"split=train", "split=val", "split=test"} and parts
    # exact dedup: no text appears twice
    assert got.groupBy("text").count().where("count > 1").count() == 0
    # planted duplicates: the 5 copied texts survive exactly once each,
    # as the min-id originals
    assert got.where(F.col("doc_id") >= 100000).where(F.col("doc_id") < 200000).count() == 0
    # PII redacted in place
    pii = got.where(F.col("doc_id") == 200001)
    if pii.count():  # survives gates
        assert "<EMAIL>" in pii.collect()[0]["text"]
        assert "spam@example.org" not in pii.collect()[0]["text"]
    # deterministic: re-running lands every doc in the same split
    out2 = str(tmp_path / "clean2.parquet")
    cj.main(
        [
            "--input", inp, "-o", out2,
            "--gopher", "--repetition", "--redact-pii", "--exact-dedup",
            "--min-words", "10",
            "--split", "train=0.8,val=0.1,test=0.1", "--seed", "7",
        ]
    )
    a = spark.read.parquet(out).select("doc_id", "split")
    b = spark.read.parquet(out2).select("doc_id", F.col("split").alias("split2"))
    assert a.join(b, "doc_id").where(F.col("split") != F.col("split2")).count() == 0


@pytest.mark.spark
def test_clean_corpus_c4_rewrite(spark, tmp_path):
    import jobs.clean_corpus as cj

    rows = [
        (1, "good first sentence with words.\nno punct line\n"
            "another good sentence with several words.\n"
            "third full sentence is here today.", "en", "s", 1),
        (2, "this page mentions lorem ipsum somewhere.\n"
            "an otherwise fine long sentence here.", "en", "s", 1),
    ]
    inp = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(inp)
    out = str(tmp_path / "c4.parquet")
    stats = cj.main(["--input", inp, "-o", out, "--c4-rewrite"])
    assert stats == {"input": 2, "after_c4": 1, "output": 1}
    txt = spark.read.parquet(out).collect()[0]["text"]
    assert "no punct line" not in txt and txt.count("\n") == 2


@pytest.mark.spark
def test_clean_corpus_no_stats_single_pass(spark, tmp_path):
    import jobs.clean_corpus as cj

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "in.parquet")
    base.write.parquet(inp)
    out = str(tmp_path / "ns.parquet")
    stats = cj.main(
        ["--input", inp, "-o", out, "--gopher", "--min-words", "10", "--no-stats"]
    )
    # only input/output recorded; result identical to the stats run
    assert set(stats) == {"input", "output"}
    stats2 = cj.main(
        ["--input", inp, "-o", str(tmp_path / "ws.parquet"), "--gopher", "--min-words", "10"]
    )
    assert stats["output"] == stats2["output"] == stats2["after_gopher"]


@pytest.mark.spark
def test_clean_corpus_lm_and_dsir_gates(spark, tmp_path):
    import jobs.clean_corpus as cj

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    # plant an atypical doc (gibberish vocabulary): the LM gate's prey
    extra = spark.createDataFrame(
        [(300001, " ".join(f"zq{i}x" for i in range(80)), "en", "srcX", 300)],
        base.schema,
    )
    inp = str(tmp_path / "in.parquet")
    base.unionByName(extra).write.parquet(inp)
    target = str(tmp_path / "target.parquet")
    base.limit(30).write.parquet(target)
    out = str(tmp_path / "clean.parquet")

    # derive the gate: midway between the worst normal doc and the
    # planted all-singleton doc (whose mean NLL is near the maximum)
    from btl_bloomfilter_spark.operators.lmscore import lm_doc_scores

    scores = lm_doc_scores(
        spark.read.parquet(inp), "text", "doc_id", min_count=2
    ).toPandas().set_index("doc_id")
    planted = scores.loc[300001, "mean_nll"]
    worst_normal = scores.drop(300001)["mean_nll"].max()
    assert planted > worst_normal  # test premise
    thresh = (planted + worst_normal) / 2

    stats = cj.main(
        [
            "--input", inp, "-o", out,
            "--lm-nll-max", str(thresh),
            "--dsir-target", target, "--dsir-min-logw", "-1000000.0",
        ]
    )
    assert stats["after_lm_gate"] <= stats["input"]
    # the gibberish doc is all rare singletons -> extreme mean NLL
    ids = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert 300001 not in ids
    assert stats["after_dsir"] <= stats["after_lm_gate"]
    assert stats["output"] == stats["after_dsir"] > 0

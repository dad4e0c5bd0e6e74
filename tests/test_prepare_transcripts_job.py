"""End-to-end transcript-preparation job: structure gate → PII
redaction → exact + near conversation dedup → budget truncation →
emit (turns / sft / packed) → conv-keyed split."""
import json
import os

import pytest

from pyspark.sql import functions as F

SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _turns(spark):
    c1 = [
        ("c1", 0, "user", "alpha beta gamma delta"),
        ("c1", 1, "assistant", "epsilon zeta"),
        ("c1", 2, "user", "eta theta iota"),
        ("c1", 3, "assistant", "kappa"),
    ]
    # exact duplicate of c1 (same texts, same order)
    c2 = [("c2", i, r, t) for (_, i, r, t) in c1]
    # near-dup of c1: last turn dropped (w=3 digest shingles share 1/2)
    c3 = [("c3", i, r, t) for (_, i, r, t) in c1[:3]]
    # malformed: opens with assistant -> structure gate drops it
    c4 = [
        ("c4", 0, "assistant", "unsolicited reply"),
        ("c4", 1, "user", "confused"),
    ]
    # PII conversation, otherwise well-formed and unique
    c5 = [
        ("c5", 0, "user", "mail me at spam@example.org please"),
        ("c5", 1, "assistant", "done and noted"),
    ]
    return spark.createDataFrame(c1 + c2 + c3 + c4 + c5, SCHEMA)


@pytest.mark.spark
def test_prepare_transcripts_end_to_end(spark, tmp_path):
    import jobs.prepare_transcripts as pj

    inp = str(tmp_path / "turns.parquet")
    _turns(spark).write.parquet(inp)
    out = str(tmp_path / "prepped.parquet")
    argv = [
        "--input", inp, "-o", out,
        "--require-well-formed", "--redact-pii",
        "--exact-dedup", "--near-dedup", "--near-threshold", "0.5",
        "--split", "train=0.8,val=0.2", "--seed", "7",
    ]
    stats = pj.main(argv)

    assert stats["input_convs"] == 5 and stats["input_turns"] == 15
    # c4 malformed
    assert stats["after_structure_gate_convs"] == 4
    # c2 exact-dup of c1; keeper is min id c1
    assert stats["after_exact_dedup_convs"] == 3
    # c3 near-dup of c1 at jaccard 0.5
    assert stats["after_near_dedup_convs"] == 2

    got = spark.read.parquet(out)
    assert {r.conv_id for r in got.select("conv_id").distinct().collect()} == {"c1", "c5"}
    # PII redacted in place
    t5 = got.where("conv_id = 'c5' and turn_idx = 0").collect()[0].text
    assert "<EMAIL>" in t5 and "spam@example.org" not in t5
    # split dirs exist; whole conversations stay in one split
    parts = {d for d in os.listdir(out) if d.startswith("split=")}
    assert parts and parts <= {"split=train", "split=val"}
    per_conv = got.groupBy("conv_id").agg(F.countDistinct("split").alias("ns"))
    assert per_conv.where("ns > 1").count() == 0
    # metrics.json mirrors the printed stats
    with open(str(tmp_path / "metrics.json")) as fh:
        assert json.load(fh) == stats
    # deterministic: rerun assigns identical splits
    out2 = str(tmp_path / "prepped2.parquet")
    pj.main(argv[:3] + [out2] + argv[4:])
    a = spark.read.parquet(out).select("conv_id", "turn_idx", "split")
    b = (
        spark.read.parquet(out2)
        .select("conv_id", "turn_idx", F.col("split").alias("split2"))
    )
    assert a.join(b, ["conv_id", "turn_idx"]).where("split != split2").count() == 0


@pytest.mark.spark
def test_prepare_transcripts_budget_and_sft(spark, tmp_path):
    import jobs.prepare_transcripts as pj

    inp = str(tmp_path / "turns.parquet")
    _turns(spark).write.parquet(inp)

    # budget 7 over c1 (tokens 4,2,3,1): suffix sums from the end are
    # 1,4,6,10 -> keep turn_idx {1,2,3}
    out = str(tmp_path / "trunc.parquet")
    stats = pj.main(["--input", inp, "-o", out, "--budget", "7"])
    got = spark.read.parquet(out)
    kept = sorted(
        r.turn_idx for r in got.where("conv_id = 'c1'").select("turn_idx").collect()
    )
    assert kept == [1, 2, 3]
    assert stats["after_truncation_turns"] == got.count()
    # truncation preserves the input column set exactly
    assert set(got.columns) == {"conv_id", "turn_idx", "role", "text"}

    # sft emit: one row per assistant turn, context = preceding lines
    out_sft = str(tmp_path / "sft.parquet")
    pj.main(["--input", inp, "-o", out_sft, "--emit", "sft", "--n-context", "2"])
    sft = spark.read.parquet(out_sft)
    assert set(sft.columns) == {"conv_id", "turn_idx", "n_context_turns", "context", "target"}
    r = sft.where("conv_id = 'c1' and turn_idx = 3").collect()[0]
    assert r.target == "kappa"
    assert r.context == "assistant: epsilon zeta\nuser: eta theta iota"


@pytest.mark.spark
def test_prepare_transcripts_packed_emit(spark, tmp_path):
    import jobs.prepare_transcripts as pj

    inp = str(tmp_path / "turns.parquet")
    _turns(spark).write.parquet(inp)
    out = str(tmp_path / "packed.parquet")
    pj.main(["--input", inp, "-o", out, "--emit", "packed", "--capacity", "16"])
    got = spark.read.parquet(out)
    assert set(got.columns) == {"shard", "conv_id", "tokens", "bin_idx", "oversize"}
    # every conversation packed exactly once; no bin over capacity
    assert got.count() == got.select("conv_id").distinct().count() == 5
    over = (
        got.where(~F.col("oversize"))
        .groupBy("shard", "bin_idx")
        .agg(F.sum("tokens").alias("s"))
        .where("s > 16")
    )
    assert over.count() == 0


@pytest.mark.spark
def test_prepare_transcripts_synthetic_mode(spark, tmp_path):
    import jobs.prepare_transcripts as pj

    out = str(tmp_path / "synth.parquet")
    stats = pj.main(
        ["--synthetic-convs", "60", "-o", out, "--exact-dedup", "--no-stats"]
    )
    got = spark.read.parquet(out)
    assert stats["output_rows"] == got.count() > 0
    # north-rule input shape survives the pipeline
    assert {"conv_id", "turn_idx", "role", "text", "tool", "ts"} <= set(got.columns)

"""Ordered group fingerprints: partition-layout invariance (the
north_rule per-turn-ordering invariant), duplicate-group resolution,
and sensitivity to both content and order."""

import hashlib

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.dedup import duplicate_groups, group_fingerprints
from btl_bloomfilter_spark.sources.transcripts import transcripts_df


def _md5(parts):
    # digest chain: md5 of the concatenated per-turn md5 hex digests
    chain = "".join(hashlib.md5(p.encode()).hexdigest() for p in parts)
    return hashlib.md5(chain.encode()).hexdigest()


def test_matches_driver_reconstruction(spark):
    t = transcripts_df(spark, 40, partitions=8)
    got = {
        r["conv_id"]: (r["n_rows"], r["fingerprint"])
        for r in group_fingerprints(t, "conv_id", "turn_idx", "text").collect()
    }
    rows = t.orderBy("conv_id", "turn_idx").collect()
    by_conv: dict = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r["text"])
    assert got == {cid: (len(ts), _md5(ts)) for cid, ts in by_conv.items()}


def test_partition_layout_invariance(spark):
    """Same corpus under shuffled row order / different partitioning
    fingerprints identically — collect_list alone would not."""
    t = transcripts_df(spark, 60, partitions=4)
    a = group_fingerprints(t, "conv_id", "turn_idx", "text")
    scrambled = t.repartition(17, F.md5(F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string"))))
    b = group_fingerprints(scrambled, "conv_id", "turn_idx", "text")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_order_and_content_sensitivity(spark):
    base = spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 1, "world"), ("c2", 0, "world"), ("c2", 1, "hello")],
        "g string, o int, t string",
    )
    fp = {r["g"]: r["fingerprint"] for r in group_fingerprints(base, "g", "o", "t").collect()}
    assert fp["c1"] != fp["c2"]  # same bag of turns, different order
    assert fp["c1"] == _md5(["hello", "world"])


def test_separator_injection_immune(spark):
    """A text containing any would-be separator byte cannot make two
    different groups collide (digest chain, not raw join)."""
    df = spark.createDataFrame(
        [("a", 0, "foo\x1ebar"), ("b", 0, "foo"), ("b", 1, "bar")],
        "g string, o int, t string",
    )
    fp = {r["g"]: r["fingerprint"] for r in group_fingerprints(df, "g", "o", "t").collect()}
    assert fp["a"] != fp["b"]
    assert fp["a"] == _md5(["foo\x1ebar"])


def test_duplicate_groups(spark):
    t = transcripts_df(spark, 30, partitions=4)
    dup = t.withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("-copy")))
    fps = group_fingerprints(t.unionByName(dup), "conv_id", "turn_idx", "text")
    out = duplicate_groups(fps, "conv_id").collect()
    assert all(r["dup_group_size"] == 2 for r in out)
    for r in out:
        # keeper is the min id of the pair: the original sorts first
        assert r["keeper"] == min(r["conv_id"], r["conv_id"].removesuffix("-copy"))
    assert len(out) == 2 * len({r["conv_id"] for r in t.select("conv_id").collect()})

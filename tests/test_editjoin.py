"""edit_distance_join: brute-force parity (the operator's two prunes
are provably lossless — this is the proof's empirical twin), edge
semantics, the char-vs-byte cross-engine caveat, and plan shape."""

import random

import pytest
from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.editjoin import edit_distance_join, qgram_profile


def _corpus(spark, n=220, seed=7):
    rng = random.Random(seed)
    rows = [(i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 11)))) for i in range(n)]
    # duplicates, empties, unicode, null
    rows += [(900, "café"), (901, "cafe"), (902, "caf"), (903, None),
             (904, ""), (905, ""), (906, "你好吗"), (907, "你好x吗")]
    return spark.createDataFrame(rows, "id long, s string")


def _brute(df, d):
    a, b = df.alias("a"), df.alias("b")
    return {
        (r.id_a, r.id_b, r.dist)
        for r in (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.levenshtein("a.s", "b.s").cast("long").alias("dist"),
            )
            .where(F.col("dist") <= d)
            .collect()
        )
    }


@pytest.mark.spark
@pytest.mark.parametrize("d", [0, 1, 2, 3])
def test_brute_force_parity(spark, d):
    """High-collision 3-letter alphabet, lengths 0-11: exercises the
    short fallback (most strings have <= 2*q*d distinct grams), heavy
    ties, duplicate strings, unicode, and both path boundaries."""
    df = _corpus(spark)
    got = {(r.id_a, r.id_b, r.dist) for r in edit_distance_join(df, "s", "id", max_dist=d).collect()}
    assert got == _brute(df, d)


@pytest.mark.spark
def test_long_path_parity(spark):
    """Long-ish distinct-gram-rich strings so the q-gram prefix path
    (not the short fallback) carries the pairs."""
    rng = random.Random(3)
    alpha = "abcdefghijklmnop"
    base = ["".join(rng.choice(alpha) for _ in range(24)) for _ in range(40)]
    rows = [(i, s) for i, s in enumerate(base)]
    # planted near-dups: 1 substitution, 2 deletions, 1 insertion
    rows += [(100 + i, s[:5] + "z" + s[6:]) for i, s in enumerate(base[:10])]
    rows += [(200 + i, s[:4] + s[6:]) for i, s in enumerate(base[:10])]
    rows += [(300 + i, s[:12] + "q" + s[12:]) for i, s in enumerate(base[:10])]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r.id_a, r.id_b, r.dist) for r in edit_distance_join(df, "s", "id", max_dist=2).collect()}
    want = _brute(df, 2)
    assert got == want
    assert len(got) >= 30  # every planted variant found


@pytest.mark.spark
def test_threshold_boundary(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghiX"), (3, "abcdefgXYZ")], "id long, s string"
    )
    got = {(r.id_a, r.id_b, r.dist) for r in edit_distance_join(df, "s", "id", max_dist=1).collect()}
    assert got == {(1, 2, 1)}  # dist 3 pair (1,3) and (2,3) excluded


@pytest.mark.spark
def test_null_dropped_empty_participates(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "ab"), (4, "")], "id long, s string")
    got = {(r.id_a, r.id_b, r.dist) for r in edit_distance_join(df, "s", "id", max_dist=2).collect()}
    assert got == {(2, 4, 0), (2, 3, 2), (3, 4, 2)}  # null joins nothing


@pytest.mark.spark
def test_profile_passthrough_identical(spark):
    df = _corpus(spark, n=80)
    prof = qgram_profile(df, "s", "id", q=2, max_dist=2).persist()
    try:
        via = {(r.id_a, r.id_b, r.dist)
               for r in edit_distance_join(df, "s", "id", max_dist=2, profile=prof).collect()}
        plain = {(r.id_a, r.id_b, r.dist)
                 for r in edit_distance_join(df, "s", "id", max_dist=2).collect()}
        assert via == plain
    finally:
        prof.unpersist()


@pytest.mark.spark
def test_hash_order_identical_output(spark):
    """Any global gram order is correct (the prefix theorem needs only
    a shared total order): order='hash' (pure-map profile) must give
    the same pairs as the df-ascending default."""
    df = _corpus(spark, n=120)
    want = {(r.id_a, r.id_b, r.dist)
            for r in edit_distance_join(df, "s", "id", max_dist=2).collect()}
    got = {(r.id_a, r.id_b, r.dist)
           for r in edit_distance_join(df, "s", "id", max_dist=2, order="hash").collect()}
    assert got == want
    with pytest.raises(ValueError):
        edit_distance_join(df, "s", "id", max_dist=2, order="nope").collect()


@pytest.mark.spark
def test_char_vs_byte_levenshtein_divergence(spark):
    """Spark counts CHARACTERS, DuckDB counts BYTES: 'café'->'cafe' is
    1 vs 2.  Pins why q105's oracle corpus is ASCII (hex digests); the
    operator itself follows Spark's char semantics consistently
    (substring grams are char-based too)."""
    import duckdb

    s = spark.createDataFrame([("café", "cafe")], "a string, b string")
    assert s.select(F.levenshtein("a", "b")).collect()[0][0] == 1
    assert duckdb.connect().execute("select levenshtein('café','cafe')").fetchone()[0] == 2
    df = spark.createDataFrame([(1, "café"), (2, "cafe")], "id long, s string")
    got = edit_distance_join(df, "s", "id", max_dist=1).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in got] == [(1, 2, 1)]


@pytest.mark.spark
def test_plan_no_cartesian(spark):
    import contextlib
    import io

    df = _corpus(spark, n=60)
    out = edit_distance_join(df, "s", "id", max_dist=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.spark
def test_profile_mismatch_rejected(spark):
    """A profile built with different q/max_dist silently breaks the
    prefix theorem, so the join must refuse it (metadata stamped by
    qgram_profile); a LARGER profile max_dist only lengthens prefixes
    and is accepted."""
    df = _corpus(spark, n=40)
    p_small = qgram_profile(df, "s", "id", q=3, max_dist=1)
    with pytest.raises(ValueError, match="incompatible"):
        edit_distance_join(df, "s", "id", max_dist=2, q=3, profile=p_small)
    with pytest.raises(ValueError, match="incompatible"):
        edit_distance_join(df, "s", "id", max_dist=1, q=2, profile=p_small)  # q differs
    # foreign table without metadata: rejected too
    with pytest.raises(ValueError, match="incompatible"):
        edit_distance_join(df, "s", "id", max_dist=1, profile=df.withColumnRenamed("s", "other"))
    p_big = qgram_profile(df, "s", "id", q=2, max_dist=3)
    via_big = {(r.id_a, r.id_b, r.dist)
               for r in edit_distance_join(df, "s", "id", max_dist=2, profile=p_big).collect()}
    plain = {(r.id_a, r.id_b, r.dist)
             for r in edit_distance_join(df, "s", "id", max_dist=2).collect()}
    assert via_big == plain


@pytest.mark.spark
def test_short_salt_invariant(spark):
    """short_salt spreads the hot-length join over reducers without
    changing the result (salted_join is value-invisible)."""
    df = _corpus(spark, n=150)
    base = {(r.id_a, r.id_b, r.dist)
            for r in edit_distance_join(df, "s", "id", max_dist=2).collect()}
    for salt in (1, 3):
        got = {(r.id_a, r.id_b, r.dist)
               for r in edit_distance_join(df, "s", "id", max_dist=2, short_salt=salt).collect()}
        assert got == base

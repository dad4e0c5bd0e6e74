"""SQL table-function (UDTF) surface: LATERAL mechanics, exact
equality with the pure-Catalyst expansion paths, and edge rows."""

import pytest
from pyspark.sql import functions as F

from btl_bloomfilter_spark.functions.tvf import register_tvfs

ROWS = [
    (0, "abcdef"),
    (1, "ab"),          # shorter than k → no kmer rows
    (2, ""),
    (3, None),
    (4, "a b  c\td \n e"),
    (5, "x\x0By z"),    # vertical tab is library whitespace
]


@pytest.fixture()
def docs(spark):
    register_tvfs(spark)
    df = spark.createDataFrame(ROWS, "id long, text string")
    df.createOrReplaceTempView("tvf_docs")
    return df


@pytest.mark.spark
def test_kmers_tvf_matches_catalyst_substring(spark, docs):
    got = spark.sql(
        "SELECT d.id, s.pos, s.kmer FROM tvf_docs d, LATERAL btl_kmers(d.text, 3) s"
    ).collect()
    # pure-Catalyst path: posexplode over a sequence of substrings
    want = (
        docs.where(F.length("text") >= 3)
        .select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - 2),
                    lambda i: F.substring(F.col("text"), i, 3),
                )
            ).alias("pos", "kmer"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    ids = {r.id for r in got}
    assert ids == {0, 4, 5}  # short/empty/NULL rows expand to nothing


@pytest.mark.spark
def test_shingles_tvf_matches_textstats_grams(spark, docs):
    from btl_bloomfilter_spark.functions.textstats import _grams, _words

    got = spark.sql(
        "SELECT d.id, s.pos, s.shingle FROM tvf_docs d, LATERAL btl_shingles(d.text, 2) s"
    ).collect()
    want = docs.select(
        "id", F.posexplode(_grams(_words("text"), 2)).alias("pos", "shingle")
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    by = {}
    for r in got:
        by.setdefault(r.id, []).append(r.shingle)
    # \x0B and \t are boundaries, runs collapse
    assert by[4] == ["a b", "b c", "c d", "d e"]
    assert by[5] == ["x y", "y z"]


@pytest.mark.spark
def test_tvf_cross_engine_rowsets(spark, docs):
    import duckdb
    import pandas as pd

    from btl_bloomfilter_spark.functions.tvf import kmers_tvf_sql, shingles_tvf_sql

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": [r[0] for r in ROWS], "text": [r[1] for r in ROWS]}))
    got = spark.sql(
        "SELECT d.id, s.pos, s.kmer AS x FROM tvf_docs d, LATERAL btl_kmers(d.text, 4) s"
    ).collect()
    want = con.sql(
        f"SELECT id, pos, kmer AS x FROM {kmers_tvf_sql('t', 'text', 4)}"
    ).fetchall()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    got = spark.sql(
        "SELECT d.id, s.pos, s.shingle AS x FROM tvf_docs d, LATERAL btl_shingles(d.text, 1) s"
    ).collect()
    want = con.sql(
        f"SELECT id, pos, shingle AS x FROM {shingles_tvf_sql('t', 'text', 1)}"
    ).fetchall()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


@pytest.mark.spark
def test_register_idempotent_and_reference_flavor(spark, docs):
    # re-registering must not raise (board queries call it per run)
    register_tvfs(spark)
    n = spark.sql(
        "SELECT count(*) AS n FROM tvf_docs d, LATERAL btl_kmers(d.text, 1) s"
    ).collect()[0].n
    total_chars = sum(len(t or "") for _, t in ROWS)
    assert n == total_chars  # 1-mers enumerate every character once

"""corpus_diff: planted add/remove/change, duplicate-key raise,
cross-engine parity."""
import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.snapshot import corpus_diff, corpus_diff_sql

SCHEMA = "doc_id long, text string"


@pytest.mark.spark
def test_corpus_diff_planted(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], SCHEMA
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, ""), (5, "e")], SCHEMA
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new, "doc_id", "text").collect()}
    # 1 removed, 3 changed, 5 added; 2 unchanged (dropped);
    # 4: NULL and '' share the coalesced fingerprint -> unchanged
    assert got == {1: "removed", 3: "changed", 5: "added"}
    inc = corpus_diff(old, new, "doc_id", "text", include_unchanged=True)
    got2 = {r.doc_id: r.status for r in inc.collect()}
    assert got2[2] == "unchanged" and got2[4] == "unchanged" and len(got2) == 5


@pytest.mark.spark
def test_corpus_diff_duplicate_key_raises(spark):
    old = spark.createDataFrame([(1, "a"), (1, "b")], SCHEMA)
    new = spark.createDataFrame([(2, "c")], SCHEMA)
    with pytest.raises(Exception, match="duplicate"):
        corpus_diff(old, new, "doc_id", "text").collect()


@pytest.mark.spark
def test_corpus_diff_cross_engine(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(11)
    old = pd.DataFrame(
        {"doc_id": range(300), "text": [f"t{rng.randint(0, 50)}" for _ in range(300)]}
    )
    # new: drop 10%, mutate 10%, add 30 fresh keys
    new = old[old.doc_id % 10 != 0].copy()
    mut = new.doc_id % 10 == 1
    new.loc[mut, "text"] = new.loc[mut, "text"] + "!"
    new = pd.concat(
        [new, pd.DataFrame({"doc_id": range(1000, 1030), "text": ["fresh"] * 30})]
    )
    po, pn = str(tmp_path / "o.parquet"), str(tmp_path / "n.parquet")
    old.to_parquet(po), new.to_parquet(pn)
    got = (
        corpus_diff(spark.read.parquet(po), spark.read.parquet(pn), "doc_id", "text")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW o AS SELECT * FROM '{po}'")
    con.sql(f"CREATE VIEW n AS SELECT * FROM '{pn}'")
    want = (
        con.sql(corpus_diff_sql("o", "n", "doc_id", "text"))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == 30 + 30 + 30  # removed + added + changed (mod 10 == 1)
    for c in ("doc_id", "status", "old_fp", "new_fp"):
        assert got[c].fillna("").tolist() == want[c].fillna("").tolist(), c

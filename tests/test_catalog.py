"""Table-reference resolution: catalog identifiers vs parquet paths.

The catalog branch is exercised through Spark's built-in session
catalog (temp view) — the same spark.read.table code path an Iceberg
catalog serves on a cluster with the runtime jar configured."""

import os
import tempfile

import pytest

from btl_bloomfilter_spark.sources.catalog import load_table, save_table


def test_parquet_path_branch(spark, sf_dir):
    path = f"{sf_dir}/documents.parquet"
    assert load_table(spark, path).count() == spark.read.parquet(path).count()


def test_catalog_branch_via_view(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("catalog_docs_view")
    got = load_table(spark, "table:catalog_docs_view")
    assert got.count() == docs.count()
    assert got.columns == docs.columns


def test_bad_refs(spark):
    with pytest.raises(ValueError, match="empty table identifier"):
        load_table(spark, "table:")
    with pytest.raises(ValueError, match="snapshot id"):
        load_table(spark, "table:db.t@latest")
    with pytest.raises(ValueError, match="empty table identifier"):
        save_table(spark.range(1), "table:")


def test_save_table_parquet_branch(spark):
    df = spark.range(10)
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "t")
        save_table(df, out, mode="overwrite")
        assert load_table(spark, out).count() == 10


def test_jobs_accept_table_refs(spark, sf_dir, tmp_path):
    """clean_corpus end-to-end with a table: input reference."""
    import jobs.clean_corpus as cj

    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60).createOrReplaceTempView(
        "job_in_view"
    )
    out = str(tmp_path / "clean")
    cj.main(["--input", "table:job_in_view", "-o", out, "--no-stats"])
    assert spark.read.parquet(out).count() > 0

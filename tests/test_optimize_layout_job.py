"""End-to-end drive of jobs/optimize_layout.py: rewrite lineitem
z-ordered by (price cents, quantity), verify row preservation and that
the AFTER layout's per-file widths shrink on BOTH dimensions (the
before layout is a single input file, so the comparison baseline is a
1-file full-width box — the stronger check is after-vs-column-range)."""

import sys
from pathlib import Path

import pytest

JOBS = Path(__file__).resolve().parent.parent / "jobs"


@pytest.mark.spark
def test_optimize_layout_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    src = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .withColumn("price_cents", F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .withColumn("qty", F.col("l_quantity").cast("long"))
    )
    inp = str(tmp_path / "li.parquet")
    src.write.parquet(inp)
    n = src.count()

    sys.path.insert(0, str(JOBS))
    try:
        import optimize_layout
    finally:
        sys.path.pop(0)
    out, rep = tmp_path / "zordered", tmp_path / "report"
    optimize_layout.main(
        ["--input", inp, "-o", str(out),
         "--by", "price_cents:90000:10500000", "--by", "qty",  # qty bounds via stats pass
         "--bits", "16", "--files", "8", "--report", str(rep)]
    )

    zed = spark.read.parquet(str(out))
    assert zed.count() == n and set(zed.columns) == set(src.columns)

    report = spark.read.parquet(str(rep))
    after = report.where(F.col("layout") == "after")
    assert after.count() == 8
    # every z-ordered file's bounding box is well below the full
    # column ranges on BOTH clustered dimensions
    full_price = src.agg((F.max("price_cents") - F.min("price_cents"))).collect()[0][0]
    stats = after.agg(
        F.avg("width_price_cents").alias("wp"), F.avg("width_qty").alias("wq")
    ).collect()[0]
    assert stats["wp"] < 0.7 * full_price, (stats["wp"], full_price)
    assert stats["wq"] < 0.7 * 49, stats["wq"]

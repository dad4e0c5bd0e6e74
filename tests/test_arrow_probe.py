"""Zero-copy Arrow probe must equal the pandas_udf probe exactly."""

import numpy as np
import pyarrow as pa
import pytest

from btl_bloomfilter_spark.operators.bloom import BloomFilter


CORPUS = ["hello world test", None, "", "ab", "héllo ✓"] + [f"doc {i} payload words" for i in range(200)]


@pytest.mark.parametrize("k", [0, 6])
def test_arrow_probe_equals_pandas(k):
    bf = BloomFilter(1 << 16, 3, k)
    bf.update(CORPUS[: len(CORPUS) // 2])
    arr = pa.array(CORPUS, pa.string())
    np.testing.assert_array_equal(bf.seen_fraction_arrow(arr), bf.seen_fraction(CORPUS))
    np.testing.assert_array_equal(bf.contains_arrow(arr), bf.contains_batch(CORPUS))


@pytest.mark.spark
def test_with_probe_columns(spark):
    from btl_bloomfilter_spark.functions.probe import bloom_seen_fraction, with_probe_columns
    from btl_bloomfilter_spark.plans.agg import build_sketch

    docs = [f"document {i} alpha beta gamma" for i in range(300)]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "id long, text string").repartition(4)
    bf = build_sketch(df, "text", lambda: BloomFilter(1 << 18, 4, 8))
    out = with_probe_columns(df, bf, "text", frac_col="frac", contains_col="hit").toPandas()
    assert set(out.columns) == {"id", "text", "frac", "hit"}
    assert (out.frac == 1.0).all() and out.hit.all()
    # agrees with the pandas_udf Column probe
    ref = df.select("id", bloom_seen_fraction(spark, bf, "text").alias("frac")).toPandas()
    merged = out.merge(ref, on="id", suffixes=("_a", "_p"))
    np.testing.assert_array_equal(merged.frac_a.to_numpy(), merged.frac_p.to_numpy())
    # negatives
    neg = spark.createDataFrame([(0, "zz qq xx yy ww vv")], "id long, text string")
    nout = with_probe_columns(neg, bf, "text", frac_col="frac").toPandas()
    assert nout.frac.iloc[0] < 0.5

"""Corpus-growth operators: Heaps-law vocabulary growth (exact,
cross-engine) and distinct-to-date via HLL prefix merges (bound- and
order-invariance-gated)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.growth import (
    distinct_to_date,
    vocabulary_growth,
    vocabulary_growth_sql,
)

PLANTED = [
    (0, "a b a"),   # bucket 0: 3 occurrences, new {a,b}
    (1, "b c"),     # bucket 0: 2 occurrences, new {c}
    (2, ""),        # bucket 1: empty doc still counts in n_docs
    (3, "a c d  d"),  # bucket 1: 4 occurrences, new {d}
    (4, None),      # bucket 2: NULL doc
    (5, "e"),       # bucket 2: 1 occurrence, new {e}
]
EXPECTED = [(0, 2, 5, 3, 5, 3), (1, 2, 4, 1, 9, 4), (2, 2, 1, 1, 10, 5)]


def _rows(df):
    return [tuple(int(x) for x in r) for r in df.orderBy("bucket").toPandas().itertuples(index=False)]


@pytest.mark.spark
def test_vocabulary_growth_planted_and_partition_invariant(spark):
    df = spark.createDataFrame(PLANTED, "doc_id long, text string")
    out = vocabulary_growth(df, "text", F.expr("doc_id div 2"))
    assert _rows(out) == EXPECTED
    # layout must not matter: same report from an unrelated partitioning
    out2 = vocabulary_growth(df.repartition(7, "text"), "text", F.expr("doc_id div 2"))
    assert _rows(out2) == EXPECTED


@pytest.mark.spark
def test_vocabulary_growth_cross_engine(spark, sf_dir):
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sp = vocabulary_growth(docs, "text", F.expr("doc_id div 50")).orderBy("bucket").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    dd = con.sql(
        "SELECT * FROM ("
        + vocabulary_growth_sql("documents", "text", "doc_id // 50")
        + ") ORDER BY bucket"
    ).df()
    assert len(sp) == len(dd) > 0
    for c in ("bucket", "n_docs", "bucket_tokens", "new_types", "cum_tokens", "cum_types"):
        assert [int(x) for x in sp[c]] == [int(x) for x in dd[c]], c
    # Heaps-law shape sanity: cumulative curves are nondecreasing and
    # vocabulary grows strictly slower than occurrences
    assert (np.diff(sp.cum_tokens) >= 0).all() and (np.diff(sp.cum_types) >= 0).all()
    assert sp.cum_types.iloc[-1] <= sp.cum_tokens.iloc[-1]


@pytest.mark.spark
def test_distinct_to_date_gates_and_truth(spark):
    from btl_bloomfilter_spark.sources.transcripts import transcripts_df

    t = transcripts_df(spark, 800, partitions=8)
    rep = distinct_to_date(t, "role", "conv_id", F.col("ts"), p=13).toPandas()
    assert len(rep) > 0
    assert rep.within_bound.all()
    assert rep.order_invariant.all()
    truth = (
        t.groupBy("role")
        .agg(F.countDistinct("conv_id").alias("n"))
        .toPandas()
        .set_index("role")
        .n
    )
    for g, sub in rep.groupby("role"):
        sub = sub.sort_values("day")
        # exact cumulative counts are nondecreasing and end at the
        # per-role total (a conv straddling midnight counts once, on
        # its first day)
        assert (np.diff(sub.exact_cum) >= 0).all()
        assert sub.exact_cum.iloc[-1] == truth[g]


@pytest.mark.spark
def test_distinct_to_date_single_day_equals_per_key(spark):
    """Degenerate one-day corpus: to-date == plain per-key distinct."""
    rows = [(f"r{i % 2}", f"c{i % 17}", "2026-01-05 10:00:00") for i in range(200)]
    df = spark.createDataFrame(rows, "role string, conv_id string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    rep = distinct_to_date(df, "role", "conv_id", F.col("ts"), p=13).toPandas()
    assert len(rep) == 2
    # 17 is odd, so over i in [0, 200) each conv index pairs with both
    # parities — every role sees all 17 conversations
    assert (rep.exact_cum == 17).all()
    assert rep.within_bound.all() and rep.order_invariant.all()


@pytest.mark.spark
def test_windowed_heavy_hitters_exact_and_bounds(spark):
    """Planted item stream where windowed truth is hand-computable and
    a width so generous the CMS is exact — cms_est must EQUAL exact."""
    from btl_bloomfilter_spark.operators.growth import windowed_heavy_hitters

    rows = []
    # day 1: 5×a 2×b ; day 2: 3×b ; day 4: 1×a (window 2 forgets day 2 by day 4)
    rows += [("a", "2026-03-01")] * 5 + [("b", "2026-03-01")] * 2
    rows += [("b", "2026-03-02")] * 3
    rows += [("a", "2026-03-04")] * 1
    df = spark.createDataFrame(rows, "item string, d string").withColumn(
        "d", F.col("d").cast("timestamp")
    )
    rep = (
        windowed_heavy_hitters(df, "item", F.col("d"), window=2, eps=0.001, topk=3)
        .toPandas()
        .sort_values(["day", "rank"])
    )
    assert rep.no_undercount.all() and rep.within_eps.all()
    got = [
        (str(r.day), r.item, int(r.rank), int(r.exact), float(r.cms_est))
        for r in rep.itertuples()
    ]
    # window=2 truths: d1 {a:5,b:2}; d2 {a:5,b:5} (tie → 'a' first);
    # d4 {a:1} (day 2 out of range)
    assert got == [
        ("2026-03-01", "a", 1, 5, 5.0),
        ("2026-03-01", "b", 2, 2, 2.0),
        ("2026-03-02", "a", 1, 5, 5.0),
        ("2026-03-02", "b", 2, 5, 5.0),
        ("2026-03-04", "a", 1, 1, 1.0),
    ]


@pytest.mark.spark
def test_windowed_heavy_hitters_transcript_tools(spark):
    from btl_bloomfilter_spark.operators.growth import windowed_heavy_hitters
    from btl_bloomfilter_spark.sources.transcripts import transcripts_df

    t = transcripts_df(spark, 600, partitions=8).where(F.col("role") == "tool")
    rep = windowed_heavy_hitters(t, "tool", F.col("ts"), window=7, topk=5).toPandas()
    assert len(rep) > 0
    assert rep.no_undercount.all() and rep.within_eps.all()
    # ranks are 1..k per day and exact counts are nonincreasing in rank
    for _, sub in rep.groupby("day"):
        sub = sub.sort_values("rank")
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))
        assert (sub.exact.diff().dropna() <= 0).all()


@pytest.mark.spark
def test_quantile_histogram_uniform_and_laws(spark):
    from btl_bloomfilter_spark.operators.growth import quantile_histogram

    df = spark.range(0, 10000).select((F.col("id").cast("double")).alias("x"))
    rep = quantile_histogram(df, "x", buckets=10, k=400).toPandas().sort_values("bucket")
    assert len(rep) == 10
    assert rep.n.sum() == 10000
    assert abs(rep.fill_frac.sum() - 1.0) < 5e-7 * len(rep) + 1e-9  # per-bucket round-6 quantum
    assert rep.within_tol.all()
    # edges are monotone and cover the line
    assert rep.lo.iloc[0] == float("-inf") and rep.hi.iloc[-1] == float("inf")
    assert (rep.hi.iloc[:-1].values == rep.lo.iloc[1:].values).all()
    # uniform data: every decile within the rank-error budget of 10%
    assert (abs(rep.fill_frac - 0.1) <= 3 * 1.75 / 400 + 1e-9).all()


@pytest.mark.spark
def test_quantile_histogram_null_and_skew(spark):
    from btl_bloomfilter_spark.operators.growth import quantile_histogram

    # heavy-tailed + NULLs: NULLs belong to no bucket, totals exclude them
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.pow(F.col("id").cast("double"), 2.0))
        .alias("x")
    )
    rep = quantile_histogram(df, "x", buckets=5, k=400, tolerance_mult=5.0).toPandas()
    assert rep.n.sum() == 4500
    assert abs(rep.fill_frac.sum() - 1.0) < 5e-7 * len(rep) + 1e-9  # per-bucket round-6 quantum
    assert rep.within_tol.all()

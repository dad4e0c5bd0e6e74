"""URL host/domain extraction + deterministic per-domain caps.

Cross-engine: host, domain, and the full cap assignment must agree
with the DuckDB twins value-for-value (the md5 priority is the shared
primitive).  Laws: per-domain keep counts, repartition stability,
WindowGroupLimit in the filtered plan.
"""
import pandas as pd
import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.functions import urls as U

CASES = [
    ("https://www.example.com/p/1", "www.example.com", "example.com"),
    ("http://Sub.Example.CO.UK:8080/x?q=1", "sub.example.co.uk", "example.co.uk"),
    ("https://user:pw@api.example.org/v1", "api.example.org", "example.org"),
    ("ftp://192.168.0.1/pub", "192.168.0.1", "192.168.0.1"),
    ("https://localhost:9000/", "localhost", "localhost"),
    ("http://a.b.c.deep.example.net/x#f", "a.b.c.deep.example.net", "example.net"),
    ("https://example.ac.jp/x", "example.ac.jp", "example.ac.jp"),
    ("https://ac.jp/x", "ac.jp", "ac.jp"),  # 2 labels: never take 3
    ("not a url at all", None, None),
    ("www.example.com/no-scheme", None, None),
    ("", None, None),
    (None, None, None),
]


@pytest.mark.spark
def test_host_and_domain_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "i long, url string"
    )
    got = (
        df.select("i", U.url_host("url").alias("h"),
                  U.registrable_domain(U.url_host("url")).alias("d"))
        .orderBy("i").collect()
    )
    for r, (u, h, d) in zip(got, CASES):
        assert r.h == h, (u, r.h, h)
        assert r.d == d, (u, r.d, d)


@pytest.mark.spark
def test_urls_cross_engine(spark, tmp_path):
    import duckdb

    rows = [(i, u) for i, (u, _, _) in enumerate(CASES) if u is not None]
    rows += [(100 + i, f"https://shard{i % 5}.example.com/d/{i}") for i in range(40)]
    pdf = pd.DataFrame(rows, columns=["i", "url"])
    path = str(tmp_path / "u.parquet")
    pdf.to_parquet(path)

    sdf = spark.read.parquet(path).select(
        "i", "url", U.url_host("url").alias("host")
    ).select("i", "url", "host", U.registrable_domain("host").alias("domain"))
    capped = U.domain_cap(sdf, "domain", ["i"], 4, seed=11)
    got = capped.toPandas().sort_values("i").reset_index(drop=True)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW u AS SELECT * FROM '{path}'")
    want = con.sql(
        f"WITH h AS (SELECT i, url, {U.url_host_sql('url')} AS host FROM u), "
        f"d AS (SELECT i, url, host, {U.registrable_domain_sql('host')} AS domain FROM h) "
        f"SELECT i, url, host, domain, "
        f"{U.cap_rank_sql('domain', ['i'], seed=11)} AS cap_rank, "
        f"cap_rank <= 4 AS kept FROM d ORDER BY i"
    ).df().reset_index(drop=True)
    for c in ("host", "domain"):
        assert got[c].where(got[c].notna(), None).tolist() == \
            want[c].where(want[c].notna(), None).tolist(), c
    assert got.cap_rank.tolist() == want.cap_rank.tolist()
    assert got.kept.tolist() == want.kept.tolist()


@pytest.mark.spark
def test_domain_cap_laws(spark):
    rows = [(i, f"dom{i % 3}.com") for i in range(60)] + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "i long, domain string")
    out = U.domain_cap(df, "domain", ["i"], 5, seed=3).toPandas()
    per = out[out.kept].groupby(out.domain.fillna("__null")).size()
    assert (per <= 5).all() and (per[per.index != "__null"] == 5).all()
    # NULL domains cap together as one group (documented)
    assert out[out.domain.isna()].kept.sum() == 2  # 2 rows < cap
    # repartition stability: identical assignment
    out2 = U.domain_cap(df.repartition(13), "domain", ["i"], 5, seed=3).toPandas()
    a = out.sort_values("i")[["i", "cap_rank", "kept"]].reset_index(drop=True)
    b = out2.sort_values("i")[["i", "cap_rank", "kept"]].reset_index(drop=True)
    assert a.equals(b)
    # filtered form returns exactly the kept rows
    kept = U.domain_cap_filter(df, "domain", ["i"], 5, seed=3)
    assert {r.i for r in kept.collect()} == set(out[out.kept].i)


@pytest.mark.spark
def test_domain_cap_filter_plan_group_limit(spark):
    df = spark.createDataFrame([(i, f"d{i % 2}.com") for i in range(50)], "i long, domain string")
    out = U.domain_cap_filter(df, "domain", ["i"], 3)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_domain_cap_invalid_args():
    class _Fake:
        pass

    with pytest.raises(ValueError):
        U.domain_cap(_Fake(), "d", ["i"], 0)
    with pytest.raises(ValueError):
        U.domain_cap(_Fake(), "d", [], 3)

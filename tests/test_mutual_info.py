"""Grouped mutual information (operators/stats.grouped_mutual_info):
brute fixed-point parity, identical-columns MI == H exactly,
independent product table MI == 0, entropy-decomposition consistency
with grouped_entropy, NULL drops, partition invariance, DuckDB twin."""

import collections
import math
import random

from btl_bloomfilter_spark.operators.stats import (
    grouped_entropy,
    grouped_mutual_info,
    grouped_mutual_info_sql,
)


def _lnm(x):
    return int(math.floor(math.log(x) * 1e6 + 0.5))


def _h(counts):
    n = sum(counts)
    return _lnm(n) - sum(c * _lnm(c) for c in counts) // n


def _brute(pairs):
    """pairs: (a, b) with no NULLs.  Mirrors the engines exactly."""
    cab = collections.Counter(pairs)
    ca = collections.Counter(a for a, _ in pairs)
    cb = collections.Counter(b for _, b in pairs)
    n = len(pairs)
    ha, hb, hab = _h(ca.values()), _h(cb.values()), _h(cab.values())
    mi = max(ha + hb - hab, 0)
    return (
        n, len(ca), len(cb), len(cab), ha, hb, hab, mi, mi / 1e6,
        mi / float(ha) if ha > 0 else None,
        mi / float(hb) if hb > 0 else None,
    )


def _row(r):
    return (
        r["n"], r["k_a"], r["k_b"], r["k_ab"], r["h_a"], r["h_b"], r["h_ab"],
        r["mi_micro_nats"], r["mi"], r["u_a"], r["u_b"],
    )


def test_matches_brute(spark):
    rng = random.Random(6)
    rows = []
    for g in range(4):
        for _ in range(rng.randint(40, 160)):
            a = rng.choice("abcd")
            b = a.upper() if rng.random() < 0.15 * g else rng.choice("ABC")
            rows.append((g, a, b))
    df = spark.createDataFrame(rows, "g int, a string, b string")
    got = {r["g"]: _row(r) for r in grouped_mutual_info(df, ["g"], "a", "b").collect()}
    for g in range(4):
        pairs = [(a, b) for gg, a, b in rows if gg == g]
        assert got[g] == _brute(pairs), g
        # quantized MI within 5e-6 nats of the float truth
        cab = collections.Counter(pairs)
        ca = collections.Counter(a for a, _ in pairs)
        cb = collections.Counter(b for _, b in pairs)
        n = len(pairs)
        truth = sum(
            v / n * math.log(v * n / (ca[a] * cb[b])) for (a, b), v in cab.items()
        )
        assert abs(got[g][8] - truth) < 5e-6


def test_identical_columns_mi_equals_h(spark):
    # B == A: H(A,B) == H(A) == H(B) cell-for-cell, so the exact
    # integers satisfy MI == H_a identically and u_a == u_b == 1.0
    rows = [(0, c, c) for c in "aabbbbcc"]
    df = spark.createDataFrame(rows, "g int, a string, b string")
    r = grouped_mutual_info(df, ["g"], "a", "b").collect()[0]
    assert r["mi_micro_nats"] == r["h_a"] == r["h_b"] == r["h_ab"]
    assert r["u_a"] == 1.0 and r["u_b"] == 1.0


def test_independent_product_table(spark):
    # o(a,b) = ra*cb/N exactly: every marginal/joint count composes
    # multiplicatively... quantized MI lands within 3 micro-nats of 0
    # (clamped at 0); also single-category axis -> MI exactly 0
    rows = []
    for a, na in (("x", 2), ("y", 3)):
        for b, nb in (("u", 4), ("v", 1)):
            rows += [(0, a, b)] * (na * nb)
    df = spark.createDataFrame(rows, "g int, a string, b string")
    r = grouped_mutual_info(df, ["g"], "a", "b").collect()[0]
    assert r["mi_micro_nats"] <= 3
    one = spark.createDataFrame([(0, "k", c) for c in "abcb"], "g int, a string, b string")
    r1 = grouped_mutual_info(one, ["g"], "a", "b").collect()[0]
    assert r1["mi_micro_nats"] == 0 and r1["h_a"] == 0 and r1["u_a"] is None


def test_entropy_decomposition_consistency(spark):
    # h_a / h_b agree with grouped_entropy run on each column alone
    rng = random.Random(8)
    rows = [(0, rng.choice("pqr"), rng.choice("XYZW")) for _ in range(250)]
    df = spark.createDataFrame(rows, "g int, a string, b string")
    r = grouped_mutual_info(df, ["g"], "a", "b").collect()[0]
    ea = grouped_entropy(df, ["g"], "a").collect()[0]
    eb = grouped_entropy(df, ["g"], "b").collect()[0]
    assert r["h_a"] == ea["entropy_micro_nats"] and r["k_a"] == ea["k"]
    assert r["h_b"] == eb["entropy_micro_nats"] and r["k_b"] == eb["k"]


def test_nulls_and_partition_invariance(spark):
    rng = random.Random(12)
    rows = [(0, rng.choice("ab"), rng.choice("CD")) for _ in range(300)]
    df = spark.createDataFrame(
        rows + [(0, None, "C"), (0, "a", None)], "g int, a string, b string"
    )
    one = grouped_mutual_info(df, ["g"], "a", "b").collect()[0]
    assert one["n"] == 300  # NULL rows dropped
    two = grouped_mutual_info(df.repartition(11, "b"), ["g"], "a", "b").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(21)
    rows = []
    for g in range(5):
        for _ in range(rng.randint(50, 180)):
            a = rng.choice("abcde")
            b = a.upper() if rng.random() < 0.1 + 0.12 * g else rng.choice("ABCD")
            rows.append((g, a, b))
    pdf = pd.DataFrame(rows, columns=["g", "a", "b"])
    p = str(tmp_path / "mi.parquet")
    pdf.to_parquet(p)
    got = (
        grouped_mutual_info(spark.read.parquet(p), ["g"], "a", "b")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(grouped_mutual_info_sql("__t", "g", "a", "b") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_null_group_key(spark):
    # review catch: a NULL group key must survive the marginal joins
    # (plain equi-joins dropped the group), matching chi2/entropy
    rows = [(None, "a", "X"), (None, "a", "Y"), (None, "b", "X"), (0, "a", "X")]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = {r["g"]: r for r in grouped_mutual_info(df, ["g"], "a", "b").collect()}
    assert set(got) == {None, "0"} or set(got) == {None, 0}
    assert got[None]["n"] == 3 and got[None]["k_ab"] == 3
    # engine parity on the NULL group
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["g", "a", "b"])
    con = duckdb.connect()
    con.register("__t", pdf)
    want = con.sql(
        grouped_mutual_info_sql("__t", "g", "a", "b") + " ORDER BY g NULLS FIRST"
    ).df()
    from pyspark.sql import functions as SF

    gotdf = (
        grouped_mutual_info(spark.createDataFrame(pdf), ["g"], "a", "b")
        .orderBy(SF.col("g").asc_nulls_first())
        .toPandas()
    )
    pd.testing.assert_frame_equal(gotdf, want, check_dtype=False)

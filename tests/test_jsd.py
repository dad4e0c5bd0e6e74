"""Grouped Jensen–Shannon divergence (operators/drift.grouped_jsd):
brute fixed-point parity, float-truth closeness, identical-cohorts
~0 / disjoint-supports ln 2 endpoint laws, empty-cohort exclusion,
entropy cross-operator pin, partition invariance, DuckDB twin."""

import math
import random

from btl_bloomfilter_spark.operators.drift import grouped_jsd, grouped_jsd_sql

M = 1_000_000


def _lnm(x):
    return math.floor(math.log(x) * M + 0.5)


def _brute(pairs):
    """pairs: [(cat, cohort_bool)] -> operator outputs, quantization
    replicated."""
    from collections import Counter

    ca = Counter(c for c, coh in pairs if coh)
    cb = Counter(c for c, coh in pairs if not coh)
    cats = sorted(set(ca) | set(cb), key=str)
    A, B = sum(ca.values()), sum(cb.values())
    if A == 0 or B == 0:
        return None
    sa = sum(a * _lnm(a) for a in ca.values() if a > 0)
    sb = sum(b * _lnm(b) for b in cb.values() if b > 0)
    sw = 0
    for c in cats:
        w = ca[c] * B + cb[c] * A
        if w > 0:
            sw += w * _lnm(w)
    ha = _lnm(A) - sa // A
    hb = _lnm(B) - sb // B
    hm = _lnm(2 * A * B) - sw // (2 * A * B)
    j2 = max(2 * hm - ha - hb, 0)
    return {
        "n_a": A, "n_b": B, "k": len(cats), "h_a": ha, "h_b": hb,
        "h_m": hm, "jsd2_micro": j2, "jsd": float(j2) / 2000000.0,
        "jsd_norm": float(j2) / 1386294.0,
    }


def _float_jsd(pairs):
    from collections import Counter

    ca = Counter(c for c, coh in pairs if coh)
    cb = Counter(c for c, coh in pairs if not coh)
    A, B = sum(ca.values()), sum(cb.values())
    cats = set(ca) | set(cb)
    h = lambda ps: -sum(p * math.log(p) for p in ps if p > 0)  # noqa: E731
    hp = h([ca[c] / A for c in cats])
    hq = h([cb[c] / B for c in cats])
    hm = h([(ca[c] / A + cb[c] / B) / 2 for c in cats])
    return hm - (hp + hq) / 2


def test_matches_brute_and_float(spark):
    rng = random.Random(79)
    rows = []
    for g in range(3):
        for _ in range(rng.randint(80, 200)):
            coh = rng.random() < 0.5
            cat = rng.choice("abcdef" if coh else "cdefgh")
            rows.append((g, cat, coh))
    df = spark.createDataFrame(rows, "g int, cat string, coh boolean")
    got = {r["g"]: r.asDict() for r in grouped_jsd(df, ["g"], "cat", "coh").collect()}
    for g in range(3):
        sub = [(c, coh) for gg, c, coh in rows if gg == g]
        want = _brute(sub)
        assert {k: got[g][k] for k in want} == want, g
        assert abs(got[g]["jsd"] - _float_jsd(sub)) < 5e-6, g


def test_identity_and_disjoint_endpoints(spark):
    # identical distributions: jsd2 within quantization slop of 0
    rows = [(0, c, coh) for coh in (True, False) for c in "aabbbcccc"]
    df = spark.createDataFrame(rows, "g int, cat string, coh boolean")
    r = grouped_jsd(df, ["g"], "cat", "coh").collect()[0]
    assert r["jsd2_micro"] <= 10
    # disjoint supports: jsd == ln 2 -> jsd_norm within slop of 1
    rows2 = [(0, f"p{i % 3}", True) for i in range(30)] + [
        (0, f"q{i % 4}", False) for i in range(40)
    ]
    df2 = spark.createDataFrame(rows2, "g int, cat string, coh boolean")
    r2 = grouped_jsd(df2, ["g"], "cat", "coh").collect()[0]
    assert abs(r2["jsd2_micro"] - 2 * 693147) <= 10
    assert abs(r2["jsd_norm"] - 1.0) < 1e-5


def test_entropy_pin_and_empty_cohort_excluded(spark):
    # h_a equals grouped_entropy's micro-nat integer on cohort 1 alone
    from btl_bloomfilter_spark.operators.stats import grouped_entropy

    rng = random.Random(83)
    rows = [(0, rng.choice("abcd"), rng.random() < 0.6) for _ in range(300)]
    df = spark.createDataFrame(rows, "g int, cat string, coh boolean")
    r = grouped_jsd(df, ["g"], "cat", "coh").collect()[0]
    ent = grouped_entropy(
        df.where("coh"), ["g"], "cat"
    ).collect()[0]
    assert r["h_a"] == ent["entropy_micro_nats"]
    # empty cohort: group vanishes
    only_a = spark.createDataFrame(
        [(1, "x", True), (1, "y", True)], "g int, cat string, coh boolean"
    )
    assert grouped_jsd(only_a, ["g"], "cat", "coh").collect() == []


def test_symmetry(spark):
    rng = random.Random(89)
    rows = [(0, rng.choice("abcde"), rng.random() < 0.3) for _ in range(400)]
    df = spark.createDataFrame(rows, "g int, cat string, coh boolean")
    import pyspark.sql.functions as SF

    a = grouped_jsd(df, ["g"], "cat", "coh").collect()[0]
    b = grouped_jsd(df, ["g"], "cat", ~SF.col("coh")).collect()[0]
    assert a["jsd2_micro"] == b["jsd2_micro"]
    assert (a["h_a"], a["h_b"]) == (b["h_b"], b["h_a"])


def test_partition_invariance(spark):
    rng = random.Random(97)
    rows = [(0, rng.choice("abcdefg"), rng.random() < 0.5) for _ in range(500)]
    df = spark.createDataFrame(rows, "g int, cat string, coh boolean")
    one = grouped_jsd(df, ["g"], "cat", "coh").collect()[0]
    two = grouped_jsd(df.repartition(15, "cat"), ["g"], "cat", "coh").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(101)
    rows = [
        (rng.randint(0, 3), rng.choice("abcdefgh"), rng.random() < 0.45)
        for _ in range(3000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "cat", "coh"])
    p = str(tmp_path / "jsd.parquet")
    pdf.to_parquet(p)
    got = (
        grouped_jsd(spark.read.parquet(p), ["g"], "cat", "coh")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(grouped_jsd_sql("__t", "g", "cat", "coh") + " ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

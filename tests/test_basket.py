"""Association rules (operators/basket.basket_rules): brute parity
including all three doubles, within-basket multiplicity dedup,
min_support pruning, lift laws (independent product table lift == 1.0
exactly; perfect co-occurrence lift == N/c), NULL drops, facts= reuse,
block-size invariance (the chunked expansion), DuckDB twin, contracts."""

import collections
import itertools
import random

import pytest

from btl_bloomfilter_spark.operators.basket import basket_rules, basket_rules_sql


def _brute(facts, min_support):
    """facts: set of (basket, item).  Mirrors the engines exactly."""
    baskets = collections.defaultdict(set)
    for bk, it in facts:
        baskets[bk].add(it)
    n = len(baskets)
    c = collections.Counter(it for _, it in facts)
    cxy = collections.Counter()
    for items in baskets.values():
        for a, b in itertools.combinations(sorted(items), 2):
            cxy[(a, b)] += 1
    out = {}
    for (a, b), v in cxy.items():
        if v < min_support:
            continue
        for ant, con in ((a, b), (b, a)):
            out[(ant, con)] = (
                v, c[ant], c[con], n,
                v / float(n), v / float(c[ant]),
                float(v * n) / float(c[ant] * c[con]),
            )
    return out


def _collect(df):
    return {
        (r["antecedent"], r["consequent"]): (
            r["n_pair"], r["n_antecedent"], r["n_consequent"], r["n_baskets"],
            r["support"], r["confidence"], r["lift"],
        )
        for r in df.collect()
    }


def test_matches_brute(spark):
    rng = random.Random(4)
    rows = []
    for bk in range(60):
        for it in rng.sample("abcdefgh", rng.randint(1, 5)):
            # duplicates within a basket must not count
            rows.append((bk, it))
            if rng.random() < 0.3:
                rows.append((bk, it))
    df = spark.createDataFrame(rows, "bk int, it string")
    got = _collect(basket_rules(df, "bk", "it", min_support=3))
    want = _brute(set(rows), 3)
    assert got == want


def test_lift_laws(spark):
    # independence by construction: every basket has both x and y
    rows = [(i, v) for i in range(10) for v in ("x", "y")]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = _collect(basket_rules(df, "bk", "it", min_support=1))
    assert out[("x", "y")][6] == 1.0  # cxy*N == cx*cy exactly
    assert out[("x", "y")][5] == 1.0  # confidence
    # y appears only alongside x, x in 10 of 20 baskets:
    # lift(x->y) = cxy*N/(cx*cy) = 5*20/(10*5) = 2.0 exactly
    rows2 = [(i, "x") for i in range(10)] + [(i, "y") for i in range(5)]
    rows2 += [(100 + i, "z") for i in range(10)]
    df2 = spark.createDataFrame(rows2, "bk int, it string")
    out2 = _collect(basket_rules(df2, "bk", "it", min_support=1))
    assert out2[("x", "y")][6] == 2.0
    assert out2[("y", "x")][5] == 1.0  # y -> x always


def test_min_support_and_nulls(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
            (None, "a"), (4, None)]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = _collect(basket_rules(df, "bk", "it", min_support=2))
    assert set(out) == {("a", "b"), ("b", "a")}
    # NULL basket/item rows contribute to nothing: N counts baskets 1..3
    # (basket 4's only item is NULL -> basket never materializes)
    assert out[("a", "b")][3] == 3


def test_facts_reuse_and_block_invariance(spark):
    rng = random.Random(9)
    rows = [(rng.randint(0, 30), rng.choice("pqrstu")) for _ in range(400)]
    df = spark.createDataFrame(rows, "bk int, it string")
    base = _collect(basket_rules(df, "bk", "it", min_support=2))
    pre = df.select("bk", "it").distinct()
    assert _collect(basket_rules(df, "bk", "it", min_support=2, facts=pre)) == base
    assert _collect(basket_rules(df, "bk", "it", min_support=2, block=2)) == base


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(17)
    rows = [
        (rng.randint(0, 80), "i%d" % rng.randint(0, 11)) for _ in range(900)
    ]
    pdf = pd.DataFrame(rows, columns=["bk", "it"])
    p = str(tmp_path / "basket.parquet")
    pdf.to_parquet(p)
    got = (
        basket_rules(spark.read.parquet(p), "bk", "it", min_support=3)
        .orderBy("antecedent", "consequent")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        basket_rules_sql("__t", "bk", "it", min_support=3)
        + " ORDER BY antecedent, consequent"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_contract_errors(spark):
    df = spark.createDataFrame([(1, "a")], "bk int, it string")
    with pytest.raises(ValueError):
        basket_rules(df, "bk", "it", min_support=0)
    with pytest.raises(ValueError):
        basket_rules_sql("t", "bk", "it", min_support=0)


def test_broadcast_margins_off_equal(spark):
    # review catch: high-cardinality escape hatch — shuffle-join path
    # must produce identical rules
    rng = random.Random(41)
    rows = [(rng.randint(0, 25), rng.choice("lmnop")) for _ in range(300)]
    df = spark.createDataFrame(rows, "bk int, it string")
    a = _collect(basket_rules(df, "bk", "it", min_support=2))
    b = _collect(
        basket_rules(df, "bk", "it", min_support=2, broadcast_margins=False)
    )
    assert a == b

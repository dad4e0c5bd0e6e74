"""Fleiss' kappa (operators/stats.fleiss_kappa): Fraction-exact
brute parity, perfect/random agreement endpoints, unequal-panel
exclusion, degenerate single-category exclusion, DuckDB twin."""

import random
from fractions import Fraction

import pytest

from btl_bloomfilter_spark.operators.stats import fleiss_kappa, fleiss_kappa_sql


def _brute(ratings, n):
    """ratings: list of (item, cat).  Returns (N, excluded, kappa)
    with kappa as the engines' one-division double, or None."""
    by_item = {}
    for it, c in ratings:
        by_item.setdefault(it, []).append(c)
    kept = {it: cs for it, cs in by_item.items() if len(cs) == n}
    ex = len(by_item) - len(kept)
    N = len(kept)
    if N == 0:
        return None
    s1 = 0
    cat_tot = {}
    for cs in kept.values():
        cnt = {}
        for c in cs:
            cnt[c] = cnt.get(c, 0) + 1
            cat_tot[c] = cat_tot.get(c, 0) + 1
        s1 += sum(v * v for v in cnt.values()) - n
    s2 = sum(v * v for v in cat_tot.values())
    m = N * n
    if m * m == s2:
        return None
    num = s1 * m * m - s2 * m * (n - 1)
    den = m * (n - 1) * (m * m - s2)
    return N, ex, float(num) / float(den)


def test_matches_brute_and_endpoints(spark):
    rng = random.Random(168)
    rows, truth = [], {}
    # perfect: all raters agree -> kappa == 1 exactly
    perfect = [(i, i % 4) for i in range(50) for _ in range(3)]
    # noisy: 70% majority class, 30% random
    noisy = []
    for i in range(200):
        for r in range(3):
            c = i % 4 if rng.random() < 0.7 else rng.randrange(4)
            noisy.append((i, c))
    # random: no structure at all -> kappa near 0
    rnd = [(i, rng.randrange(4)) for i in range(200) for _ in range(3)]
    # unequal: some items have 2 or 4 ratings -> excluded
    unequal = [(i, i % 3) for i in range(30) for _ in range(3)]
    unequal += [(100, 0), (100, 1)] + [(101, 2)] * 4
    for g, data in (("perfect", perfect), ("noisy", noisy),
                    ("rand", rnd), ("unequal", unequal)):
        rows += [(g, it, c) for it, c in data]
        truth[g] = _brute(data, 3)
    # degenerate: every rating one category -> row kept, kappa NULL
    rows += [("onecat", i, 0) for i in range(20) for _ in range(3)]
    # every panel mismatched -> row kept with the exclusion count
    # visible and kappa NULL (review finding: no silent vanishing)
    rows += [("allbad", i, i % 2) for i in range(10) for _ in range(2)]
    df = spark.createDataFrame(rows, "g string, item long, cat long")
    got = {r.g: r for r in fleiss_kappa(df, ["g"], "item", "cat", n_raters=3).collect()}
    assert got["onecat"].kappa is None and got["onecat"].n_items == 20
    assert got["allbad"].kappa is None
    assert (got["allbad"].n_items, got["allbad"].excluded_items) == (0, 10)
    for g in ("perfect", "noisy", "rand", "unequal"):
        N, ex, kappa = truth[g]
        r = got[g]
        assert (r.n_items, r.excluded_items) == (N, ex)
        assert r.kappa == kappa
    assert got["perfect"].kappa == 1.0
    assert got["noisy"].kappa > 0.3
    assert abs(got["rand"].kappa) < 0.05
    assert got["unequal"].excluded_items == 2
    with pytest.raises(ValueError):
        fleiss_kappa(df, ["g"], "item", "cat", n_raters=1)
    with pytest.raises(ValueError):
        fleiss_kappa_sql("t", "g", "item", "cat", n_raters=0)


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(3)
    rows = []
    for g in range(4):
        for i in range(100):
            for r in range(4):
                c = i % 5 if rng.random() < 0.5 + g * 0.1 else rng.randrange(5)
                rows.append((g, i, c))
    pdf = pd.DataFrame(rows, columns=["g", "item", "cat"])
    p = str(tmp_path / "fk.parquet")
    pdf.to_parquet(p)
    got = (
        fleiss_kappa(spark.read.parquet(p), ["g"], "item", "cat", n_raters=4)
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        fleiss_kappa_sql("t", "g", "item", "cat", n_raters=4) + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # agreement rises with the planted majority share
    ks = got.set_index("g")["kappa"]
    assert ks[3] > ks[0]

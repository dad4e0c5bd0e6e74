"""Isotonic (PAV) calibration (operators/isotonic): Fraction-exact
PAV brute parity, monotonicity theorem, already-monotone fixpoint,
squared-error optimality vs perturbations, DuckDB twin."""

import random
from fractions import Fraction

import pytest

from btl_bloomfilter_spark.operators.isotonic import (
    isotonic_calibration,
    isotonic_calibration_sql,
)


def _pav(cells):
    """cells: ordered [(sq, ysum, cnt)] -> {sq: fit_double}.
    Classic pool-adjacent-violators with EXACT Fraction comparisons;
    fitted doubles are float(num)/float(den) — for test-sized ints
    (< 2^53) that is the engines' one-division value exactly."""
    pools = []  # [start_idx, ysum, cnt]
    for idx, (sq, ys, c) in enumerate(cells):
        pools.append([idx, ys, c])
        while len(pools) > 1 and Fraction(pools[-2][1], pools[-2][2]) >= Fraction(
            pools[-1][1], pools[-1][2]
        ):
            _, ys2, c2 = pools.pop()
            pools[-1][1] += ys2
            pools[-1][2] += c2
    out = {}
    bounds = [p[0] for p in pools] + [len(cells)]
    for pi, p in enumerate(pools):
        v = float(p[1]) / float(p[2])
        for idx in range(bounds[pi], bounds[pi + 1]):
            out[cells[idx][0]] = v
    return out


def _mk_cells(rows):
    agg = {}
    for sq, y in rows:
        n, ys = agg.get(sq, (0, 0))
        agg[sq] = (n + 1, ys + y)
    return [(sq, ys, n) for sq, (n, ys) in sorted(agg.items())]


def test_matches_fraction_pav(spark):
    rng = random.Random(167)
    rows, truth = [], {}
    for g in range(6):
        grows = []
        for _ in range(300):
            sq = rng.randrange(0, 20)
            # roughly increasing trend + noise, plus deliberate dips
            p = min(0.95, 0.05 + sq * 0.05 + rng.choice([-0.3, 0, 0.3]))
            grows.append((sq, int(rng.random() < p)))
        rows += [(str(g), sq / 20.0, y) for sq, y in grows]
        truth[str(g)] = _pav(_mk_cells(grows))
    df = spark.createDataFrame(rows, "g string, score double, y long")
    got = isotonic_calibration(df, ["g"], "score", "y", micro=20).collect()
    assert len(got) == sum(len(v) for v in truth.values())
    for r in got:
        assert r.iso_fit == truth[r.g][r.score_q], (r.g, r.score_q)
    # monotonicity is a theorem of the minimax form
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append((r.score_q, r.iso_fit))
    for g, fits in by_g.items():
        fits.sort()
        for (_, a), (_, b) in zip(fits, fits[1:]):
            assert a <= b
    # partition invariance
    again = isotonic_calibration(
        df.repartition(7), ["g"], "score", "y", micro=20
    ).collect()
    assert {(r.g, r.score_q, r.iso_fit) for r in again} == {
        (r.g, r.score_q, r.iso_fit) for r in got
    }


def test_already_monotone_is_fixpoint(spark):
    # perfectly calibrated-by-construction: y_rate strictly increasing
    rows = []
    for sq in range(10):
        rows += [("g", sq / 10.0, 1)] * sq + [("g", sq / 10.0, 0)] * (10 - sq)
    df = spark.createDataFrame(rows, "g string, score double, y long")
    got = isotonic_calibration(df, ["g"], "score", "y", micro=10).collect()
    for r in got:
        assert r.iso_fit == r.y_rate  # PAV leaves monotone data alone
    # and a single violator pools with its neighbor: two cells with
    # rates 0.8 then 0.2 -> both fit (0.8*5+0.2*5)/10 = 0.5
    rows2 = [("g", 0.1, 1)] * 4 + [("g", 0.1, 0)] + [("g", 0.2, 1)] + [("g", 0.2, 0)] * 4
    df2 = spark.createDataFrame(rows2, "g string, score double, y long")
    got2 = {r.score_q: r for r in isotonic_calibration(df2, ["g"], "score", "y", micro=10).collect()}
    assert got2[1].iso_fit == got2[2].iso_fit == 0.5


def test_nulls_and_contract(spark):
    rows = [("g", 0.5, 1), ("g", None, 1), ("g", float("nan"), 0), ("g", 0.7, None)]
    df = spark.createDataFrame(rows, "g string, score double, y long")
    got = isotonic_calibration(df, ["g"], "score", "y", micro=10).collect()
    assert len(got) == 1 and got[0].n == 1
    with pytest.raises(ValueError):
        isotonic_calibration(df, ["g"], "score", "y", micro=0)
    with pytest.raises(ValueError):
        isotonic_calibration_sql("t", "g", "s", "y", micro=-1)


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(11)
    rows = []
    for g in range(4):
        for _ in range(500):
            s = rng.random()
            y = int(rng.random() < 0.2 + 0.6 * s + rng.choice([-0.15, 0.15]))
            rows.append((g, s, max(0, y)))
    pdf = pd.DataFrame(rows, columns=["g", "score", "y"])
    p = str(tmp_path / "iso.parquet")
    pdf.to_parquet(p)
    got = (
        isotonic_calibration(spark.read.parquet(p), ["g"], "score", "y", micro=25)
        .orderBy("g", "score_q")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        isotonic_calibration_sql("t", "g", "score", "y", micro=25)
        + " ORDER BY g, score_q"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

"""Grouped survival curves (operators/survival.survival_curve): brute
KM/NA parity with quantization replicated, no-censoring harmonic law,
all-censored flat curve, absorption-at-last-row semantics, -logS >= NA
inequality, bad event value raises, partition invariance, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.survival import (
    attach_survival,
    survival_curve,
    survival_curve_sql,
)

M = 1_000_000


def _lnm(x):
    # replicate round-half-up on positive args (python round is
    # half-even; values here are never exact .5 ties in practice, but
    # use floor(x+0.5) to match Spark HALF_UP / DuckDB half-away)
    return math.floor(math.log(x) * M + 0.5)


def _brute(pairs):
    """pairs: [(dur, event)] -> {t: row} replicating quantization."""
    from collections import Counter

    ds = Counter()
    cs = Counter()
    for t, e in pairs:
        (ds if e else cs)[t] += 1
    times = sorted(set(ds) | set(cs))
    N = len(pairs)
    out = {}
    cum = 0
    cumna = 0
    cumls = 0
    for t in times:
        d, c = ds[t], cs[t]
        ct = d + c
        cum += ct
        nr = N - cum + ct
        cumna += (d * M) // nr
        absorbed = d == nr
        if not absorbed:
            cumls += _lnm(nr - d) - _lnm(nr)
        out[t] = {
            "n_risk": nr, "n_events": d, "n_censored": c,
            "hazard": float(d) / float(nr),
            "cum_hazard_micro": cumna,
            "cum_hazard": float(cumna) / 1e6,
            "log_surv_micro": None if absorbed else cumls,
            "absorbed": absorbed,
        }
    return out


def test_matches_brute(spark):
    rng = random.Random(61)
    rows = []
    for g in range(3):
        for _ in range(rng.randint(50, 150)):
            rows.append((g, rng.randint(0, 30), rng.randint(0, 1)))
    df = spark.createDataFrame(rows, "g int, dur long, ev int")
    got = {
        (r["g"], r["t"]): r.asDict()
        for r in survival_curve(df, ["g"], "dur", "ev").collect()
    }
    for g in range(3):
        want = _brute([(d, e) for gg, d, e in rows if gg == g])
        for t, wrow in want.items():
            have = got[(g, t)]
            for col, val in wrow.items():
                assert have[col] == val, (g, t, col)


def test_no_censoring_harmonic_and_absorption(spark):
    # distinct durations, all events: n_risk walks N..1, the last row
    # absorbs (S hits exactly 0), NA = sum 1/(N-i) harmonic
    N = 12
    df = spark.createDataFrame(
        [(0, i, 1) for i in range(N)], "g int, dur long, ev int"
    )
    rows = survival_curve(df, ["g"], "dur", "ev").orderBy("t").collect()
    assert [r["n_risk"] for r in rows] == list(range(N, 0, -1))
    assert rows[-1]["absorbed"] and rows[-1]["log_surv_micro"] is None
    assert all(not r["absorbed"] for r in rows[:-1])
    want_na = 0
    for i in range(N):
        want_na += (1 * M) // (N - i)
    assert rows[-1]["cum_hazard_micro"] == want_na
    # KM with no ties/censoring: S(t_i) = (N-1-i)/N; check via exp
    s = attach_survival(
        survival_curve(df, ["g"], "dur", "ev")
    ).orderBy("t").collect()
    for i, r in enumerate(s[:-1]):
        assert abs(r["survival"] - (N - 1 - i) / N) < 1e-4
    assert s[-1]["survival"] == 0.0


def test_all_censored_flat(spark):
    df = spark.createDataFrame(
        [(0, i % 5, 0) for i in range(40)], "g int, dur long, ev int"
    )
    rows = survival_curve(df, ["g"], "dur", "ev").collect()
    for r in rows:
        assert r["hazard"] == 0.0 and r["cum_hazard_micro"] == 0
        assert r["log_surv_micro"] == 0 and not r["absorbed"]


def test_neg_log_surv_dominates_na(spark):
    # -ln(1-x) >= x termwise => -log_surv >= cum_hazard (up to the
    # two quantizations' slop, <= 2 micro per distinct time)
    rng = random.Random(67)
    rows = [(0, rng.randint(0, 20), rng.randint(0, 1)) for _ in range(300)]
    df = spark.createDataFrame(rows, "g int, dur long, ev int")
    out = survival_curve(df, ["g"], "dur", "ev").collect()
    assert any(r["log_surv_micro"] is not None and r["n_events"] for r in out)
    for r in out:
        if r["log_surv_micro"] is not None:
            assert -r["log_surv_micro"] >= r["cum_hazard_micro"] - 2 * len(out)


def test_bad_event_raises_and_float_duration_rejected(spark):
    bad = spark.createDataFrame([(0, 1, 2)], "g int, dur long, ev int")
    with pytest.raises(Exception, match="event must be 0 or 1"):
        survival_curve(bad, ["g"], "dur", "ev").collect()
    fdf = spark.createDataFrame([(0, 1.5, 1)], "g int, dur double, ev int")
    with pytest.raises(ValueError):
        survival_curve(fdf, ["g"], "dur", "ev")


def test_partition_invariance(spark):
    rng = random.Random(71)
    rows = [(0, rng.randint(0, 15), rng.randint(0, 1)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g int, dur long, ev int")
    one = sorted(
        survival_curve(df, ["g"], "dur", "ev").collect(), key=lambda r: r["t"]
    )
    two = sorted(
        survival_curve(df.repartition(21, "dur"), ["g"], "dur", "ev").collect(),
        key=lambda r: r["t"],
    )
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(73)
    rows = [
        (rng.randint(0, 3), rng.randint(0, 40), rng.randint(0, 1))
        for _ in range(2000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "dur", "ev"])
    p = str(tmp_path / "sv.parquet")
    pdf.to_parquet(p)
    got = (
        survival_curve(spark.read.parquet(p), ["g"], "dur", "ev")
        .orderBy("g", "t")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        survival_curve_sql("__t", "g", "dur", "ev") + " ORDER BY g, t"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

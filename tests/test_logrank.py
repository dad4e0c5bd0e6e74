"""Two-cohort log-rank test (operators/survival.logrank_test): brute
parity with the micro-unit quantization replicated, separation law
(short-lived cohort a => z > 0, large), single-cohort and all-censored
NULL degeneracies, censoring actually changes the risk sets (vs a
dropped-censored miscomputation), three-cohort in-plan raise in both
engines, float-duration rejection, partition invariance, DuckDB twin."""

import math
import random
from collections import Counter

import pytest

from btl_bloomfilter_spark.operators.survival import (
    logrank_test,
    logrank_test_sql,
)

M = 1_000_000


def _brute(pairs):
    """pairs: [(cohort, dur, event)] for ONE group — replicates the
    quantize-once micro arithmetic exactly (all div operands are
    nonnegative, so Python // == Spark div == DuckDB //)."""
    labels = sorted({c for c, _, _ in pairs})
    lo = labels[0]
    d1, ct1, dd, cta = Counter(), Counter(), Counter(), Counter()
    for c, t, e in pairs:
        dd[t] += e
        cta[t] += 1
        if c == lo:
            d1[t] += e
            ct1[t] += 1
    N, N1 = sum(cta.values()), sum(ct1.values())
    cum = cum1 = e1m = vm = 0
    for t in sorted(cta):
        cum += cta[t]
        cum1 += ct1[t]
        n = N - cum + cta[t]
        n1 = N1 - cum1 + ct1[t]
        d = dd[t]
        e1m += (d * n1 * M) // n
        if n > 1:
            vm += (d * (n - d) * n1 * (n - n1) * M) // (
                n * n * (n - 1)
            )
    o1 = sum(d1.values())
    num = o1 * M - e1m
    out = {
        "cohort_a": labels[0],
        "cohort_b": labels[-1],
        "n_a": N1,
        "n_b": N - N1,
        "events_a": o1,
        "events_b": sum(dd.values()) - o1,
        "e_a_micro": e1m,
        "e_a": e1m / 1e6,
        "o_minus_e": num / 1e6,
        "v_micro": vm,
    }
    if vm > 0:
        chi2 = float(num * num) / float(vm * M)
        out["chi2"] = chi2
        sign = 1.0 if num > 0 else (-1.0 if num < 0 else 0.0)
        out["z"] = sign * math.sqrt(chi2)
    else:
        out["chi2"] = None
        out["z"] = None
    return out


def _gen(rng, n, lam_a, lam_b, cens=0.3):
    rows = []
    for i in range(n):
        co = "a" if i % 2 == 0 else "b"
        lam = lam_a if co == "a" else lam_b
        dur = min(int(rng.expovariate(1.0 / lam)), 60)
        ev = 0 if rng.random() < cens else 1
        rows.append((co, dur, ev))
    return rows


def test_matches_brute(spark):
    rng = random.Random(431)
    rows = []
    per_group = {}
    for g in range(4):
        pairs = _gen(rng, rng.randint(60, 160), 8.0, 14.0)
        per_group[g] = pairs
        rows += [(g, c, t, e) for c, t, e in pairs]
    df = spark.createDataFrame(rows, "g int, co string, dur long, ev int")
    got = {
        r["g"]: r.asDict()
        for r in logrank_test(df, ["g"], "co", "dur", "ev").collect()
    }
    for g, pairs in per_group.items():
        want = _brute(pairs)
        for col, val in want.items():
            assert got[g][col] == val, (g, col, got[g][col], val)


def test_separation_sign_and_magnitude(spark):
    # cohort a (the MIN label) dies fast and uncensored; cohort b
    # lives long => a sees far more events than the pooled risk sets
    # expect => O - E > 0 => z large positive.
    rows = [("a", d % 5 + 1, 1) for d in range(80)]
    rows += [("b", 50 + d % 10, 1) for d in range(80)]
    df = spark.createDataFrame(
        [(0, *r) for r in rows], "g int, co string, dur long, ev int"
    )
    row = logrank_test(df, ["g"], "co", "dur", "ev").collect()[0]
    assert row["o_minus_e"] > 0
    assert row["z"] > 5
    want = _brute(rows)
    assert row["chi2"] == want["chi2"] and row["z"] == want["z"]


def test_single_cohort_and_all_censored_null(spark):
    rows = [(0, "a", d, 1) for d in range(1, 20)]
    rows += [(1, "a", d, 0) for d in range(1, 10)]
    rows += [(1, "b", d, 0) for d in range(1, 10)]
    df = spark.createDataFrame(rows, "g int, co string, dur long, ev int")
    got = {
        r["g"]: r for r in logrank_test(df, ["g"], "co", "dur", "ev").collect()
    }
    # single cohort: row kept, nothing to compare
    assert got[0]["cohort_a"] == got[0]["cohort_b"] == "a"
    assert got[0]["chi2"] is None and got[0]["z"] is None
    # two cohorts, zero events anywhere: V = 0, NULL test
    assert got[1]["events_a"] == got[1]["events_b"] == 0
    assert got[1]["v_micro"] == 0
    assert got[1]["chi2"] is None and got[1]["z"] is None


def test_censoring_changes_risk_sets(spark):
    # same event rows; group 1 adds late-censored subjects in cohort
    # b only — they sit in the risk sets at early times, lowering
    # E[a]'s share... the censored rows must CHANGE the statistic
    # (a dropped-censored implementation would make the groups equal).
    ev_rows = [("a", d % 4 + 1, 1) for d in range(40)] + [
        ("b", d % 8 + 2, 1) for d in range(40)
    ]
    cens = [("b", 30, 0)] * 25
    rows = [(0, *r) for r in ev_rows] + [(1, *r) for r in ev_rows + cens]
    df = spark.createDataFrame(rows, "g int, co string, dur long, ev int")
    got = {
        r["g"]: r for r in logrank_test(df, ["g"], "co", "dur", "ev").collect()
    }
    assert got[0]["e_a_micro"] != got[1]["e_a_micro"]
    assert got[0]["events_a"] == got[1]["events_a"]  # events unchanged
    want = _brute(ev_rows + cens)
    assert got[1]["chi2"] == want["chi2"]


def test_three_cohorts_raises_in_plan(spark):
    df = spark.createDataFrame(
        [(0, "a", 1, 1), (0, "b", 2, 1), (0, "c", 3, 1)],
        "g int, co string, dur long, ev int",
    )
    with pytest.raises(Exception, match="more than two cohorts"):
        logrank_test(df, ["g"], "co", "dur", "ev").collect()


def test_bad_event_and_float_duration_raise(spark):
    df = spark.createDataFrame(
        [(0, "a", 1, 2), (0, "b", 2, 1)], "g int, co string, dur long, ev int"
    )
    with pytest.raises(Exception, match="event must be 0 or 1"):
        logrank_test(df, ["g"], "co", "dur", "ev").collect()
    fdf = spark.createDataFrame(
        [(0, "a", 1.5, 1)], "g int, co string, dur double, ev int"
    )
    with pytest.raises(ValueError, match="integral"):
        logrank_test(fdf, ["g"], "co", "dur", "ev")


def test_partition_invariance(spark):
    rng = random.Random(433)
    rows = [(0, *r) for r in _gen(rng, 300, 6.0, 12.0)]
    df = spark.createDataFrame(rows, "g int, co string, dur long, ev int")
    one = logrank_test(df, ["g"], "co", "dur", "ev").collect()[0]
    two = logrank_test(
        df.repartition(13, "dur"), ["g"], "co", "dur", "ev"
    ).collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(439)
    rows = []
    for g in range(5):
        rows += [(g, *r) for r in _gen(rng, rng.randint(40, 200), 7.0, 11.0)]
    # plus a single-cohort group (NULL row must match too)
    rows += [(5, "a", d % 6 + 1, d % 2) for d in range(30)]
    pdf = pd.DataFrame(rows, columns=["g", "co", "dur", "ev"])
    p = str(tmp_path / "lr.parquet")
    pdf.to_parquet(p)
    got = (
        logrank_test(spark.read.parquet(p), ["g"], "co", "dur", "ev")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        logrank_test_sql("__t", "g", "co", "dur", "ev") + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_duckdb_twin_error_branches():
    """The SQL twin's two error() branches must actually fire (the
    Spark-side raises are tested above; a mis-predicated or
    syntactically broken CASE would otherwise pass the suite, since
    the twin test only feeds well-formed two-cohort 0/1 data)."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    three = pd.DataFrame(
        [(0, c, 1 + i, 1) for i, c in enumerate("abc")],
        columns=["g", "co", "dur", "ev"],
    )
    con.register("__lr3", three)
    with pytest.raises(Exception, match="more than two cohorts"):
        con.sql(logrank_test_sql("__lr3", "g", "co", "dur", "ev")).df()
    bad = pd.DataFrame(
        [(0, "a", 1, 1), (0, "b", 2, 2)], columns=["g", "co", "dur", "ev"]
    )
    con.register("__lrbad", bad)
    with pytest.raises(Exception, match="event must be 0 or 1"):
        con.sql(logrank_test_sql("__lrbad", "g", "co", "dur", "ev")).df()


def _brute_gehan(pairs):
    """Gehan–Breslow variant: per-time weight n (pooled at risk)
    applied AFTER the micro quantization — replicates the operator's
    weighted exact-integer sums."""
    labels = sorted({c for c, _, _ in pairs})
    lo = labels[0]
    d1, ct1, dd, cta = Counter(), Counter(), Counter(), Counter()
    for c, t, e in pairs:
        dd[t] += e
        cta[t] += 1
        if c == lo:
            d1[t] += e
            ct1[t] += 1
    N, N1 = sum(cta.values()), sum(ct1.values())
    cum = cum1 = numw = vmw = 0
    for t in sorted(cta):
        cum += cta[t]
        cum1 += ct1[t]
        n = N - cum + cta[t]
        n1 = N1 - cum1 + ct1[t]
        d = dd[t]
        e1 = (d * n1 * M) // n
        v = 0
        if n > 1:
            v = (d * (n - d) * n1 * (n - n1) * M) // (n * n * (n - 1))
        numw += n * (d1[t] * M - e1)
        vmw += n * n * v
    if vmw > 0:
        chi2 = float(numw * numw) / float(vmw * M)
        sign = 1.0 if numw > 0 else (-1.0 if numw < 0 else 0.0)
        return {"o_minus_e": numw / 1e6, "chi2": chi2,
                "z": sign * math.sqrt(chi2)}
    return {"o_minus_e": numw / 1e6, "chi2": None, "z": None}


def test_gehan_matches_brute(spark):
    rng = random.Random(557)
    rows = [(0,) + r for r in _gen(rng, 300, 6.0, 10.0)]
    df = spark.createDataFrame(rows, "g int, co string, dur int, ev int")
    got = logrank_test(
        df, ["g"], "co", "dur", "ev", weight="gehan"
    ).collect()[0]
    want = _brute_gehan([(c, t, e) for _, c, t, e in rows])
    assert {k: got[k] for k in want} == want


def test_gehan_equals_logrank_at_single_event_time(spark):
    """With exactly one distinct duration the weight is a constant
    that cancels: chi2/z must be IDENTICAL doubles (both divisions
    compute the correctly-rounded value of the same rational)."""
    rows = [(0, "a", 5, 1)] * 8 + [(0, "a", 5, 0)] * 2 \
        + [(0, "b", 5, 1)] * 3 + [(0, "b", 5, 0)] * 7
    df = spark.createDataFrame(rows, "g int, co string, dur int, ev int")
    lr = logrank_test(df, ["g"], "co", "dur", "ev").collect()[0]
    gh = logrank_test(
        df, ["g"], "co", "dur", "ev", weight="gehan"
    ).collect()[0]
    assert gh["chi2"] == lr["chi2"] and gh["z"] == lr["z"]


def test_gehan_weights_early_differences(spark):
    """Cohorts that differ EARLY and converge late: Gehan (weight n,
    largest at early times) must amplify |z| relative to the plain
    log-rank; with the difference moved LATE the ordering flips."""
    early = (
        [(0, "a", 1, 1)] * 12 + [(0, "a", 20, 1)] * 8
        + [(0, "b", 2, 1)] * 2 + [(0, "b", 20, 1)] * 18
    )
    df = spark.createDataFrame(early, "g int, co string, dur int, ev int")
    lr = logrank_test(df, ["g"], "co", "dur", "ev").collect()[0]
    gh = logrank_test(
        df, ["g"], "co", "dur", "ev", weight="gehan"
    ).collect()[0]
    assert abs(gh["z"]) > abs(lr["z"])
    late = (
        [(0, "a", 10, 1)] * 10 + [(0, "a", 20, 1)] * 10
        + [(0, "b", 10, 1)] * 10 + [(0, "b", 30, 1)] * 10
    )
    df2 = spark.createDataFrame(late, "g int, co string, dur int, ev int")
    lr2 = logrank_test(df2, ["g"], "co", "dur", "ev").collect()[0]
    gh2 = logrank_test(
        df2, ["g"], "co", "dur", "ev", weight="gehan"
    ).collect()[0]
    assert abs(gh2["z"]) < abs(lr2["z"])


def test_gehan_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(563)
    rows = []
    for g in range(3):
        rows += [(g,) + r for r in _gen(rng, 200, 5.0, 9.0)]
    pdf = pd.DataFrame(rows, columns=["g", "co", "dur", "ev"])
    p = str(tmp_path / "gh.parquet")
    pdf.to_parquet(p)
    got = (
        logrank_test(
            spark.read.parquet(p), ["g"], "co", "dur", "ev", weight="gehan"
        )
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        logrank_test_sql("__t", "g", "co", "dur", "ev", weight="gehan")
        + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bad_weight_raises(spark):
    with pytest.raises(ValueError, match="weight must be"):
        logrank_test_sql("t", "g", "co", "dur", "ev", weight="peto")
    df = spark.createDataFrame([(0, "a", 1, 1)], "g int, co string, dur int, ev int")
    with pytest.raises(ValueError, match="weight must be"):
        logrank_test(df, ["g"], "co", "dur", "ev", weight="peto")


def _brute_strat(triples, weight="logrank"):
    """triples: [(stratum, cohort, dur, ev)] — per-stratum risk sets,
    terms summed across strata; cohort mapping global (min label)."""
    labels = sorted({c for _, c, _, _ in triples})
    lo = labels[0]
    numw = vmw = 0
    for st in {s for s, _, _, _ in triples}:
        pairs = [(c, t, e) for s, c, t, e in triples if s == st]
        d1, ct1, dd, cta = Counter(), Counter(), Counter(), Counter()
        for c, t, e in pairs:
            dd[t] += e
            cta[t] += 1
            if c == lo:
                d1[t] += e
                ct1[t] += 1
        N, N1 = sum(cta.values()), sum(ct1.values())
        cum = cum1 = 0
        for t in sorted(cta):
            cum += cta[t]
            cum1 += ct1[t]
            n = N - cum + cta[t]
            n1 = N1 - cum1 + ct1[t]
            d = dd[t]
            e1 = (d * n1 * M) // n
            v = 0
            if n > 1:
                v = (d * (n - d) * n1 * (n - n1) * M) // (n * n * (n - 1))
            w = n if weight == "gehan" else 1
            numw += w * (d1[t] * M - e1)
            vmw += w * w * v
    if vmw > 0:
        chi2 = float(numw * numw) / float(vmw * M)
        sign = 1.0 if numw > 0 else (-1.0 if numw < 0 else 0.0)
        return {"chi2": chi2, "z": sign * math.sqrt(chi2)}
    return {"chi2": None, "z": None}


def test_stratified_matches_brute_both_weights(spark):
    rng = random.Random(569)
    rows = []
    for st in range(3):
        lam = 4.0 + 4.0 * st
        for r in _gen(rng, 120, lam, lam * 1.6):
            rows.append((0, st) + r)
    df = spark.createDataFrame(
        rows, "g int, st int, co string, dur int, ev int"
    )
    for wgt in ("logrank", "gehan"):
        got = logrank_test(
            df, ["g"], "co", "dur", "ev", weight=wgt, stratum_col="st"
        ).collect()[0]
        want = _brute_strat(
            [(s, c, t, e) for _, s, c, t, e in rows], weight=wgt
        )
        assert {k: got[k] for k in want} == want, wgt
        assert got["n_strata"] == 3


def test_single_constant_stratum_equals_unstratified(spark):
    rng = random.Random(571)
    rows = [(0,) + r for r in _gen(rng, 200, 5.0, 9.0)]
    df = spark.createDataFrame(rows, "g int, co string, dur int, ev int")
    plain = logrank_test(df, ["g"], "co", "dur", "ev").collect()[0].asDict()
    strat = (
        logrank_test(
            df.withColumn("st", df.g * 0), ["g"], "co", "dur", "ev",
            stratum_col="st",
        )
        .collect()[0]
        .asDict()
    )
    assert strat.pop("n_strata") == 1
    assert strat == plain


def test_stratified_corrects_planted_confounding(spark):
    """Survival Simpson's paradox: within each stratum the cohorts
    follow the SAME curve (proportional copies, so every per-time
    term d1·10⁶ − e1 is EXACTLY 0 on the integers), but heavy users
    concentrate in the fast stratum — the pooled test reports a
    large spurious z while the stratified test reports z == 0.0
    EXACTLY."""
    fast = [(1, 1), (2, 1), (3, 0)]
    slow = [(10, 1), (20, 1), (30, 0)]
    rows = []
    for _ in range(12):
        rows += [(0, "A", "heavy", t, e) for t, e in fast]
        rows += [(0, "B", "light", t, e) for t, e in slow]
    for _ in range(3):
        rows += [(0, "A", "light", t, e) for t, e in fast]
        rows += [(0, "B", "heavy", t, e) for t, e in slow]
    df = spark.createDataFrame(
        rows, "g int, st string, co string, dur int, ev int"
    )
    pooled = logrank_test(df, ["g"], "co", "dur", "ev").collect()[0]
    assert pooled["z"] > 2.0  # the confounded lie: heavy "converts faster"
    strat = logrank_test(
        df, ["g"], "co", "dur", "ev", stratum_col="st"
    ).collect()[0]
    assert strat["z"] == 0.0 and strat["chi2"] == 0.0


def test_stratified_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(577)
    rows = []
    for g in range(2):
        for st in range(3):
            lam = 3.0 + 3.0 * st
            rows += [(g, st) + r for r in _gen(rng, 100, lam, lam * 1.5)]
    pdf = pd.DataFrame(rows, columns=["g", "st", "co", "dur", "ev"])
    p = str(tmp_path / "slr.parquet")
    pdf.to_parquet(p)
    for wgt in ("logrank", "gehan"):
        got = (
            logrank_test(
                spark.read.parquet(p), ["g"], "co", "dur", "ev",
                weight=wgt, stratum_col="st",
            )
            .orderBy("g")
            .toPandas()
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
        want = con.sql(
            logrank_test_sql(
                "__t", "g", "co", "dur", "ev", weight=wgt, stratum="st"
            )
            + " ORDER BY g"
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

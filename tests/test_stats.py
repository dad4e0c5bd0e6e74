"""Exact co-moments / Pearson: three-engine digit-exact sums (Python
bigint truth, Spark decimal, DuckDB hugeint), corr parity, laws."""

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.operators.stats import exact_comoments, exact_comoments_sql


def _truth(pdf, cols, scale):
    """Python-bigint exact moments after the same quantization."""
    rows = pdf.dropna(subset=cols)
    q = {c: [math.floor(float(v) * scale) for v in rows[c]] for c in cols}
    n = len(rows)
    out = {}
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            sa, sb = sum(q[a]), sum(q[b])
            saa = sum(x * x for x in q[a])
            sbb = sum(x * x for x in q[b])
            sab = sum(x * y for x, y in zip(q[a], q[b]))
            out[(a, b)] = (n, str(sa), str(sb), str(saa), str(sbb), str(sab))
    return out


@pytest.fixture(scope="module")
def stats_pdf():
    rng = np.random.default_rng(5)
    x = rng.normal(50, 20, 400)
    pdf = pd.DataFrame(
        {
            "x": x,
            "y": 3.0 * x + 7.0,          # corr exactly ~1 (pre-quantization)
            "z": -x,                      # corr ~ -1
            "w": rng.normal(0, 1, 400),   # ~independent
        }
    )
    pdf.loc[5, "x"] = None
    pdf.loc[9, "w"] = None
    # NaN (not NULL) must drop identically in both engines — Spark
    # na.drop vs SQL IS NOT NULL diverge here; the operators spell
    # out the NaN predicate explicitly (review finding, pinned)
    pdf.loc[11, "y"] = float("nan")
    return pdf


@pytest.mark.spark
def test_three_engine_digit_exact(spark, stats_pdf, tmp_path):
    import duckdb

    cols = ["x", "y", "z", "w"]
    path = str(tmp_path / "s.parquet")
    stats_pdf.to_parquet(path)
    got = (
        exact_comoments(spark.read.parquet(path), cols, scale=1000)
        .toPandas().set_index(["col_a", "col_b"]).sort_index()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    want = (
        con.sql(exact_comoments_sql("t", cols, scale=1000))
        .df().set_index(["col_a", "col_b"]).sort_index()
    )
    truth = _truth(stats_pdf, cols, 1000)
    assert set(got.index) == set(truth)
    for key, (n, sa, sb, saa, sbb, sab) in truth.items():
        g, w = got.loc[key], want.loc[key]
        assert (int(g.n), g.sum_a, g.sum_b, g.sumsq_a, g.sumsq_b, g.sum_ab) == (
            n, sa, sb, saa, sbb, sab
        ), key
        assert (int(w.n), w.sum_a, w.sum_b, w.sumsq_a, w.sumsq_b, w.sum_ab) == (
            n, sa, sb, saa, sbb, sab
        ), key
        # the derived double agrees bit-for-bit across engines
        assert g["corr"] == w["corr"], (key, g["corr"], w["corr"])
    # values: planted structure survives quantization
    assert got.loc[("x", "y")]["corr"] > 0.9999
    assert got.loc[("x", "z")]["corr"] < -0.9999
    assert abs(got.loc[("x", "w")]["corr"]) < 0.2


@pytest.mark.spark
def test_partition_invariance_and_numpy(spark, stats_pdf):
    cols = ["x", "y", "w"]
    df = spark.createDataFrame(stats_pdf)
    a = exact_comoments(df.repartition(3), cols).toPandas().sort_values(["col_a", "col_b"])
    b = exact_comoments(df.repartition(17), cols).toPandas().sort_values(["col_a", "col_b"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # corr of the QUANTIZED values matches numpy to float precision
    rows = stats_pdf.dropna(subset=cols)
    qx = np.floor(rows.x.to_numpy() * 100)
    qw = np.floor(rows.w.to_numpy() * 100)
    ref = np.corrcoef(qx, qw)[0, 1]
    got = a.set_index(["col_a", "col_b"]).loc[("x", "w")]["corr"]
    assert abs(got - ref) < 1e-12


@pytest.mark.spark
def test_single_scan_plan(spark, stats_pdf):
    df = spark.createDataFrame(stats_pdf)
    out = exact_comoments(df, ["x", "y", "z"])
    out.count()
    executed = out._jdf.queryExecution().executedPlan().toString()
    # one aggregate pipeline: no join, no window, nothing pair-shaped
    assert "Join" not in executed and "Window" not in executed


def test_stats_invalid_args(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        exact_comoments(df, ["id"])
    with pytest.raises(ValueError):
        exact_comoments(df, ["id", "id2"], scale=0)
    with pytest.raises(ValueError):
        exact_comoments_sql("t", ["a"])


# ---------------------------------------------------------------------------
# Exact grouped AUC (Mann-Whitney with midranks)
# ---------------------------------------------------------------------------

import random as _random

from pyspark.sql import functions as _F

from btl_bloomfilter_spark.operators.stats import grouped_auc


def _brute_auc(scores, labels):
    """Pair-counting definition: P(s_pos > s_neg) + 0.5 P(tie)."""
    pos = [s for s, l in zip(scores, labels) if l]
    neg = [s for s, l in zip(scores, labels) if not l]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return wins + 0.5 * ties, len(pos), len(neg)


def test_grouped_auc_matches_pair_counting(spark):
    rng = _random.Random(17)
    rows = []
    for g in ("a", "b"):
        for i in range(300):
            lab = rng.random() < 0.4
            # ties guaranteed: integer scores from a small range,
            # positives shifted so AUC is away from 0.5
            s = rng.randrange(0, 40) + (5 if lab else 0)
            rows.append((g, float(s), lab))
    df = spark.createDataFrame(rows, "g string, s double, lab boolean")
    got = {r.g: r for r in grouped_auc(df, ["g"], "s", "lab").collect()}
    by_g = {}
    for g, s, l in rows:
        by_g.setdefault(g, ([], []))[0].append(s)
        by_g[g][1].append(l)
    for g, (ss, ll) in by_g.items():
        u_half, np_, nn_ = _brute_auc(ss, ll)
        r = got[g]
        assert (r.n_pos, r.n_neg) == (np_, nn_)
        assert r.u2 == int(2 * u_half)  # exact integer identity
        assert r.auc == (2 * u_half) / (2 * np_ * nn_)


def test_grouped_auc_perfect_and_reversed(spark):
    rows = [("g", float(i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, s double, lab boolean")
    assert grouped_auc(df, ["g"], "s", "lab").collect()[0].auc == 1.0
    flipped = df.withColumn("lab", ~_F.col("lab"))
    assert grouped_auc(flipped, ["g"], "s", "lab").collect()[0].auc == 0.0


def test_grouped_auc_all_tied_is_half(spark):
    rows = [("g", 1.0, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, s double, lab boolean")
    assert grouped_auc(df, ["g"], "s", "lab").collect()[0].auc == 0.5


def test_grouped_auc_degenerate_groups_excluded_and_nulls_dropped(spark):
    rows = [
        ("allpos", 1.0, True),
        ("allpos", 2.0, True),
        ("ok", 1.0, True),
        ("ok", 0.0, False),
        ("ok", None, True),  # null score dropped
        ("ok", 3.0, None),  # null label dropped
    ]
    df = spark.createDataFrame(rows, "g string, s double, lab boolean")
    got = {r.g: r for r in grouped_auc(df, ["g"], "s", "lab").collect()}
    assert set(got) == {"ok"}
    assert got["ok"].auc == 1.0 and got["ok"].n_pos == 1 and got["ok"].n_neg == 1


def test_grouped_auc_label_expression_and_partition_invariance(spark):
    rows = [("g", float(i % 7), i) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, s double, i long")
    lab = _F.col("i") % 3 == 0
    a = sorted(map(tuple, grouped_auc(df, ["g"], "s", lab).collect()))
    b = sorted(map(tuple, grouped_auc(df.repartition(9), ["g"], "s", lab).collect()))
    assert a == b


def test_threshold_sweep_matches_brute(spark):
    rng = _random.Random(23)
    rows = [("g", float(rng.randrange(0, 15)), rng.random() < 0.3) for _ in range(250)]
    df = spark.createDataFrame(rows, "g string, s double, lab boolean")
    from btl_bloomfilter_spark.operators.stats import threshold_sweep

    got = {r.threshold: r for r in threshold_sweep(df, ["g"], "s", "lab").collect()}
    scores = sorted({s for _, s, _ in rows})
    assert set(got) == set(scores)
    np_ = sum(1 for r in rows if r[2])
    nn_ = len(rows) - np_
    for t in scores:
        tp = sum(1 for _, s, l in rows if l and s >= t)
        fp = sum(1 for _, s, l in rows if not l and s >= t)
        r = got[t]
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, np_ - tp, nn_ - fp)
        assert r.precision == tp / (tp + fp) and r.recall == tp / np_
    # endpoint: lowest threshold predicts everything positive
    lo = got[scores[0]]
    assert lo.recall == 1.0 and lo.tp == np_ and lo.fp == nn_
    # recall monotone nonincreasing in threshold
    recalls = [got[t].recall for t in scores]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))


def test_threshold_sweep_excludes_no_positive_groups(spark):
    from btl_bloomfilter_spark.operators.stats import threshold_sweep

    rows = [("allneg", 1.0, False), ("allneg", 2.0, False), ("ok", 1.0, True), ("ok", 0.0, False)]
    df = spark.createDataFrame(rows, "g string, s double, lab boolean")
    got = {r.g for r in threshold_sweep(df, ["g"], "s", "lab").collect()}
    assert got == {"ok"}  # recall would be 0/0 in 'allneg' — excluded


# ---------------------------------------------------------------------------
# Exact grouped Spearman (Pearson over integral 2-midranks)
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import grouped_spearman


def test_spearman_matches_midrank_brute_with_ties(spark):
    # brute oracle: pandas midranks (method='average' — no scipy) +
    # numpy Pearson over the ranks, the defining formulation under ties
    import numpy as np
    import pandas as pd

    rng = _random.Random(137)
    rows = []
    for g in ("a", "b"):
        for _ in range(250):
            x = float(rng.randrange(0, 25))  # heavy ties
            y = x + rng.randrange(0, 30) * (1 if g == "a" else -1)
            rows.append((g, x, float(y)))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_spearman(df, ["g"], "x", "y").collect()}
    pdf = pd.DataFrame(rows, columns=["g", "x", "y"])
    for g, sub in pdf.groupby("g"):
        rx = sub["x"].rank(method="average").to_numpy()
        ry = sub["y"].rank(method="average").to_numpy()
        want = float(np.corrcoef(rx, ry)[0, 1])
        assert abs(got[g].rho - want) < 1e-12, (g, got[g].rho, want)
        assert got[g].n == len(sub)


def test_spearman_monotone_and_footrule_witness(spark):
    # distinct values: classic ties-free identity rho = 1 - 6*sumd2/(n(n^2-1)),
    # and the emitted witness is sum((2rx-2ry)^2) = 4*sum(d^2)
    perm = [(float(i), float((i * 7) % 101)) for i in range(101)]
    rows = [("g", x, y) for x, y in perm]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = grouped_spearman(df, ["g"], "x", "y").collect()[0]
    rx = {v: i + 1 for i, v in enumerate(sorted(x for x, _ in perm))}
    ry = {v: i + 1 for i, v in enumerate(sorted(y for _, y in perm))}
    sd2 = sum((rx[x] - ry[y]) ** 2 for x, y in perm)
    assert int(r.sum_d2) == 4 * sd2
    n = 101
    classic = 1 - 6 * sd2 / (n * (n * n - 1))
    assert abs(r.rho - classic) < 1e-12
    up = spark.createDataFrame(
        [("g", float(i), float(2 * i + 3)) for i in range(50)],
        "g string, x double, y double",
    )
    assert abs(grouped_spearman(up, ["g"], "x", "y").collect()[0].rho - 1.0) < 1e-12
    down = spark.createDataFrame(
        [("g", float(i), float(-3 * i)) for i in range(50)],
        "g string, x double, y double",
    )
    assert abs(grouped_spearman(down, ["g"], "x", "y").collect()[0].rho + 1.0) < 1e-12


def test_spearman_degenerate_and_nulls(spark):
    rows = [
        ("const_x", 5.0, 1.0), ("const_x", 5.0, 2.0), ("const_x", 5.0, 3.0),
        ("ok", 1.0, 1.0), ("ok", 2.0, 5.0), ("ok", 3.0, 4.0),
        ("ok", None, 9.0), ("ok", 4.0, float("nan")),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_spearman(df, ["g"], "x", "y").collect()}
    assert "const_x" not in got          # zero rank variance -> excluded
    assert got["ok"].n == 3              # null / NaN rows dropped


# ---------------------------------------------------------------------------
# Exact calibration bins + integral ECE
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import calibration_bins


def _brute_calibration(rows, n_bins, micro=1_000_000):
    """Integer-arithmetic reliability bins, independent formulation."""
    import collections as _c
    import math

    agg = _c.defaultdict(lambda: [0, 0, 0])  # (g, bin) -> [n, pos, s_micro]
    tot = _c.Counter()
    for g, s, lab in rows:
        if s is None or lab is None or s != s:  # NULLs and NaN dropped
            continue
        b = min(max(int(math.floor(s * n_bins)), 0), n_bins - 1)
        cell = agg[(g, b)]
        cell[0] += 1
        cell[1] += int(lab)
        cell[2] += int(math.floor(s * micro))
        tot[g] += 1
    enum = _c.Counter()
    for (g, b), (n, pos, s) in agg.items():
        enum[g] += abs(micro * pos - s)
    out = {}
    for (g, b), (n, pos, s) in agg.items():
        out[(g, b)] = (
            n, pos, s,
            s / (micro * n), pos / n, enum[g] / (micro * tot[g]),
        )
    return out


def test_calibration_matches_integer_brute(spark):
    rng = _random.Random(138)
    rows = []
    for g in ("a", "b"):
        for _ in range(400):
            s = rng.randrange(0, 1 << 20) / (1 << 20)
            lab = rng.random() < (s if g == "a" else 0.5)
            rows.append((g, s, lab))
    rows += [
        ("a", None, True), ("a", 0.5, None),          # dropped: NULLs
        ("a", float("nan"), True),                    # dropped: NaN score
    ]  # (NaN would crash the ANSI long cast / DuckDB int cast if kept)
    df = spark.createDataFrame(rows, "g string, s double, lab boolean")
    got = calibration_bins(df, ["g"], "s", "lab", n_bins=10).collect()
    want = _brute_calibration(rows, 10)
    assert len(got) == len(want)
    for r in got:
        n, pos, s, conf, frac, ece = want[(r.g, r.bin)]
        assert (r.n, r.n_pos, int(r.conf_micro_sum)) == (n, pos, s)
        assert r.confidence == conf and r.frac_pos == frac and r.ece == ece


def test_calibration_clamps_and_single_bin(spark):
    rows = [("g", -0.3, True), ("g", 0.0, False), ("g", 1.0, True), ("g", 2.5, False)]
    df = spark.createDataFrame(rows, "g string, s double, lab boolean")
    got = {r.bin: r for r in calibration_bins(df, ["g"], "s", "lab", n_bins=4).collect()}
    assert set(got) == {0, 3}           # -0.3 and 0.0 -> bin 0; 1.0 and 2.5 -> bin 3
    assert got[0].n == 2 and got[3].n == 2
    one = calibration_bins(df, ["g"], "s", "lab", n_bins=1).collect()
    assert len(one) == 1 and one[0].n == 4


def test_calibration_contract_errors(spark):
    df = spark.createDataFrame([("g", 0.5, True)], "g string, s double, lab boolean")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bins"):
        calibration_bins(df, ["g"], "s", "lab", n_bins=0)
    with _pytest.raises(ValueError, match="micro"):
        calibration_bins(df, ["g"], "s", "lab", n_bins=2, micro=0)


# ---------------------------------------------------------------------------
# Exact grouped Kendall tau-b (joint-histogram pair counting)
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import grouped_kendall


def _brute_kendall(xy):
    n = len(xy)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = xy[i], xy[j]
            if x1 == x2 and y1 == y2:
                continue
            if x1 == x2:
                tx += 1
            elif y1 == y2:
                ty += 1
            elif (x1 < x2) == (y1 < y2):
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) // 2
    # tie-pair counts INCLUDING joint ties (the tau-b definition)
    import collections as _c

    cx = _c.Counter(x for x, _ in xy)
    cy = _c.Counter(y for _, y in xy)
    n1 = sum(t * (t - 1) // 2 for t in cx.values())
    n2 = sum(t * (t - 1) // 2 for t in cy.values())
    # same doubled expression shape as the engines
    tau = (2 * (c - d)) / math.sqrt(2 * (n0 - n1)) / math.sqrt(2 * (n0 - n2))
    return c, d, n, tau


def test_kendall_matches_brute_with_ties(spark):
    rng = _random.Random(141)
    rows = []
    for g in ("a", "b"):
        for _ in range(120):
            x = float(rng.randrange(0, 8))  # heavy ties both axes
            y = float(rng.randrange(0, 6) + (x if g == "a" else -x))
            rows.append((g, x, y))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_kendall(df, ["g"], "x", "y").collect()}
    for g in ("a", "b"):
        xy = [(x, y) for gg, x, y in rows if gg == g]
        c, d, n, tau = _brute_kendall(xy)
        r = got[g]
        assert (int(r.concordant), int(r.discordant), r.n) == (c, d, n)
        assert r.tau_b == tau  # bit-identical: same expression shape
    assert got["a"].tau_b > 0.3 and got["b"].tau_b < -0.3


def test_kendall_degenerate_and_nulls(spark):
    rows = [
        ("const_x", 5.0, 1.0), ("const_x", 5.0, 2.0),
        ("ok", 1.0, 2.0), ("ok", 2.0, 1.0), ("ok", 3.0, 3.0),
        ("ok", None, 9.0), ("ok", 4.0, float("nan")),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_kendall(df, ["g"], "x", "y").collect()}
    assert set(got) == {"ok"}
    assert got["ok"].n == 3
    # perfect anti/agreement sanity on clean sequences
    up = spark.createDataFrame(
        [("g", float(i), float(i * 2)) for i in range(30)],
        "g string, x double, y double",
    )
    assert abs(grouped_kendall(up, ["g"], "x", "y").collect()[0].tau_b - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# Exact grouped Gini (value-compressed histogram)
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import grouped_gini


def _brute_gini(vals, scale=100):
    q = sorted(math.floor(v * scale) for v in vals)
    n, s = len(q), sum(q)
    a = sum((i + 1) * x for i, x in enumerate(q))
    return (2 * a - (n + 1) * s) / (n * s), n, s


def test_gini_matches_brute_with_ties(spark):
    rng = _random.Random(142)
    rows = []
    for g in ("a", "b"):
        for _ in range(300):
            v = rng.randrange(0, 30) if g == "a" else rng.randrange(0, 5) ** 3
            rows.append((g, float(v) + 0.25))
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.g: r for r in grouped_gini(df, ["g"], "v").collect()}
    for g in ("a", "b"):
        want, n, s = _brute_gini([v for gg, v in rows if gg == g])
        assert got[g].n == n and int(got[g].mass_q) == s
        assert got[g].gini == want  # bit-identical: same single division


def test_gini_extremes_and_contract(spark):
    # all-equal -> 0; one-holder concentration -> (n-1)/n
    eq = spark.createDataFrame([("g", 5.0)] * 20, "g string, v double")
    assert grouped_gini(eq, ["g"], "v").collect()[0].gini == 0.0
    conc = spark.createDataFrame(
        [("g", 0.0)] * 19 + [("g", 100.0)], "g string, v double"
    )
    assert grouped_gini(conc, ["g"], "v").collect()[0].gini == 19 / 20
    zeros = spark.createDataFrame([("z", 0.0)] * 5, "g string, v double")
    assert grouped_gini(zeros, ["g"], "v").collect() == []  # S = 0 excluded
    import pytest as _pytest

    with _pytest.raises(ValueError, match="scale"):
        grouped_gini(eq, ["g"], "v", scale=0)


# ---------------------------------------------------------------------------
# Deterministic hash-Poisson bootstrap CI
# ---------------------------------------------------------------------------

import hashlib as _hashlib

from btl_bloomfilter_spark.operators.stats import (
    _poisson1_thresholds,
    bootstrap_ci,
)


def _brute_bootstrap(rows, replicates, scale, seed, alpha_milli):
    """Independent Python reimplementation of the spec."""
    ts = _poisson1_thresholds()
    by_g = {}
    for g, key, v in rows:
        if v is None or v != v:
            continue
        by_g.setdefault(g, []).append((key, math.floor(v * scale)))
    out = {}
    for g, items in by_g.items():
        means = []
        for b in range(replicates):
            smx = sm = 0
            for key, xq in items:
                payload = f"{seed}|{key}|{b}".encode()
                u = int(_hashlib.md5(payload).hexdigest()[:15], 16)
                m = sum(1 for t in ts if u >= t)
                smx += m * xq
                sm += m
            if sm > 0:
                means.append(smx / (scale * sm))
        means.sort()
        r = len(means)
        lo = max(1, math.ceil((alpha_milli * r) / 2000.0))
        n = len(items)
        sx = sum(x for _, x in items)
        out[g] = (n, sx / (scale * n), means[lo - 1], means[r - lo], r)
    return out


def test_bootstrap_matches_independent_spec(spark):
    rng = _random.Random(143)
    rows = [
        (g, i if g == "a" else i + 1000, float(rng.randrange(0, 500)) / 7.0)
        for g in ("a", "b")
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    got = {
        r.g: r
        for r in bootstrap_ci(
            df, ["g"], "v", ["k"], replicates=24, scale=1000, seed=9, alpha_milli=100
        ).collect()
    }
    want = _brute_bootstrap(rows, 24, 1000, 9, 100)
    for g, (n, mean, lo, hi, r) in want.items():
        row = got[g]
        assert (row.n, row.n_replicates) == (n, r)
        assert row.mean == mean and row.ci_lo == lo and row.ci_hi == hi
    assert all(got[g].ci_lo <= got[g].mean <= got[g].ci_hi for g in got)


def test_bootstrap_partition_invariance_and_coverage_sanity(spark):
    rows = [("g", i, float(i % 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    a = bootstrap_ci(df.repartition(3), ["g"], "v", ["k"], replicates=16).collect()[0]
    b = bootstrap_ci(df.repartition(17), ["g"], "v", ["k"], replicates=16).collect()[0]
    assert a == b
    # CI half-width should be in the plausible range for n=400, sd~14.4
    assert 0.3 < (a.ci_hi - a.ci_lo) < 6.0


def test_bootstrap_contract_errors(spark):
    df = spark.createDataFrame([("g", 1, 1.0)], "g string, k long, v double")
    import pytest as _pytest

    for kw in (
        dict(replicates=3),
        dict(scale=0),
        dict(alpha_milli=0),
        dict(alpha_milli=1000),
    ):
        with _pytest.raises(ValueError):
            bootstrap_ci(df, ["g"], "v", ["k"], **kw)
    with _pytest.raises(ValueError, match="key_cols"):
        bootstrap_ci(df, ["g"], "v", [])


# ---------------------------------------------------------------------------
# Exact grouped two-sample KS
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import grouped_ks


def _brute_ks(pairs):
    s1 = sorted(v for v, c in pairs if c)
    s2 = sorted(v for v, c in pairs if not c)
    n1, n2 = len(s1), len(s2)
    support = sorted(set(s1) | set(s2))
    num = 0
    for v in support:
        c1 = sum(1 for x in s1 if x <= v)
        c2 = sum(1 for x in s2 if x <= v)
        num = max(num, abs(c1 * n2 - c2 * n1))
    return n1, n2, num, num / (n1 * n2)


def test_ks_matches_brute_with_ties(spark):
    rng = _random.Random(144)
    rows = []
    for g in ("same", "shifted"):
        for _ in range(250):
            c = rng.random() < 0.5
            v = rng.randrange(0, 25) + (4 if (c and g == "shifted") else 0)
            rows.append((g, float(v), c))
    df = spark.createDataFrame(rows, "g string, v double, c boolean")
    got = {r.g: r for r in grouped_ks(df, ["g"], "v", "c").collect()}
    for g in ("same", "shifted"):
        n1, n2, num, d = _brute_ks([(v, c) for gg, v, c in rows if gg == g])
        r = got[g]
        assert (r.n1, r.n2, int(r.ks_num)) == (n1, n2, num)
        assert r.d == d
    assert got["shifted"].d > got["same"].d > 0


def test_ks_identical_and_disjoint(spark):
    # identical cohorts -> D = 0; disjoint supports -> D = 1
    ident = [("g", float(i % 10), c) for i in range(40) for c in (True, False)]
    df = spark.createDataFrame(ident, "g string, v double, c boolean")
    assert grouped_ks(df, ["g"], "v", "c").collect()[0].d == 0.0
    disj = [("g", float(i), True) for i in range(10)] + [
        ("g", float(i + 100), False) for i in range(10)
    ]
    df2 = spark.createDataFrame(disj, "g string, v double, c boolean")
    assert grouped_ks(df2, ["g"], "v", "c").collect()[0].d == 1.0


def test_ks_empty_cohort_excluded_and_expression(spark):
    rows = [("g", float(i), i) for i in range(20)] + [("one", 1.0, 0)]
    df = spark.createDataFrame(rows, "g string, v double, i long")
    out = {r.g: r for r in grouped_ks(df, ["g"], "v", _F.col("i") % 2 == 0).collect()}
    assert "g" in out and out["g"].n1 == 10 and out["g"].n2 == 10
    assert "one" not in out  # only cohort-1 rows -> excluded


# ---------------------------------------------------------------------------
# Exact-moment Welch t-test
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import grouped_welch


def _brute_welch(pairs, scale):
    xs1 = [math.floor(v * scale) for v, c in pairs if c]
    xs2 = [math.floor(v * scale) for v, c in pairs if not c]
    n1, n2 = len(xs1), len(xs2)
    s1, s2 = sum(xs1), sum(xs2)
    ss1, ss2 = sum(x * x for x in xs1), sum(x * x for x in xs2)
    m1 = s1 / (scale * n1)
    m2 = s2 / (scale * n2)
    se1 = ((n1 * ss1 - s1 * s1) / (n1 * (n1 - 1) * scale * scale)) / n1
    se2 = ((n2 * ss2 - s2 * s2) / (n2 * (n2 - 1) * scale * scale)) / n2
    se = se1 + se2
    t = (m1 - m2) / math.sqrt(se)
    dfw = (se * se) / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    return n1, n2, s1, s2, m1 - m2, t, dfw


def test_welch_matches_exact_spec(spark):
    rng = _random.Random(145)
    rows = []
    for g, shift in (("null", 0.0), ("shifted", 2.5)):
        for _ in range(200):
            c = rng.random() < 0.5
            v = rng.gauss(10.0, 3.0) + (shift if c else 0.0)
            rows.append((g, v, c))
    df = spark.createDataFrame(rows, "g string, v double, c boolean")
    got = {r.g: r for r in grouped_welch(df, ["g"], "v", "c", scale=1000).collect()}
    for g in ("null", "shifted"):
        n1, n2, s1, s2, md, t, dfw = _brute_welch(
            [(v, c) for gg, v, c in rows if gg == g], 1000
        )
        r = got[g]
        assert (r.n1, r.n2, int(r.sum1_q), int(r.sum2_q)) == (n1, n2, s1, s2)
        assert r.mean_diff == md and r.t == t and r.df_welch == dfw
    assert abs(got["shifted"].t) > 3.5 and abs(got["null"].t) < 3


def test_welch_exclusions(spark):
    rows = [
        ("tiny", 1.0, True), ("tiny", 2.0, False), ("tiny", 3.0, False),
        ("flat", 1.0, True), ("flat", 1.0, True),
        ("flat", 1.0, False), ("flat", 1.0, False),
        ("half", 1.0, True), ("half", 1.0, True),       # var1 = 0
        ("half", 1.0, False), ("half", 3.0, False),     # var2 > 0 -> keep
    ]
    df = spark.createDataFrame(rows, "g string, v double, c boolean")
    got = {r.g: r for r in grouped_welch(df, ["g"], "v", "c").collect()}
    assert "tiny" not in got    # n1 < 2
    assert "flat" not in got    # both variances zero
    assert "half" in got and got["half"].t < 0  # cohort-2 mean is higher


# ---------------------------------------------------------------------------
# Cliff's delta effect size
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import grouped_cliffs_delta


def _brute_cliffs(pairs):
    xs = [v for v, c in pairs if c]
    ys = [v for v, c in pairs if not c]
    gt = sum(1 for x in xs for y in ys if x > y)
    lt = sum(1 for x in xs for y in ys if x < y)
    ties = sum(1 for x in xs for y in ys if x == y)
    return len(xs), len(ys), gt, lt, ties, (gt - lt) / (len(xs) * len(ys))


def test_cliffs_matches_brute_with_ties(spark):
    rng = _random.Random(147)
    rows = []
    for g, shift in (("same", 0), ("shifted", 3)):
        for _ in range(120):
            c = rng.random() < 0.4
            v = rng.randrange(0, 12) + (shift if c else 0)
            rows.append((g, float(v), c))
    df = spark.createDataFrame(rows, "g string, v double, c boolean")
    got = {r.g: r for r in grouped_cliffs_delta(df, ["g"], "v", "c").collect()}
    for g in ("same", "shifted"):
        n1, n2, gt, lt, ties, delta = _brute_cliffs(
            [(v, c) for gg, v, c in rows if gg == g]
        )
        r = got[g]
        assert (r.n1, r.n2) == (n1, n2)
        assert (int(r.gt_pairs), int(r.lt_pairs), int(r.tie_pairs)) == (gt, lt, ties)
        assert r.delta == delta
    assert got["shifted"].delta > 0.5 > abs(got["same"].delta)


def test_cliffs_auc_identity(spark):
    # delta = 2*AUC - 1 when the "score" is the value and cohort 1 = positive
    rng = _random.Random(148)
    rows = [("g", float(rng.randrange(0, 9)), rng.random() < 0.5) for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, v double, c boolean")
    d = grouped_cliffs_delta(df, ["g"], "v", "c").collect()[0].delta
    auc = grouped_auc(df, ["g"], "v", "c").collect()[0].auc
    assert abs(d - (2.0 * auc - 1.0)) < 1e-12


def test_cliffs_extremes_and_exclusions(spark):
    disj = [("g", float(i + 100), True) for i in range(8)] + [
        ("g", float(i), False) for i in range(5)
    ]
    df = spark.createDataFrame(disj, "g string, v double, c boolean")
    assert grouped_cliffs_delta(df, ["g"], "v", "c").collect()[0].delta == 1.0
    ident = [("g", float(i % 4), c) for i in range(24) for c in (True, False)]
    df2 = spark.createDataFrame(ident, "g string, v double, c boolean")
    assert grouped_cliffs_delta(df2, ["g"], "v", "c").collect()[0].delta == 0.0
    # empty cohort -> excluded; NULL/NaN value rows dropped
    rows = [("one", 1.0, True), ("ok", None, True), ("ok", float("nan"), False)] + [
        ("ok", float(i), i % 2 == 0) for i in range(10)
    ]
    df3 = spark.createDataFrame(rows, "g string, v double, c boolean")
    out = {r.g: r for r in grouped_cliffs_delta(df3, ["g"], "v", "c").collect()}
    assert "one" not in out and out["ok"].n1 == 5 and out["ok"].n2 == 5


# ---------------------------------------------------------------------------
# Deterministic hash-randomization test
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import randomization_test


def _brute_randomization(rows, replicates, scale, seed):
    """Independent Python reimplementation of the spec (bigint exact)."""
    by_g = {}
    for g, key, v, c in rows:
        if v is None or v != v or c is None:
            continue
        by_g.setdefault(g, []).append((key, math.floor(v * scale), c))
    out = {}
    for g, items in by_g.items():
        n1 = sum(1 for _, _, c in items if c)
        n2 = len(items) - n1
        if n1 == 0 or n2 == 0:
            continue
        s1 = sum(x for _, x, c in items if c)
        s2 = sum(x for _, x, c in items if not c)
        n = n1 + n2
        obs = abs(s1 * n2 - s2 * n1)
        rv = ne = 0
        for b in range(replicates):
            n1b = s1b = 0
            for key, xq, _ in items:
                payload = f"{seed}|{key}|{b}".encode()
                u = int(_hashlib.md5(payload).hexdigest()[:15], 16)
                if u * n < n1 * (1 << 60):
                    n1b += 1
                    s1b += xq
            n2b, s2b = n - n1b, (s1 + s2) - s1b
            if n1b == 0 or n2b == 0:
                continue
            rv += 1
            if abs(s1b * n2b - s2b * n1b) * (n1 * n2) >= obs * (n1b * n2b):
                ne += 1
        m1, m2 = s1 / (scale * n1), s2 / (scale * n2)
        out[g] = (n1, n2, m1 - m2, rv, ne, (1 + ne) / (1 + rv))
    return out


def test_randomization_matches_independent_spec(spark):
    rng = _random.Random(149)
    rows = []
    for g, shift in (("null", 0.0), ("weak", 0.6), ("strong", 50.0)):
        for i in range(80):
            c = rng.random() < 0.5
            rows.append((g, f"{g}-{i}", rng.gauss(10.0, 2.0) + (shift if c else 0.0), c))
    df = spark.createDataFrame(rows, "g string, k string, v double, c boolean")
    got = {
        r.g: r
        for r in randomization_test(
            df, ["g"], "v", "c", ["k"], replicates=24, scale=1000, seed=9
        ).collect()
    }
    want = _brute_randomization(rows, 24, 1000, 9)
    assert set(got) == set(want)
    for g, (n1, n2, md, rv, ne, p) in want.items():
        r = got[g]
        assert (r.n1, r.n2, r.r_valid, r.n_extreme) == (n1, n2, rv, ne)
        assert r.mean_diff == md and r.p == p
    # laws: a huge planted shift is never matched by a random relabeling,
    # so p hits the add-one floor exactly; the null group doesn't
    assert got["strong"].p == 1.0 / (1 + got["strong"].r_valid)
    assert got["null"].p > 0.05


def test_randomization_partition_invariance_and_exclusions(spark):
    rows = [("g", f"k{i}", float(i % 7), i % 3 == 0) for i in range(60)]
    rows += [("solo", "a", 1.0, True), ("solo", "b", 2.0, True)]  # one cohort only
    rows += [("g", "nan", float("nan"), True), ("g", "nul", None, False)]
    df = spark.createDataFrame(rows, "g string, k string, v double, c boolean")
    a = randomization_test(df, ["g"], "v", "c", ["k"], replicates=16).collect()
    b = randomization_test(
        df.repartition(7), ["g"], "v", "c", ["k"], replicates=16
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    gs = {r.g for r in a}
    assert gs == {"g"}  # "solo" excluded
    r = a[0]
    assert r.n1 + r.n2 == 60 and 0.0 < r.p <= 1.0 and r.r_valid <= 16


def test_randomization_contract_errors(spark):
    df = spark.createDataFrame([("g", "k", 1.0, True)], "g string, k string, v double, c boolean")
    with pytest.raises(ValueError):
        randomization_test(df, ["g"], "v", "c", ["k"], replicates=3)
    with pytest.raises(ValueError):
        randomization_test(df, ["g"], "v", "c", ["k"], scale=0)
    with pytest.raises(ValueError):
        randomization_test(df, ["g"], "v", "c", [])


# ---------------------------------------------------------------------------
# Cohen's kappa
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import grouped_cohens_kappa


def _brute_kappa(pairs):
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    cats = {c for p in pairs for c in p}
    pe = sum(
        sum(1 for a, _ in pairs if a == c) * sum(1 for _, b in pairs if b == c)
        for c in cats
    )
    den = n * n - pe
    if den == 0:
        return None
    return n, agree, pe, (n * agree - pe) / den


def test_kappa_matches_brute(spark):
    rng = _random.Random(152)
    cats = ["pos", "neg", "neu"]
    rows = []
    for g, noise in (("good", 0.1), ("random", 1.0)):
        for _ in range(300):
            a = rng.choice(cats)
            b = rng.choice(cats) if rng.random() < noise else a
            rows.append((g, a, b))
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = {r.g: r for r in grouped_cohens_kappa(df, ["g"], "a", "b").collect()}
    for g in ("good", "random"):
        want = _brute_kappa([(a, b) for gg, a, b in rows if gg == g])
        n, agree, pe, kappa = want
        r = got[g]
        assert (r.n, r.agree, int(r.pe_num)) == (n, agree, pe)
        assert r.kappa == kappa
    assert got["good"].kappa > 0.8 > abs(got["random"].kappa)


def test_kappa_extremes_and_exclusions(spark):
    # perfect agreement over >1 category -> kappa = 1
    rows = [("p", c, c) for c in "xyz" for _ in range(5)]
    # systematic disagreement worse than chance -> kappa < 0
    rows += [("anti", "x", "y"), ("anti", "y", "x")] * 10
    # both constant on the same category -> den = 0 -> excluded
    rows += [("const", "x", "x")] * 5
    # NULLs dropped
    rows += [("p", None, "x"), ("p", "x", None)]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = {r.g: r for r in grouped_cohens_kappa(df, ["g"], "a", "b").collect()}
    assert got["p"].kappa == 1.0 and got["p"].n == 15
    assert got["anti"].kappa < 0
    assert "const" not in got


def test_kappa_disjoint_categories(spark):
    # raters with DISJOINT vocabularies: pe = 0, kappa = 0 (NOT dropped)
    rows = [("d", "x", "y")] * 6 + [("d", "x", "z")] * 4
    df = spark.createDataFrame(rows, "g string, a string, b string")
    r = grouped_cohens_kappa(df, ["g"], "a", "b").collect()
    assert len(r) == 1 and r[0].kappa == 0.0 and int(r[0].pe_num) == 0
    # and the DuckDB twin agrees (left-join coalesce on both engines)
    import duckdb
    from btl_bloomfilter_spark.operators.stats import grouped_cohens_kappa_sql

    con = duckdb.connect()
    con.sql("CREATE VIEW t AS SELECT 'd' AS g, 'x' AS a, "
            "CASE WHEN range < 6 THEN 'y' ELSE 'z' END AS b FROM range(10)")
    w = con.sql(grouped_cohens_kappa_sql("t", "g", "a", "b")).fetchall()
    assert len(w) == 1 and w[0][4] == 0.0 and w[0][3] == "0"


# ---------------------------------------------------------------------------
# Simpson diversity + autocorrelation
# ---------------------------------------------------------------------------

from btl_bloomfilter_spark.operators.stats import grouped_autocorr, grouped_simpson


def test_simpson_matches_brute_and_endpoints(spark):
    rng = _random.Random(159)
    rows = []
    for g, cats in (("uniform", 8), ("skew", 3)):
        for i in range(400):
            c = f"c{i % cats}" if g == "uniform" else ("hot" if rng.random() < 0.9 else f"c{i % 3}")
            rows.append((g, c))
    rows += [("mono", "only")] * 7 + [("g", None)]
    df = spark.createDataFrame(rows, "g string, c string")
    got = {r.g: r for r in grouped_simpson(df, ["g"], "c").collect()}
    for g in ("uniform", "skew", "mono"):
        items = [c for gg, c in rows if gg == g and c is not None]
        n = len(items)
        ss = sum(v * v for v in __import__("collections").Counter(items).values())
        r = got[g]
        assert (r.n, int(r.sum_sq)) == (n, ss)
        assert r.hhi == ss / (n * n) and r.inv_simpson == (n * n) / ss
    assert got["mono"].hhi == 1.0 and got["mono"].inv_simpson == 1.0
    assert abs(got["uniform"].inv_simpson - 8.0) < 1e-9  # exactly uniform -> k
    assert got["skew"].hhi > 0.7 > got["uniform"].hhi
    assert "g" not in got  # only-NULL group vanishes


def _brute_autocorr(rows, lag, scale):
    q = sorted(((o, math.floor(v * scale)) for o, v in rows), key=lambda t: (t[0], t[1]))
    xs = [x for _, x in q]
    pairs = [(xs[i], xs[i + lag]) for i in range(len(xs) - lag)]
    n = len(pairs)
    sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    num, dx, dy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    if n < 2 or dx <= 0 or dy <= 0:
        return None
    return n, sxy, num / math.sqrt(dx) / math.sqrt(dy)


def test_autocorr_matches_brute_and_detects_period(spark):
    rng = _random.Random(160)
    rows = []
    series = {}
    for g, period in (("weekly", 7), ("noise", 0)):
        seq = []
        for i in range(400):
            base = 10.0 * (i % period == 0) if period else 0.0
            seq.append((i, base + rng.gauss(0, 1)))
        series[g] = seq
        rows += [(g, o, v) for o, v in seq]
    df = spark.createDataFrame(rows, "g string, o long, v double")
    for lag in (1, 7):
        got = {r.g: r for r in grouped_autocorr(df, ["g"], "v", "o", lag=lag, scale=1000).collect()}
        for g in ("weekly", "noise"):
            want = _brute_autocorr(series[g], lag, 1000)
            n, sxy, ac = want
            r = got[g]
            assert (r.n_pairs, int(r.sxy), r.lag) == (n, sxy, lag)
            assert r.autocorr == ac
        if lag == 7:
            assert got["weekly"].autocorr > 0.5 > abs(got["noise"].autocorr)


def test_autocorr_exclusions_and_contracts(spark):
    rows = [("flat", i, 5.0) for i in range(10)] + [("tiny", 0, 1.0), ("tiny", 1, 2.0)]
    df = spark.createDataFrame(rows, "g string, o long, v double")
    got = {r.g: r for r in grouped_autocorr(df, ["g"], "v", "o", lag=1).collect()}
    assert "flat" not in got        # zero variance
    assert "tiny" not in got        # a single pair: dx = 0
    with pytest.raises(ValueError):
        grouped_autocorr(df, ["g"], "v", "o", lag=0)
    with pytest.raises(ValueError):
        grouped_autocorr(df, ["g"], "v", "o", scale=0)

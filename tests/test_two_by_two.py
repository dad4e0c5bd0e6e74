"""2x2 effect measures (operators/stats.two_by_two_effects): brute
parity incl. quantized ln/se, independence OR == 1.0 with
ln_or_micro == 0 exactly, outcome-flip negates ln_or_micro exactly,
transpose invariance of OR (not RR), zero-cell NULLs, CI geometry,
bad flag raises, partition invariance, DuckDB twin."""

import math
import random

import pytest

from btl_bloomfilter_spark.operators.stats import (
    two_by_two_effects,
    two_by_two_effects_sql,
)


def _lnm(x):
    return int(math.floor(math.log(x) * 1e6 + 0.5))


def _brute(pairs):
    n = len(pairs)
    a = sum(1 for e, o in pairs if e and o)
    b = sum(1 for e, o in pairs if e and not o)
    c = sum(1 for e, o in pairs if not e and o)
    d = sum(1 for e, o in pairs if not e and not o)
    out = {"n": n, "a": a, "b": b, "c": c, "d": d}
    out["risk_exposed"] = a / (a + b) if a + b else None
    out["risk_unexposed"] = c / (c + d) if c + d else None
    out["risk_diff"] = (
        a / (a + b) - c / (c + d) if (a + b) and (c + d) else None
    )
    out["risk_ratio"] = (
        float(a * (c + d)) / float(c * (a + b)) if c * (a + b) else None
    )
    out["odds_ratio"] = float(a * d) / float(b * c) if b * c else None
    if min(a, b, c, d) > 0:
        lm = _lnm(a * d) - _lnm(b * c)
        se = math.sqrt(
            (10**12 // a + 10**12 // b + 10**12 // c + 10**12 // d) / 1.0e12
        )
        out.update({
            "ln_or_micro": lm, "ln_or": lm / 1e6, "se_ln_or": se,
            "ci_lo": lm / 1e6 - 1.959964 * se,
            "ci_hi": lm / 1e6 + 1.959964 * se,
        })
    else:
        out.update({"ln_or_micro": None, "ln_or": None, "se_ln_or": None,
                    "ci_lo": None, "ci_hi": None})
    return out


def test_matches_brute(spark):
    rng = random.Random(401)
    rows = []
    for g in range(4):
        pe, po = rng.uniform(0.2, 0.7), rng.uniform(0.2, 0.7)
        for _ in range(400):
            e = rng.random() < pe
            o = rng.random() < (po + 0.2 * e)
            rows.append((g, e, o))
    df = spark.createDataFrame(rows, "g int, e boolean, o boolean")
    got = {r["g"]: r.asDict()
           for r in two_by_two_effects(df, ["g"], "e", "o").collect()}
    for g in range(4):
        want = _brute([(e, o) for gg, e, o in rows if gg == g])
        assert {k: got[g][k] for k in want} == want, g


def test_independence_or_one_exact_and_outcome_flip(spark):
    # ad == bc by construction: a=6,b=3,c=4,d=2
    rows = ([(0, 1, 1)] * 6 + [(0, 1, 0)] * 3 + [(0, 0, 1)] * 4
            + [(0, 0, 0)] * 2)
    df = spark.createDataFrame(rows, "g int, e int, o int")
    r = two_by_two_effects(df, ["g"], "e", "o").collect()[0]
    assert r["odds_ratio"] == 1.0 and r["ln_or_micro"] == 0
    assert r["ci_lo"] < 0.0 < r["ci_hi"]
    # flipping the outcome flag negates ln_or_micro EXACTLY
    rows2 = ([(0, 1, 1)] * 9 + [(0, 1, 0)] * 3 + [(0, 0, 1)] * 4
             + [(0, 0, 0)] * 7)
    df2 = spark.createDataFrame(rows2, "g int, e int, o int")
    fw = two_by_two_effects(df2, ["g"], "e", "o").collect()[0]
    flipped = df2.selectExpr("g", "e", "1 - o AS o")
    bw = two_by_two_effects(flipped, ["g"], "e", "o").collect()[0]
    assert bw["ln_or_micro"] == -fw["ln_or_micro"]
    assert bw["se_ln_or"] == fw["se_ln_or"]


def test_transpose_invariance_of_or_not_rr(spark):
    rows = ([(0, 1, 1)] * 9 + [(0, 1, 0)] * 3 + [(0, 0, 1)] * 4
            + [(0, 0, 0)] * 7)
    df = spark.createDataFrame(rows, "g int, e int, o int")
    fw = two_by_two_effects(df, ["g"], "e", "o").collect()[0]
    tr = two_by_two_effects(df, ["g"], "o", "e").collect()[0]
    assert tr["odds_ratio"] == fw["odds_ratio"]
    assert tr["ln_or_micro"] == fw["ln_or_micro"]
    assert tr["risk_ratio"] != fw["risk_ratio"]


def test_zero_cell_nulls_counts_exact(spark):
    rows = [(0, 1, 1)] * 5 + [(0, 0, 1)] * 3 + [(0, 0, 0)] * 2
    df = spark.createDataFrame(rows, "g int, e int, o int")
    r = two_by_two_effects(df, ["g"], "e", "o").collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (5, 0, 3, 2)
    assert r["odds_ratio"] is None and r["ln_or"] is None
    assert r["ci_lo"] is None and r["se_ln_or"] is None
    assert r["risk_exposed"] == 1.0
    assert r["risk_ratio"] == pytest.approx(5 * 5 / (3 * 5), rel=0)


def test_bad_flag_raises_in_plan(spark):
    df = spark.createDataFrame([(0, 2, 1)], "g int, e int, o int")
    with pytest.raises(Exception, match="0/1 or boolean"):
        two_by_two_effects(df, ["g"], "e", "o").collect()


def test_partition_invariance(spark):
    rng = random.Random(409)
    rows = [(0, rng.random() < 0.5, rng.random() < 0.4) for _ in range(800)]
    df = spark.createDataFrame(rows, "g int, e boolean, o boolean")
    one = two_by_two_effects(df, ["g"], "e", "o").collect()[0]
    two = two_by_two_effects(df.repartition(9, "e"), ["g"], "e", "o").collect()[0]
    assert one == two


def test_duckdb_twin(spark, tmp_path):
    import duckdb
    import pandas as pd

    rng = random.Random(419)
    rows = [
        (rng.randint(0, 4), rng.random() < 0.45, rng.random() < 0.35)
        for _ in range(3000)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "e", "o"])
    p = str(tmp_path / "t22.parquet")
    pdf.to_parquet(p)
    got = (
        two_by_two_effects(spark.read.parquet(p), ["g"], "e", "o")
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW __t AS SELECT * FROM read_parquet('{p}')")
    want = con.sql(
        two_by_two_effects_sql("__t", "g", "e", "o") + " ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_duckdb_twin_bad_flag_error_branches():
    """The SQL twin's error() branches for non-0/1 exposed/outcome
    must actually fire (only the Spark-side raise was exercised
    before; the twin test feeds well-formed 0/1 data)."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "__tbt_bad_e",
        pd.DataFrame([(0, 2, 1)], columns=["g", "e", "o"]),
    )
    with pytest.raises(Exception, match="exposed must be 0/1"):
        con.sql(two_by_two_effects_sql("__tbt_bad_e", "g", "e", "o")).df()
    con.register(
        "__tbt_bad_o",
        pd.DataFrame([(0, 1, -1)], columns=["g", "e", "o"]),
    )
    with pytest.raises(Exception, match="outcome must be 0/1"):
        con.sql(two_by_two_effects_sql("__tbt_bad_o", "g", "e", "o")).df()

"""Dialog validation + budget truncation: planted structural defects,
cross-engine parity (incl. duplicate-index tie determinism), suffix
semantics, single-exchange plans."""
import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.dialog import (
    dialog_stats,
    dialog_stats_sql,
    truncate_to_budget,
    truncate_to_budget_sql,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string"


@pytest.mark.spark
def test_dialog_stats_planted(spark):
    rows = [
        # c1: perfectly well-formed
        ("c1", 0, "user", "hi"), ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "thanks"), ("c1", 3, "assistant", "yw"),
        # c2: alternation break + empty turn
        ("c2", 0, "user", "a"), ("c2", 1, "user", "b"), ("c2", 2, "assistant", ""),
        # c3: index gap, opens with assistant
        ("c3", 0, "assistant", "x"), ("c3", 2, "user", "y"),
        # c4: duplicate index
        ("c4", 0, "user", "p"), ("c4", 0, "tool", "q"),
        # c5: starts at idx 1
        ("c5", 1, "user", "z"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.conv_id: r for r in dialog_stats(df).toPandas().itertuples()}
    assert out["c1"].well_formed
    assert out["c1"].first_role == "user" and out["c1"].last_role == "assistant"
    assert out["c2"].n_alternation_breaks == 1 and out["c2"].n_empty == 1
    assert not out["c2"].well_formed
    assert out["c3"].n_idx_gaps == 1 and out["c3"].first_role == "assistant"
    assert out["c4"].n_idx_dups == 1 and not out["c4"].well_formed
    # duplicate-index tie broken by (idx, role): tool < user is False
    # lexically -> 'tool' first
    assert out["c4"].first_role == "tool"
    assert not out["c5"].well_formed  # min_idx != 0


@pytest.mark.spark
def test_dialog_cross_engine(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(29)
    roles = ["user", "assistant", "tool", None]
    rows = []
    for c in range(80):
        idx = 0
        for _ in range(rng.randint(1, 10)):
            rows.append(
                (f"c{c:03d}", idx, rng.choice(roles),
                 "" if rng.random() < 0.1 else f"w{rng.randint(0, 9)}")
            )
            # occasional gaps and duplicate indices
            idx += rng.choice([0, 1, 1, 1, 2])
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    path = str(tmp_path / "t.parquet")
    pdf.to_parquet(path)

    got = (
        dialog_stats(spark.read.parquet(path))
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    want = (
        con.sql(dialog_stats_sql("t"))
        .df().sort_values("conv_id").reset_index(drop=True)
    )
    for c in ("n_turns", "first_role", "last_role", "n_empty",
              "n_alternation_breaks", "n_idx_gaps", "n_idx_dups", "well_formed"):
        assert got[c].tolist() == want[c].tolist(), c


@pytest.mark.spark
def test_truncate_to_budget_semantics(spark):
    rows = [
        ("c1", 0, "user", "a b c d"),        # 4 tokens
        ("c1", 1, "assistant", "e f g"),     # 3
        ("c1", 2, "user", "h i"),            # 2
        ("c2", 0, "user", " ".join(["x"] * 50)),  # alone over budget
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = truncate_to_budget(df, 6).toPandas()
    kept = {(r.conv_id, r.turn_idx) for r in out.itertuples()}
    # c1: suffix sums from the end: idx2=2, idx1=5, idx0=9 -> keep 1,2
    assert kept == {("c1", 1), ("c1", 2)}
    # the kept suffix respects the budget
    assert out.groupby("conv_id").turn_tokens.sum().le(6).all()


@pytest.mark.spark
def test_truncate_cross_engine(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(41)
    rows = [
        (f"c{c}", i, "user", " ".join("tok" for _ in range(rng.randint(0, 30))))
        for c in range(50)
        for i in range(rng.randint(1, 12))
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    path = str(tmp_path / "t.parquet")
    pdf.to_parquet(path)
    got = (
        truncate_to_budget(spark.read.parquet(path), 64)
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    want = (
        con.sql(truncate_to_budget_sql("t", 64))
        .df().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["suffix_tokens"].tolist() == want["suffix_tokens"].tolist()


@pytest.mark.spark
def test_dialog_single_exchange(spark):
    rows = [("c1", 0, "user", "a"), ("c1", 1, "assistant", "b")]
    df = spark.createDataFrame(rows, SCHEMA)
    for q in (dialog_stats(df), truncate_to_budget(df, 10)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") - plan.count("ReusedExchange") == 1, plan

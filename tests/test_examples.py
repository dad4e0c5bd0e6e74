"""SFT example assembly: planted hand-built contexts, window edge
cases (first turn, short history, NULLs), cross-engine parity,
single-exchange plan."""
import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.examples import sft_examples, sft_examples_sql


@pytest.mark.spark
def test_sft_examples_planted(spark):
    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "how are you"),
        ("c1", 3, "tool", "{}"),
        ("c1", 4, "assistant", "fine"),
        ("c2", 0, "assistant", "opening"),  # no context at all
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    out = {
        (r.conv_id, r.turn_idx): r
        for r in sft_examples(df, n_context=2).toPandas().itertuples()
    }
    assert len(out) == 3
    assert out[("c1", 1)].context == "user: hi"
    assert out[("c1", 1)].n_context_turns == 1
    # only the 2 turns immediately preceding turn 4
    assert out[("c1", 4)].context == "user: how are you\ntool: {}"
    assert out[("c1", 4)].target == "fine"
    assert out[("c2", 0)].context == "" and out[("c2", 0)].n_context_turns == 0


@pytest.mark.spark
def test_sft_examples_cross_engine(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(13)
    roles = ["user", "assistant", "tool", None]
    rows = []
    for c in range(60):
        for i in range(rng.randint(1, 12)):
            txt = None if rng.random() < 0.05 else f"t{c}-{i} " + "x" * rng.randint(0, 20)
            rows.append((f"c{c:03d}", i, rng.choice(roles), txt))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    path = str(tmp_path / "turns.parquet")
    pdf.to_parquet(path)

    got = (
        sft_examples(spark.read.parquet(path), n_context=3)
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW turns AS SELECT * FROM '{path}'")
    want = (
        con.sql(sft_examples_sql("turns", n_context=3))
        .df().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert got["context"].tolist() == want["context"].tolist()
    assert got["target"].tolist() == want["target"].tolist()
    assert got["n_context_turns"].tolist() == want["n_context_turns"].tolist()


@pytest.mark.spark
def test_sft_examples_single_exchange(spark):
    rows = [("c1", 0, "user", "a"), ("c1", 1, "assistant", "b")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    plan = sft_examples(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1, plan

"""Dialog validation + budget truncation: planted structural defects,
cross-engine parity (incl. duplicate-index tie determinism), suffix
semantics, single-exchange plans."""
import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.dialog import (
    conversation_shingles,
    dialog_stats,
    dialog_stats_sql,
    near_dup_conversations,
    near_dup_conversations_sql,
    tool_sequences,
    tool_sequences_sql,
    truncate_to_budget,
    truncate_to_budget_sql,
)

TOOL_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"

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


def _turn(c, i, txt):
    return (c, i, "user", txt)


@pytest.mark.spark
def test_near_dup_conversations_planted(spark):
    # A: 6 turns; B: A minus last turn -> w=3 shingles 4 vs 3, all of
    # B's shared => jaccard 3/4.  C unrelated.  D/E: identical 2-turn
    # convs (< w) -> single equal shingle => 1.0.
    rows = (
        [_turn("A", i, f"ta{i}") for i in range(6)]
        + [_turn("B", i, f"ta{i}") for i in range(5)]
        + [_turn("C", i, f"tc{i}") for i in range(6)]
        + [_turn("D", i, f"td{i}") for i in range(2)]
        + [_turn("E", i, f"td{i}") for i in range(2)]
    )
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r.conv_a, r.conv_b): r.jaccard
        for r in near_dup_conversations(df, w=3, threshold=0.5).collect()
    }
    assert got == {("A", "B"): 0.75, ("D", "E"): 1.0}
    # an edited MIDDLE turn only perturbs the w shingles covering it
    rows2 = rows + [_turn("F", i, f"ta{i}" if i != 3 else "EDIT") for i in range(6)]
    df2 = spark.createDataFrame(rows2, SCHEMA)
    got2 = {
        (r.conv_a, r.conv_b): r.jaccard
        for r in near_dup_conversations(df2, w=3, threshold=0.1).collect()
    }
    # A vs F: 4 shingles each, 1 shared (the run not covering idx 3)
    assert got2[("A", "F")] == pytest.approx(1 / 7, abs=1e-6)


@pytest.mark.spark
def test_near_dup_cap_and_short(spark):
    # a boilerplate opening shared by many convs: the capped universe
    # drops the hot shingle, so boilerplate-only overlap yields no pair
    rows = []
    for c in range(20):
        rows += [_turn(f"c{c:02d}", 0, "hello"), _turn(f"c{c:02d}", 1, "hi"),
                 _turn(f"c{c:02d}", 2, f"unique{c}")]
    df = spark.createDataFrame(rows, SCHEMA)
    uncapped = near_dup_conversations(df, w=2, threshold=0.2)
    capped = near_dup_conversations(df, w=2, threshold=0.2, max_conv_freq=5)
    assert uncapped.count() == 20 * 19 // 2  # all pairs share hello+hi gram
    assert capped.count() == 0
    # single-turn convs use the whole-conversation fallback shingle
    one = spark.createDataFrame(
        [_turn("x", 0, "same"), _turn("y", 0, "same")], SCHEMA
    )
    assert near_dup_conversations(one, w=3, threshold=0.9).count() == 1


@pytest.mark.spark
def test_near_dup_cross_engine(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(7)
    rows = []
    for c in range(60):
        n = rng.randint(1, 12)
        base = [f"w{rng.randint(0, 30)} w{rng.randint(0, 30)}" for _ in range(n)]
        rows += [(f"c{c:03d}", i, "user", base[i]) for i in range(n)]
        if rng.random() < 0.4:  # drop-last-turn variant
            rows += [(f"c{c:03d}_v", i, "user", base[i]) for i in range(max(1, n - 1))]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    path = str(tmp_path / "t.parquet")
    pdf.to_parquet(path)
    got = (
        near_dup_conversations(
            spark.read.parquet(path), w=2, threshold=0.3, max_conv_freq=10
        )
        .toPandas().sort_values(["conv_a", "conv_b"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW tt AS SELECT * FROM '{path}'")
    want = (
        con.sql(near_dup_conversations_sql("tt", w=2, threshold=0.3, max_conv_freq=10))
        .df().sort_values(["conv_a", "conv_b"]).reset_index(drop=True)
    )
    assert len(got) > 0
    assert got["conv_a"].tolist() == want["conv_a"].tolist()
    assert got["conv_b"].tolist() == want["conv_b"].tolist()
    assert got["jaccard"].tolist() == want["jaccard"].tolist()


@pytest.mark.spark
def test_tool_sequences_planted(spark):
    rows = [
        # c1 tools in idx order: a, b, a, b (NULL-tool turns skipped)
        ("c1", 0, "tool", "x", "a"), ("c1", 1, "user", "x", None),
        ("c1", 2, "tool", "x", "b"), ("c1", 3, "tool", "x", "a"),
        ("c1", 5, "tool", "x", "b"),
        # c2: a, b
        ("c2", 0, "tool", "x", "a"), ("c2", 1, "tool", "x", "b"),
        # c3: single tool -> no bigram
        ("c3", 0, "tool", "x", "a"),
    ]
    df = spark.createDataFrame(rows, TOOL_SCHEMA)
    got = {r.seq: (r.n_occurrences, r.n_convs)
           for r in tool_sequences(df, n=2).collect()}
    assert got == {"a>b": (3, 2), "b>a": (1, 1)}
    # per-position counting: a chain twice in one conv counts twice
    assert got["a>b"][0] == 3 and got["a>b"][1] == 2
    # min_count filters
    assert tool_sequences(df, n=2, min_count=2).count() == 1
    # separator-bearing tool name raises (rendering would be ambiguous)
    bad = spark.createDataFrame(
        [("c", 0, "tool", "x", "a>b"), ("c", 1, "tool", "x", "c")], TOOL_SCHEMA
    )
    with pytest.raises(Exception, match="separator"):
        tool_sequences(bad, n=2).collect()


@pytest.mark.spark
def test_tool_sequences_cross_engine(spark, tmp_path):
    import duckdb
    import random

    rng = random.Random(13)
    rows = []
    for c in range(80):
        for i in range(rng.randint(1, 15)):
            rows.append(
                (f"c{c:03d}", i, "tool", "x",
                 None if rng.random() < 0.3 else f"tool{rng.randint(0, 5):02d}")
            )
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    path = str(tmp_path / "t.parquet")
    pdf.to_parquet(path)
    for n, mc in ((2, 1), (3, 2)):
        got = (
            tool_sequences(spark.read.parquet(path), n=n, min_count=mc)
            .toPandas().sort_values("seq").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW tt AS SELECT * FROM '{path}'")
        want = (
            con.sql(tool_sequences_sql("tt", n=n, min_count=mc))
            .df().sort_values("seq").reset_index(drop=True)
        )
        assert len(got) > 0
        assert got["seq"].tolist() == want["seq"].tolist()
        assert got["n_occurrences"].tolist() == want["n_occurrences"].tolist()
        assert got["n_convs"].tolist() == want["n_convs"].tolist()


@pytest.mark.spark
def test_near_dup_no_cartesian(spark):
    rows = [_turn("A", i, f"t{i}") for i in range(4)] + [
        _turn("B", i, f"t{i}") for i in range(3)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    q = near_dup_conversations(df, w=2, threshold=0.1)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # shingle table is distinct per (id, shingle)
    sh = conversation_shingles(df, w=2)
    assert sh.count() == sh.distinct().count()


@pytest.mark.spark
def test_null_turn_idx_cross_engine(spark, tmp_path):
    # NULL turn_idx: Spark ASC windows put NULLS FIRST while DuckDB
    # defaults to NULLS LAST — the twins pin NULLS FIRST/LAST
    # explicitly; this pins the pin
    import duckdb

    pdf = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "b", "b"],
            "turn_idx": pd.array([None, 0, 1, None, None], dtype="Int32"),
            "role": ["tool", "user", "assistant", "user", "tool"],
            "text": ["x", "hi", "yo", "p", "q"],
        }
    )
    path = str(tmp_path / "t.parquet")
    pdf.to_parquet(path)
    got = (
        dialog_stats(spark.read.parquet(path))
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW tt AS SELECT * FROM '{path}'")
    want = (
        con.sql(dialog_stats_sql("tt"))
        .df().sort_values("conv_id").reset_index(drop=True)
    )
    for c in ("n_turns", "first_role", "last_role", "n_empty",
              "n_alternation_breaks", "n_idx_gaps", "n_idx_dups"):
        assert got[c].tolist() == want[c].tolist(), c
    # NULL-idx conv cannot be well_formed (min_idx is not 0)
    assert not bool(got[got.conv_id == "a"].well_formed.iloc[0])


@pytest.mark.spark
def test_truncate_negative_tokens_clamped(spark):
    # a corrupt negative precomputed count must not break suffix
    # contiguity (clamped to 0 in both engines)
    import duckdb

    rows = [("c1", 0, 5), ("c1", 1, -9), ("c1", 2, 3)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tok long")
    out = truncate_to_budget(df, 4, tokens_col="tok").toPandas()
    kept = sorted(out.turn_idx.tolist())
    # suffix sums with clamp: idx2=3, idx1=3, idx0=8 -> keep {1, 2}
    assert kept == [1, 2]
    con = duckdb.connect()
    con.sql("CREATE TABLE tt AS SELECT * FROM (VALUES "
            "('c1', 0, 5), ('c1', 1, -9), ('c1', 2, 3)) t(conv_id, turn_idx, tok)")
    want = con.sql(truncate_to_budget_sql("tt", 4, tokens_expr="tok")).df()
    assert sorted(want.turn_idx.tolist()) == kept


@pytest.mark.spark
def test_dialog_single_exchange(spark):
    rows = [("c1", 0, "user", "a"), ("c1", 1, "assistant", "b")]
    df = spark.createDataFrame(rows, SCHEMA)
    for q in (dialog_stats(df), truncate_to_budget(df, 10)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") - plan.count("ReusedExchange") == 1, plan


@pytest.mark.spark
def test_repeated_turns_planted(spark):
    from btl_bloomfilter_spark.operators.dialog import repeated_turns

    rows = [
        ("c1", 0, "user", "hello"),
        ("c1", 1, "assistant", "hi there"),
        ("c2", 0, "user", "hello"),          # cross-conv duplicate
        ("c2", 1, "assistant", "unique a"),
        ("c3", 0, "tool", "hello"),          # third occurrence, new role
        ("c3", 1, "assistant", None),        # NULL groups with ''
        ("c3", 2, "assistant", ""),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    out = {r.text_md5: r for r in repeated_turns(df, min_count=2).collect()}
    import hashlib

    h = hashlib.md5(b"hello").hexdigest()
    e = hashlib.md5(b"").hexdigest()
    assert set(out) == {h, e}
    assert (out[h].n_occurrences, out[h].n_convs, out[h].n_roles) == (3, 3, 2)
    assert out[h].text_len == 5
    # NULL and '' are both "empty turn": one group, two occurrences
    assert (out[e].n_occurrences, out[e].n_convs, out[e].n_roles) == (2, 1, 1)
    assert out[e].text_len == 0


@pytest.mark.spark
def test_role_transitions_planted_and_null_role(spark):
    from btl_bloomfilter_spark.operators.dialog import role_transitions

    rows = [
        ("c1", 0, "user"),
        ("c1", 1, "assistant"),
        ("c1", 2, "user"),
        ("c2", 0, "user"),
        ("c2", 1, None),        # NULL mid-dialog → '' node, NOT a start
        ("c2", 2, "assistant"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {(r.from_role, r.to_role): (r.n, r.n_convs) for r in role_transitions(df).collect()}
    assert got == {
        ("<start>", "user"): (2, 2),
        ("user", "assistant"): (1, 1),
        ("assistant", "user"): (1, 1),
        ("user", ""): (1, 1),
        ("", "assistant"): (1, 1),
    }


@pytest.mark.spark
def test_role_transitions_duplicate_idx_cross_engine(spark, tmp_path):
    """Duplicate turn indices: the (idx, role) tie-break must make
    both engines see one row sequence."""
    import duckdb

    from btl_bloomfilter_spark.operators.dialog import role_transitions, role_transitions_sql

    rows = [
        ("c1", 0, "user"), ("c1", 1, "tool"), ("c1", 1, "assistant"),  # dup idx
        ("c1", 2, "user"), ("c2", 0, None), ("c2", 0, "assistant"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    got = sorted(
        (r.from_role, r.to_role, r.n, r.n_convs) for r in role_transitions(df).collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r) for r in con.sql(role_transitions_sql(f"read_parquet('{p}/*.parquet')")).fetchall()
    )
    assert got == want

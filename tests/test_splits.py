"""Deterministic hash-split / sampling + C4 line filter tests.

Cross-engine: every expression must agree with its DuckDB SQL twin
value-for-value (the md5-hex bucket is the shared primitive).
Laws: split proportions, repartition/run stability, nested-rate
monotonicity (same-seed samples are subsets, NOT disjoint),
seed decorrelation, per-stratum rates.
"""
import pandas as pd
import pytest

from pyspark.sql import functions as F

from btl_bloomfilter_spark.functions import splits as S
from btl_bloomfilter_spark.functions import textstats as T


@pytest.mark.spark
def test_hash_bucket_cross_engine(spark, tmp_path):
    import duckdb

    rows = [(i, f"doc-{i}", w) for i, w in enumerate(
        ["alpha", "beta", "naïve café", "中文 text", "", "x|y", "a'b"]
    )]
    pdf = pd.DataFrame(rows, columns=["id", "name", "word"])
    path = str(tmp_path / "k.parquet")
    pdf.to_parquet(path)

    got = (
        spark.read.parquet(path)
        .select(
            "id",
            S.hash_bucket(["id"], 1000, seed=7).alias("b1"),
            S.hash_bucket(["name", "word"], 12345, seed="s").alias("b2"),
            S.assign_split(["id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7).alias("sp"),
            S.sample_flag(["id"], 0.5, seed=3).alias("fl"),
            S.stratified_sample_flag(
                ["id"], "word", {"alpha": 1.0, "beta": 0.0}, default_rate=0.5, seed=3
            ).alias("st"),
        )
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    want = con.sql(
        f"SELECT id, {S.hash_bucket_sql(['id'], 1000, seed=7)} AS b1, "
        f"{S.hash_bucket_sql(['name', 'word'], 12345, seed='s')} AS b2, "
        f"{S.assign_split_sql(['id'], {'train': 0.8, 'val': 0.1, 'test': 0.1}, seed=7)} AS sp, "
        f"{S.sample_flag_sql(['id'], 0.5, seed=3)} AS fl, "
        f"{S.stratified_sample_flag_sql(['id'], 'word', {'alpha': 1.0, 'beta': 0.0}, default_rate=0.5, seed=3)} AS st "
        f"FROM t ORDER BY id"
    ).df().reset_index(drop=True)
    for c in ("b1", "b2", "sp", "fl", "st"):
        assert got[c].tolist() == want[c].tolist(), c
    # stratum overrides hold exactly at the rate edges
    assert bool(got.st[0]) is True   # alpha rate 1.0
    assert bool(got.st[1]) is False  # beta rate 0.0


@pytest.mark.spark
def test_split_laws(spark):
    n = 5000
    df = spark.range(n).select(F.col("id"))
    sp = df.select(
        "id",
        S.assign_split(["id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed=1).alias("sp"),
    ).cache()
    counts = {r["sp"]: r["n"] for r in sp.groupBy("sp").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n  # total partition: every row assigned exactly once
    # binomial 5-sigma bands
    import math

    for name, frac in (("train", 0.8), ("val", 0.1), ("test", 0.1)):
        sigma = math.sqrt(n * frac * (1 - frac))
        assert abs(counts[name] - n * frac) < 5 * sigma, (name, counts[name])

    # stability: repartitioning must not flip any assignment
    sp2 = df.repartition(13).select(
        "id",
        S.assign_split(["id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed=1).alias("sp2"),
    )
    diff = sp.join(sp2, "id").where(F.col("sp") != F.col("sp2")).count()
    assert diff == 0
    sp.unpersist()

    # nested rates with one seed are monotone (subsets, NOT disjoint)
    flags = df.select(
        "id",
        S.sample_flag(["id"], 0.01, seed=9).alias("s1"),
        S.sample_flag(["id"], 0.10, seed=9).alias("s10"),
        S.sample_flag(["id"], 0.90, seed=9).alias("s90"),
    )
    assert flags.where(F.col("s1") & ~F.col("s10")).count() == 0  # 1% ⊆ 10%
    assert flags.where(F.col("s10") & ~F.col("s90")).count() == 0  # 10% ⊆ 90%

    # different seed decorrelates: overlap of two 10% samples ≈ 1%
    both = df.select(
        S.sample_flag(["id"], 0.10, seed=9).alias("a"),
        S.sample_flag(["id"], 0.10, seed=10).alias("b"),
    ).where(F.col("a") & F.col("b")).count()
    assert both < n * 0.03


@pytest.mark.spark
def test_stratified_rates(spark):
    n = 3000
    df = spark.range(n).select(
        "id", (F.when(F.col("id") % 3 == 0, "en").otherwise("rare")).alias("lang")
    )
    out = df.select(
        "lang",
        S.stratified_sample_flag(["id"], "lang", {"en": 0.1}, default_rate=1.0, seed=2).alias("s"),
    )
    rates = {
        r["lang"]: r["rate"]
        for r in out.groupBy("lang")
        .agg(F.avg(F.col("s").cast("double")).alias("rate"))
        .collect()
    }
    assert rates["rare"] == 1.0
    assert 0.05 < rates["en"] < 0.16


def test_split_validation():
    with pytest.raises(ValueError):
        S.assign_split(["id"], {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        S.sample_flag(["id"], 1.5)
    with pytest.raises(ValueError):
        S.stratified_sample_flag(["id"], "s", {"x": -0.1})


@pytest.mark.spark
def test_c4_line_filter_cross_engine(spark, tmp_path):
    """Planted C4 cases: terminal-punct variants, short lines,
    javascript lines, lorem ipsum / brace page drops, trailing \\r
    (the reason the anchor is \\z, not $ — Java's $ matches before a
    final \\r, RE2's does not)."""
    import duckdb

    good = "this line has five good words."
    rows = [
        (1, f"{good}\n{good}\n{good}"),                      # passes
        (2, f"{good}\nno terminal punctuation here\n{good}"),  # middle line dropped
        (3, f"{good}\nenable javascript to continue please.\n{good}"),  # js dropped
        (4, f"{good}\n{good}\nlorem ipsum dolor sit amet."),  # page drop
        (5, f"{good}\nvar x = {{}};\n{good}"),                # brace page drop
        (6, "tiny line.\n" + good),                           # <5 words dropped
        (7, f'she said "these are good words."\n{good}\n{good}'),  # quote after punct kept
        (8, good + "\r"),                                     # \r tail: BOTH engines must drop
        (9, None),
        (10, f"{good}!\n{good}?\n{good}"),                    # ! and ? terminals
    ]
    pdf = pd.DataFrame(rows, columns=["id", "text"])
    path = str(tmp_path / "c4.parquet")
    pdf.to_parquet(path)

    got = (
        spark.read.parquet(path)
        .select("id", *T.c4_line_filter("text"))
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    sql = T.c4_line_filter_sql("text")
    want = con.sql(
        "SELECT id, " + ", ".join(f"{e} AS {k}" for k, e in sql.items()) + " FROM t ORDER BY id"
    ).df().reset_index(drop=True)
    for c in sql:
        assert got[c].tolist() == want[c].tolist(), c

    out = {int(r.id): r for r in got.itertuples()}
    assert bool(out[1].passes_c4) and out[1].clean_text == rows[0][1]
    assert out[2].n_kept_lines == 2 and "terminal" not in out[2].clean_text
    assert out[3].n_kept_lines == 2 and "javascript" not in out[3].clean_text
    assert not bool(out[4].passes_c4) and bool(out[4].has_lorem_ipsum)
    assert not bool(out[5].passes_c4) and bool(out[5].has_brace)
    assert out[6].n_kept_lines == 1  # tiny line dropped
    assert out[7].n_kept_lines == 3  # closing quote allowed
    assert out[8].n_kept_lines == 0  # \r-tailed line NOT terminal in either engine
    assert out[9].clean_text == "" and out[9].n_kept_lines == 0
    assert bool(out[10].passes_c4) and out[10].n_kept_lines == 3


@pytest.mark.spark
def test_priority_sample_cross_engine(spark, tmp_path):
    """Priority sampling: Spark window top-k per group must match the
    DuckDB twin row-for-row INCLUDING bit-identical priorities (the
    design claim: only IEEE-exact ops, no pow)."""
    import duckdb

    rows = [(i, f"g{i % 3}", (i * 37) % 100 + 1) for i in range(60)]
    pdf = pd.DataFrame(rows, columns=["id", "grp", "w"])
    path = str(tmp_path / "w.parquet")
    pdf.to_parquet(path)

    got = (
        S.priority_sample(
            spark.read.parquet(path), ["grp"], "w", 4, ["id"], seed=11
        )
        .select("grp", "id", "sample_rank", "priority")
        .toPandas().sort_values(["grp", "sample_rank"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    want = con.sql(
        f"""
        SELECT grp, id, sample_rank, priority FROM (
            SELECT grp, id, {S.priority_sql('w', ['id'], seed=11)} AS priority,
                   row_number() OVER (PARTITION BY grp ORDER BY
                       {S.priority_sql('w', ['id'], seed=11)} DESC, id) AS sample_rank
            FROM t WHERE w IS NOT NULL AND w > 0)
        WHERE sample_rank <= 4 ORDER BY grp, sample_rank
        """
    ).df().reset_index(drop=True)
    assert got.grp.tolist() == want.grp.tolist()
    assert got.id.tolist() == want.id.tolist()
    assert got.priority.tolist() == want.priority.tolist()  # bit-identical

    # determinism under repartition
    again = (
        S.priority_sample(
            spark.read.parquet(path).repartition(7), ["grp"], "w", 4, ["id"], seed=11
        )
        .select("grp", "id").toPandas()
    )
    assert sorted(map(tuple, again.values.tolist())) == sorted(
        map(tuple, got[["grp", "id"]].values.tolist())
    )


@pytest.mark.spark
def test_priority_sample_excludes_bad_weights(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 0.0), (3, "a", -1.0), (4, "a", None), (5, "a", 2.0)],
        "id long, grp string, w double",
    )
    out = S.priority_sample(df, ["grp"], "w", 10, ["id"]).select("id").toPandas()
    assert sorted(out.id.tolist()) == [1, 5]


def test_priority_estimator_unbiased():
    """Engine-independent law: the Duffield-Lund-Thorup estimator
    w_hat = max(w, tau) (tau = (k+1)-th priority) is unbiased for the
    total weight.  Simulated with the SAME formula the operator uses
    (hash-derived u) over many seeds."""
    import hashlib

    ws = [1.0, 2.0, 5.0, 10.0, 3.0, 7.0, 2.5, 40.0, 1.5, 6.0]
    total = sum(ws)
    k = 4
    ests = []
    for seed in range(400):
        pris = []
        for i, w in enumerate(ws):
            h = int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15], 16)
            u = (h + 0.5) / float(1 << 60)
            pris.append((w / u, w))
        pris.sort(reverse=True)
        tau = pris[k][0] if len(pris) > k else 0.0
        ests.append(sum(max(w, tau) for _, w in pris[:k]))
    mean = sum(ests) / len(ests)
    assert abs(mean - total) / total < 0.08, mean


@pytest.mark.spark
def test_null_key_encoding_and_seed_escaping(spark, tmp_path):
    """Review findings: (a) NULL key values must hash distinctly from
    their position-swapped twins ((NULL,'x') vs ('x',NULL) collided
    under bare concat_ws); (b) a seed containing a quote must not
    break the SQL twin."""
    import duckdb

    rows = [(1, None, "x"), (2, "x", None), (3, "x", "x"), (4, None, None)]
    pdf = pd.DataFrame(rows, columns=["id", "a", "b"])
    path = str(tmp_path / "nk.parquet")
    pdf.to_parquet(path)

    seed = "o'brien"
    got = (
        spark.read.parquet(path)
        .select("id", S.hash_bucket(["a", "b"], 10**6, seed=seed).alias("bk"))
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    want = con.sql(
        f"SELECT id, {S.hash_bucket_sql(['a', 'b'], 10**6, seed=seed)} AS bk "
        f"FROM t ORDER BY id"
    ).df().reset_index(drop=True)
    assert got.bk.tolist() == want.bk.tolist()
    # the swapped-null rows land in different buckets
    assert got.bk[0] != got.bk[1]
    assert len(set(got.bk.tolist())) == 4

"""Local mirror of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle SQL side-by-side
at sf0.01; compare row count, column names, and values exactly
(order-insensitive).  Rows-only queries are checked for execution +
self-validation columns."""

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
        elif np.issubdtype(df[c].dtype, np.integer) or df[c].dtype == bool:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.spark
@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck, name):
    q = entrymod.queries()[name]
    got = _normalize(q(spark, SF).toPandas())
    want = _normalize(duck.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)


@pytest.mark.spark
@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    out = entrymod.queries()[name](spark, SF).toPandas()
    assert len(out) >= 0
    # self-validation columns must all hold when present
    for c in ("no_undercount", "within_bound", "within_eps", "no_false_negatives",
              "fpr_consistent", "roundtrip_ok", "deterministic_retrain", "compression_gt_1",
              "recall_ok", "deterministic_refit", "code_width_ok", "order_invariant", "within_tol",
              "dist_exact", "wer_consistent"):
        if c in out.columns:
            assert out[c].all(), f"{name}.{c} violated:\n{out}"
    if name == "q108_blocked_bloom":
        r = out.iloc[0]
        assert r.union_bit_exact      # OR-merge law, byte-exact
        assert r.penalty_ordered      # blocked bound >= flat bound
        assert r.blocked_bound < 0.05  # sized filter actually selective
    if name == "q118_iblt_reconciliation":
        r = out.iloc[0]
        assert r.decode_complete            # peel finished
        assert r.diff_exact                 # decoded == exact diff, both sides
        assert r.sketch_smaller             # the operator's reason to exist
        assert r.diff_size > 0              # the arms actually planted a diff
    if name == "q119_count_sketch":
        assert out.within_bound.all()              # Chebyshev radius per key
        assert out.f2_within_eps.all()             # AMS F2 law
        assert out.merge_partition_invariant.all() # byte-equal under 11 vs 32 parts
    if name == "q121_frequent_directions":
        assert out.psd_ok.all()                 # sketch never overcounts energy
        assert out.within_bound.all()           # deficit <= exact shrink ledger
        assert out.ledger_ok.all()              # ledger <= ||A||_F^2 / ell
        assert out.ev_in_interval.all()         # Weyl interval per direction
        assert out.robust_repartition.all()     # guarantee under 2nd partitioning
    if name == "q122_bigsi_search":
        assert len(out) > 0
        assert out.no_fn.all()            # Bloom one-sidedness per doc
        assert out.truth_covered.all()    # every truly-qualifying doc matched
    if name == "q116_cuckoo_filter":
        r = out.iloc[0]
        assert r.rebuild_identical              # deterministic eviction schedule
        assert r.kept_all_present               # delete has no collateral FNs
        assert r.deleted_at_fpr_level           # the DELETE law
        assert r.smaller_than_counting          # the operator's reason to exist
        assert r.sharded                        # the distributed path ran
    if name == "q110_xor_filter":
        r = out.iloc[0]
        assert r.rebuild_identical    # deterministic build law
        assert r.smaller_than_bloom   # the operator's reason to exist
        assert r.nblocks > 1          # the distributed (sharded) path ran
    if name == "q20_bloom_membership":
        r = out.iloc[0]
        assert r.pos_min_frac == 1.0  # no false negatives
        assert r.neg_avg_frac < 0.05
        assert r.observed_fpr <= max(r.bound_fpr * 2, 1e-3)
    if name == "q23_quantile_sketches":
        # rank-style sanity: sketch quantiles near exact
        rel = (out.kll - out.exact).abs() / out.exact
        assert (rel < 0.25).all()
    if name == "q39_fasta_workflow":
        r = out.iloc[0]
        assert r.scan_parity  # distributed scan == generator, record for record
        assert r.neg_avg_frac < 0.05
    if name == "q38_mibf_strand_classify":
        r = out.iloc[0]
        assert r.both_strands_stored and r.rc_accuracy_invariant and r.strand_pooled_ids_valid
        assert r.acc_fwd >= 0.9
    if name == "q37_canonical_membership":
        r = out.iloc[0]
        assert r.rc_invariant  # the defining canonical-hashing law
        assert r.neg_avg_frac < 0.05
    if name == "q35_spaced_seed_membership":
        r = out.iloc[0]
        assert r.masked_positions_collide  # the defining spaced-seed law
        assert r.neg_avg_frac < 0.05
    if name == "q28_mibf_classify":
        # q40-consistent metric scheme: counts nest (correct ⊆ called
        # ⊆ all) and the fast path always finds frames on this corpus
        assert (out.n_correct <= out.called).all() and (out.called <= out.n).all()
        assert (out.call_rate > 0.9).all()
        # per-source precision can dip on this deliberately
        # weak-separability corpus (q28 checks machinery, q40 checks
        # the veto'd pipeline) — floor per source, 0.9 corpus-wide
        assert (out.precision_on_calls >= 0.8).all()
        assert out.n_correct.sum() / out.called.sum() >= 0.9
    if name == "q29_bloom_setops":
        r = out.iloc[0]
        assert r.union_bit_exact and r.union_contains_all
        assert r.inter_pop <= r.union_pop
    if name == "q40_mibf_full_classify":
        r = out.iloc[0]
        assert r.distributed_matches_driver  # field-for-field parity law
        assert r.no_hit_rows_consistent and r.precision_ok
        assert r.precision_on_calls >= 0.9  # the sf0.01 corpus is sparse enough
    if name == "q41_duplicate_spans":
        r = out.iloc[0]
        assert r.all_planted_found and r.unplanted_all_genuine
        assert r.span_lengths_ok and r.offsets_ok
    if name == "q43_paired_classify":
        r = out.iloc[0]
        assert r.distributed_matches_driver and r.paired_tracks_full
        assert r.accuracy_paired >= 0.9  # sf0.01 corpus is sparse enough
    if name == "q100_incremental_minhash":
        r = out.iloc[0]
        assert r.matches_full_rebuild and r.planted_copies_found
        assert r.no_corpus_internal_pairs
        assert r.n_pairs == r.n_full_restricted >= r.n_copy_plants > 0
    if name == "q93_mg_topk":
        assert out.no_overcount.all() and out.within_bound.all()
        assert out.all_heavy_found.all() and out.repartition_robust.all()
        assert len(out) > 0
    if name == "q98_quality_classifier":
        r = out.iloc[0]
        assert r.partition_invariant and r.loss_decreased and r.accuracy_ok
        assert r.holdout_accuracy >= 0.9
    if name == "q92_stream_dedup":
        r = out.iloc[0]
        assert r.output_unique and r.exact_survivor_set
        assert r.dups_never_win and r.replay_silent
        assert r.n_out == r.n_expected > 0
    if name == "q45_stream_keyed_build":
        r = out.iloc[0]
        assert r.classify_all_ok and r.counts_match and r.second_pass_silent
        assert r.n_keys == 2 and r.n_docs > 0
    if name == "q55_windowed_stream":
        r = out.iloc[0]
        assert r.one_final_per_key and r.counts_match and r.est_close
        assert r.late_dropped and r.replay_silent and r.n_finals > 50
    if name == "q47_semantic_dedup":
        r = out.iloc[0]
        assert r.kept_pairs_clean and r.dropped_have_keeper
        assert r.n_kept + r.n_dropped == r.n
    if name == "q57_theta_set_ops":
        assert set(out.measure) == {"card_a", "card_b", "union", "intersect", "a_not_b", "jaccard"}
        # the sketch must actually be estimating (k chosen below the
        # corpus's distinct count), not trivially exact
        assert (out.theta_est != out.exact).any()
    if name == "q42_contamination_screen":
        r = out.iloc[0]
        assert r.no_false_negatives and r.planted_all_flagged
        assert r.clean_bounded and r.clean_dirty_separated
    if name == "q70_sql_udaf":
        assert len(out) >= 3  # one row per role
        assert out.hll_within_bound.all()
        assert out.theta_exact_below_k.all()
        assert out.kll_within_bound.all()
    if name == "q72_sequence_packing":
        assert len(out) == 8  # one row per shard
        assert out.within_capacity.all()
        assert out.one_halffull.all()
        assert out.bins_bounded.all()
        # packing must actually pack (multiple docs per bin on avg)
        assert (out.n_docs > out.n_bins).all()
    if name == "q32_turn_length_quantiles":
        rel = (out.kll - out.exact).abs() / out.exact
        assert (rel < 0.25).all()
        rel_td = (out.tdigest - out.exact).abs() / out.exact
        assert (rel_td < 0.25).all()
    if name == "q146_stream_sessions":
        r = out.iloc[0]
        assert r.all_match_batch      # emitted == batch rows exactly
        assert r.coverage_ok          # everything watermark-covered emitted
        assert r.no_duplicates
        assert r.replay_silent        # checkpoint replay emits nothing
        assert r.no_boundary_gaps     # semantics-bridge precondition holds
        assert r.n_emitted > 0 and r.n_emitted <= r.n_batch_sessions


@pytest.mark.spark
def test_textstats_edge_cases_cross_engine(spark, tmp_path):
    """NULL / blank / trailing-newline / multi-space texts: Spark and
    DuckDB must agree AND match hand-computed truth (F.trim strips
    only ASCII spaces — regression for phantom empty tokens)."""
    import duckdb

    from btl_bloomfilter_spark.functions import textstats as T

    rows = [
        (1, None),
        (2, ""),
        (3, "\t"),
        (4, "foo\n"),
        (5, "  a\t b  "),
        (6, "the and x"),
        (7, "don't it's y'll"),
        (8, "price: $12.99!?"),
        (9, "x ' y ''"),
        # unicode: non-ASCII runs are one greedy "other" token in BOTH
        # engines (Java code units vs RE2 runes — counts still agree)
        (10, "emoji 😀😀 test"),
        (11, "naïve café 中文"),
        # vertical tab: Java/Python \s includes \x0B, RE2's does not —
        # the explicit whitespace class keeps all three engines at 4
        # tokens ('a', '\x0B', '.', 'b') instead of Spark 4 / DuckDB 3
        (12, "a\x0B.b"),
    ]
    pdf = pd.DataFrame(rows, columns=["id", "text"])
    path = str(tmp_path / "t.parquet")
    pdf.to_parquet(path)
    got = (
        spark.read.parquet(path)
        .select(
            "id",
            T.token_count("text").alias("tc"),
            T.bpe_token_count("text").alias("bpe"),
            T.quality_score("text").alias("q"),
            T.lang_guess("text").alias("lg"),
        )
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    want = (
        con.sql(
            f"SELECT id, {T.token_count_sql('text')} AS tc, "
            f"{T.bpe_token_count_sql('text')} AS bpe, "
            f"{T.quality_score_sql('text')} AS q, {T.lang_guess_sql('text')} AS lg "
            f"FROM t ORDER BY id"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got.tc.tolist() == want.tc.tolist() == [0, 0, 0, 1, 2, 3, 3, 2, 4, 3, 3, 2]
    # BPE-ish pre-tokenizer: Java regex (Spark) and RE2 (DuckDB) must
    # agree byte-for-byte, and match a hand-derived python re oracle
    # (re.ASCII so python's \s matches the engines' ASCII semantics)
    import re

    py = [len(re.findall(T.BPE_SPLIT_PATTERN, t, re.ASCII)) if t else 0 for _, t in rows]
    assert got.bpe.tolist() == want.bpe.tolist() == py
    assert got.bpe.tolist()[6] == 6  # don|'t| it|'s| y|'ll
    assert got.q.tolist() == pytest.approx(want.q.tolist())
    assert got.lg.tolist() == want.lg.tolist()
    assert got.lg.iloc[5] == "en"


@pytest.mark.spark
def test_entry_smoke(spark):
    out = entrymod.entry(spark).toPandas()
    assert len(out) >= 1
    assert set(out.columns) == {"lang", "n_docs", "fully_seen"}
    assert (out.n_docs == out.fully_seen).all()  # every doc fully seen


@pytest.mark.spark
def test_pii_redaction_cross_engine_planted(spark, tmp_path):
    """Planted PII: emails, phones, IPs (and lookalikes that must NOT
    match) — Spark and DuckDB must produce byte-identical redactions
    and identical counts."""
    import duckdb

    from btl_bloomfilter_spark.functions import textstats as T

    rows = [
        (1, "mail me at a.b+c@example.org or x@y.io thanks"),
        (2, "call +1 (555) 123-4567 or 020 7946 0958 now"),
        (3, "server at 192.168.0.1 and 10.0.0.255:8080"),
        (4, "no pii here, just words and 42 numbers"),
        (5, "at sign @ alone and 1.2 version number stay"),
        (6, None),
        (7, "mixed: bob@corp.example, 172.16.254.3, +44 7911 123456!"),
    ]
    pdf = pd.DataFrame(rows, columns=["id", "text"])
    path = str(tmp_path / "pii.parquet")
    pdf.to_parquet(path)
    got = (
        spark.read.parquet(path)
        .select("id", T.redact_pii("text").alias("red"), *T.pii_counts("text"))
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}'")
    P = T.pii_counts_sql("text")
    want = con.sql(
        f"SELECT id, {T.redact_pii_sql('text')} AS red, "
        f"{P['n_email']} AS n_email, {P['n_phone']} AS n_phone, {P['n_ip']} AS n_ip "
        f"FROM t ORDER BY id"
    ).df().reset_index(drop=True)
    assert got.red.tolist() == want.red.tolist()
    for c in ("n_email", "n_phone", "n_ip"):
        assert got[c].tolist() == want[c].tolist(), c
    assert "<EMAIL>" in got.red[0] and got.n_email[0] == 2
    assert "<PHONE>" in got.red[1] and got.n_phone[1] >= 2
    assert "<IP>" in got.red[2] and got.n_ip[2] == 2
    assert got.red[3] == rows[3][1]  # untouched
    assert got.red[5] == ""  # NULL → ''


def test_q131_no_near_dup_pair_straddles_splits(spark):
    """The leakage property itself (not just cross-engine equality):
    every qualifying near-dup pair lands in ONE split, and the
    realized fractions are in the right neighborhood."""
    import collections

    import __spark_entry__ as em
    from btl_bloomfilter_spark.operators.dedup import ngram_jaccard_pairs

    sf = SF
    out = em.queries()["q131_leakage_safe_split"](spark, sf).collect()
    split_of = {r.doc_id: r.split for r in out}
    group_of = {r.doc_id: r.group_key for r in out}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.03, max_doc_freq=100
    ).collect()
    assert len(pairs) > 0
    for p in pairs:
        assert split_of[p.id_a] == split_of[p.id_b], (p.id_a, p.id_b)
        assert group_of[p.id_a] == group_of[p.id_b]
    sizes = collections.Counter(r.split for r in out)
    n = len(out)
    assert 0.8 <= sizes["train"] / n <= 0.97
    assert sizes["val"] > 0 and sizes["test"] > 0

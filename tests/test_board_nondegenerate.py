"""Regression guard for the round-5 degeneracy audit: a board query
whose oracle MATCHES can still be vacuous — zero rows, or statistic
columns NULL/constant in every row — because both engines happily
agree on nothing (q34's cosine >= 0.8 never fired for FOUR rounds of
green hashes).  This pins every query the audit caught as genuinely
exercised at the smallest SF, so a testdata regeneration or a
threshold edit that re-degenerates one fails loudly here instead of
silently re-passing the parity gate."""

import importlib.util
import pathlib

import pytest

_SF = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__", str(pathlib.Path(__file__).resolve().parent.parent / "__spark_entry__.py")
)
entrymod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entrymod)


def _rows(spark, name):
    return entrymod.queries()[name](spark, _SF).collect()


def _some_not_null(rows, col):
    return any(r[col] is not None for r in rows)


def _varies(rows, col):
    return len({r[col] for r in rows}) > 1


def test_q34_near_dups_nonempty(spark):
    rows = _rows(spark, "q34_embedding_near_dups")
    assert len(rows) > 0  # 0.8 never fired (max corpus cosine ~0.6)
    assert all(r["cosine"] >= 0.4 for r in rows)


def test_q184_jsd_nonempty_and_positive(spark):
    rows = _rows(spark, "q184_jsd")
    assert len(rows) > 0  # n_chars >= 1000 matched nothing before
    assert any(r["jsd"] is not None and r["jsd"] > 0 for r in rows)


def test_q193_two_by_two_effects_defined(spark):
    rows = _rows(spark, "q193_two_by_two")
    # both flags were constant before: every effect column NULL
    assert _some_not_null(rows, "odds_ratio")
    assert _some_not_null(rows, "ln_or")
    assert any(r["a"] > 0 and r["d"] > 0 for r in rows)


def test_q185_mcnemar_discordance_exists(spark):
    rows = _rows(spark, "q185_mcnemar")
    # any-event flags were constant 1: b == c == 0 everywhere
    assert any((r["b"] or 0) + (r["c"] or 0) > 0 for r in rows)
    assert _some_not_null(rows, "stat")


def test_q187_cochran_q_defined(spark):
    rows = _rows(spark, "q187_cochran_q")
    assert _some_not_null(rows, "q_stat")


def test_q174_basket_rules_discriminative(spark):
    rows = _rows(spark, "q174_basket_rules")
    assert len(rows) > 0
    # the any-occurrence baskets made every rule support == 1.0
    assert any(r["support"] < 1.0 for r in rows)
    assert _varies(rows, "confidence")


def test_q48_pii_actually_planted_and_redacted(spark):
    rows = _rows(spark, "q48_pii_redaction")
    assert sum(r["emails"] for r in rows) > 0
    assert sum(r["phones"] for r in rows) > 0
    assert sum(r["ips"] for r in rows) > 0
    assert sum(r["n_changed"] for r in rows) > 0


def test_q51_repetition_actually_planted(spark):
    rows = _rows(spark, "q51_repetition_filter")
    assert any(r["avg_dup5"] > 0 for r in rows)
    assert any(r["avg_dup_line"] > 0 for r in rows)
    # and the un-planted tail still passes the gopher gate
    assert any(r["n_pass"] > 0 for r in rows)


def test_trend_column_defined(spark):
    """The four session-21 operators produce a defined statistic on
    the smallest corpus (not just schema-correct NULL rows)."""
    for name, col in [
        ("q195_cochran_armitage", "z"),
        ("q196_jonckheere", "z"),
        ("q197_page", "z"),
        ("q198_mantel_haenszel", "chi2"),
        ("q199_gehan", "chi2"),
        ("q200_stratified_logrank", "chi2"),
        ("q201_ca_stratified", "chi2"),
        ("q202_van_elteren", "chi2"),
    ]:
        rows = _rows(spark, name)
        assert len(rows) > 0, name
        assert _some_not_null(rows, col), name

"""Blocked probabilistic record linkage (Fellegi–Sunter, JASA 1969).

Entity resolution for ingest pipelines: the same real-world entity
arrives from two feeds with typos and format drift; exact-key joins
miss it, full fuzzy cross-joins don't scale.  The classical answer is
(1) BLOCK on cheap stable keys so only plausible pairs are compared,
(2) score each candidate pair as a sum of per-field log-likelihood
weights — agreement on field i contributes log2(m_i/u_i) (m = P(agree
| match), u = P(agree | non-match)), disagreement contributes
log2((1-m_i)/(1-u_i)) — and (3) call pairs above a threshold matches.

Fixed-point policy (fixed-point-oracle-policy memory): the weights are
quantized ONCE, driver-side, to integer milli-bits (:func:`fs_weights`)
and both engines sum the same integer literals — the pair score is a
LONG, partition-order-invariant and hash-oracle-able; the float
log-odds never enters either engine.

Comparator kinds: ``exact`` (equality) and ``lev`` (Levenshtein
distance ≤ max_dist — agreement-with-typo-tolerance).  Cross-engine
trap (pinned test, q105 precedent): Spark's levenshtein counts
CHARACTERS, DuckDB's counts BYTES — identical on ASCII, divergent on
multi-byte; callers comparing non-ASCII fields must normalize first.
NULL on either side of a comparator = disagreement weight (the
conservative convention; a missing field is evidence against, matching
the CASE/ELSE fall-through in BOTH engines — SQL three-valued logic
makes this the no-extra-code behavior, which is why it's the
convention).

100-TB shape: one equi-join on the blocking key tuple (shuffle keyed
by blocks — choose keys with bounded block sizes; a hot block owes
|A_blk|·|B_blk| comparisons, exactly the skew AQE's join split
handles), then a pure-map score projection (whole-stage codegen: the
comparators are built-in expressions, no Python).  The expression
strings are SHARED with the DuckDB twin (:func:`fellegi_sunter_sql`)
so the two engines can never drift — one spec, two plans.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = ["Comparator", "fs_weights", "fellegi_sunter_link", "fellegi_sunter_sql"]


def fs_weights(m: float, u: float, scale: int = 1000) -> tuple[int, int]:
    """(agreement, disagreement) weights in integer milli-bits:
    floor(log2(m/u)·scale) and floor(log2((1-m)/(1-u))·scale).
    Quantize-once: call this on the driver, pass the ints everywhere."""
    if not (0.0 < u < m < 1.0):
        raise ValueError("need 0 < u < m < 1")
    return (
        int(math.floor(math.log2(m / u) * scale)),
        int(math.floor(math.log2((1.0 - m) / (1.0 - u)) * scale)),
    )


@dataclass(frozen=True)
class Comparator:
    """One field comparison.  ``expr_a``/``expr_b`` are SQL expression
    strings over the respective input tables (shared verbatim by both
    engines — keep them dialect-neutral: substr/lower/levenshtein)."""

    name: str
    expr_a: str
    expr_b: str
    w_agree: int
    w_disagree: int
    kind: str = "exact"  # "exact" | "lev"
    max_dist: int = 0

    def agree_sql(self, a: str, b: str) -> str:
        ea = self.expr_a.replace("{t}", a)
        eb = self.expr_b.replace("{t}", b)
        if self.kind == "exact":
            return f"({ea}) = ({eb})"
        if self.kind == "lev":
            return f"levenshtein({ea}, {eb}) <= {self.max_dist}"
        raise ValueError(f"unknown comparator kind {self.kind!r}")


def fellegi_sunter_link(
    df_a: DataFrame,
    df_b: DataFrame,
    *,
    id_a: str,
    id_b: str,
    block: list[tuple[str, str]],
    comparators: list[Comparator],
    threshold_milli: int,
) -> DataFrame:
    """Candidate pairs with integer FS scores.

    ``block``: list of (expr_a, expr_b) SQL strings — candidate pairs
    must agree on EVERY blocking expression (NULL blocks never join:
    SQL equality).  Returns ``(id_a, id_b, <name>_agree ... per
    comparator, score_milli, is_match)`` for ALL blocked candidate
    pairs; callers filter on ``is_match`` (kept unfiltered so
    clerical-review bands around the threshold stay visible).
    """
    if not block:
        raise ValueError("blocking keys required — an unblocked FS join is a cross join")
    a = df_a.selectExpr(
        f"{id_a} AS id_a",
        *[f"({ea.replace('{t}', '')}) AS __bk{i}_a" for i, (ea, _) in enumerate(block)],
        *[f"({c.expr_a.replace('{t}', '')}) AS __c_{c.name}_a" for c in comparators],
    )
    b = df_b.selectExpr(
        f"{id_b} AS id_b",
        *[f"({eb.replace('{t}', '')}) AS __bk{i}_b" for i, (_, eb) in enumerate(block)],
        *[f"({c.expr_b.replace('{t}', '')}) AS __c_{c.name}_b" for c in comparators],
    )
    cond = [F.col(f"__bk{i}_a") == F.col(f"__bk{i}_b") for i in range(len(block))]
    # Explicit user repartition on the block keys, at the session's
    # configured shuffle width: AQE coalesces planner-owned exchanges
    # of SMALL inputs down to its 1 MB minimum (r6 measurement: the
    # sf0.1 customer sides coalesced to 2 partitions, so the expensive
    # per-pair comparator projection — levenshtein et al. — ran on 2 of
    # 32 cores).  A user-specified partition count is exempt from AQE
    # coalescing, the join reuses the partitioning (no extra exchange),
    # and the width follows spark.sql.shuffle.partitions, the value a
    # real cluster tunes to its scale.
    n_part = int(df_a.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = a.repartition(n_part, *[F.col(f"__bk{i}_a") for i in range(len(block))])
    b = b.repartition(n_part, *[F.col(f"__bk{i}_b") for i in range(len(block))])
    j = a.join(b, cond)

    score = F.lit(0).cast("long")
    out_cols = [F.col("id_a"), F.col("id_b")]
    for c in comparators:
        ca, cb = F.col(f"__c_{c.name}_a"), F.col(f"__c_{c.name}_b")
        if c.kind == "exact":
            agree = ca == cb
        elif c.kind == "lev":
            agree = F.levenshtein(ca, cb) <= F.lit(c.max_dist)
        else:
            raise ValueError(f"unknown comparator kind {c.kind!r}")
        flag = F.coalesce(agree, F.lit(False))
        out_cols.append(flag.alias(f"{c.name}_agree"))
        score = score + F.when(flag, F.lit(c.w_agree)).otherwise(F.lit(c.w_disagree))
    return j.select(
        *out_cols,
        score.alias("score_milli"),
        (score >= F.lit(int(threshold_milli))).alias("is_match"),
    )


def fellegi_sunter_sql(
    table_a: str,
    table_b: str,
    *,
    id_a: str,
    id_b: str,
    block: list[tuple[str, str]],
    comparators: list[Comparator],
    threshold_milli: int,
) -> str:
    """DuckDB twin built from the SAME spec (expression strings with
    ``{t}`` placeholders resolved to the table aliases)."""
    bk = " AND ".join(
        f"({ea.replace('{t}', 'a.')}) = ({eb.replace('{t}', 'b.')})" for ea, eb in block
    )
    agree_cols = []
    score_terms = []
    for c in comparators:
        cond = c.agree_sql("a.", "b.")
        agree_cols.append(f"coalesce({cond}, FALSE) AS {c.name}_agree")
        score_terms.append(f"CASE WHEN coalesce({cond}, FALSE) THEN {c.w_agree} ELSE {c.w_disagree} END")
    score = " + ".join(score_terms)
    return f"""(
        SELECT a.{id_a} AS id_a, b.{id_b} AS id_b,
               {', '.join(agree_cols)},
               CAST({score} AS BIGINT) AS score_milli,
               CAST({score} AS BIGINT) >= {int(threshold_milli)} AS is_match
        FROM {table_a} a JOIN {table_b} b ON {bk}
    )"""

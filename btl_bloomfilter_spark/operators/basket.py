"""Association-rule mining (market-basket analysis): support /
confidence / lift over within-basket item co-occurrence.

The co-occurrence question q114's collocations can't ask: PMI phrase
mining counts ADJACENT positions in a token stream; association rules
count items sharing a BASKET regardless of order or position — which
parts ship in one order, which event types one user fires, which
tools one conversation calls.  Classic Agrawal/Srikant (VLDB'94)
semantics restricted to pairs (the 2-itemset level — the level that
is exact, hash-oracle-able, and covers the "X implies Y" reporting
use; deeper itemsets grow combinatorially and belong to a sampled /
sketched pipeline, not this exact operator).

Exactness: every count is a long over DEDUPED (basket, item) facts
(multiplicity within a basket deliberately doesn't count — standard
market-basket semantics); support and confidence are single
divisions of exact integers; lift mirrors q114's proven two-step
shape (decimal/hugeint products c_xy·N and c_a·c_b, each cast
int→double correctly rounded, then ONE division) so the whole rule
table including all three doubles is engine-identical.

Scale shape: the pair expansion reuses plans/pairs.grouped_pair_events
(triangular hash-chunk blocking — a degenerate giant basket becomes
~block²-bounded tasks instead of one |B|²-row task); total pair work
is Σ|B|² over baskets, the operator's documented cost contract.  The
deduped fact table feeds THREE branches (pairs, item margins, basket
count) — pass ``facts=`` (a persisted ``SELECT DISTINCT basket,
item``) to make it one scan, the ``fingerprints=`` convention.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.pairs import grouped_pair_events

__all__ = ["basket_rules", "basket_rules_sql"]

_D38 = "decimal(38,0)"


def basket_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    block: int = 512,
    facts: DataFrame | None = None,
    broadcast_margins: bool = True,
) -> DataFrame:
    """(antecedent, consequent, n_pair, n_antecedent, n_consequent,
    n_baskets, support, confidence, lift) — one row per DIRECTED rule
    antecedent→consequent whose pair co-occurs in ≥ ``min_support``
    baskets.  support = n_pair/n_baskets, confidence =
    n_pair/n_antecedent, lift = n_pair·n_baskets /
    (n_antecedent·n_consequent); lift > 1 means the pair co-occurs
    more than independence predicts.  NULL baskets/items are dropped;
    ``facts=`` supplies a pre-deduped (basket, item) table (columns
    named exactly ``basket_col``/``item_col``) for the persist-once
    path.

    ``broadcast_margins`` (default True) force-broadcasts the
    per-item margin table into the two rule joins — right for
    bounded item universes (event types, tools, categories).  For
    HIGH-CARDINALITY item domains (millions of distinct parts /
    tokens) the margin table is itself big: pass False to fall back
    to shuffle joins and let AQE decide (the broadcast would
    otherwise ship the full margin table to every executor, twice).
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    b, it = F.col(basket_col), F.col(item_col)
    if facts is None:
        facts = (
            df.where(b.isNotNull() & it.isNotNull())
            .select(b.alias(basket_col), it.alias(item_col))
            .distinct()
        )
    n_baskets = facts.agg(
        F.countDistinct(basket_col).cast("long").alias("__N")
    )
    items = facts.groupBy(F.col(item_col).alias("__i")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    rows = facts.select(
        F.col(basket_col).alias("__bk"),
        F.struct(F.col(item_col).alias("id")).alias("p"),
    )
    ev = grouped_pair_events(rows, ["__bk"], block=block)
    x = F.least(F.col("a.id"), F.col("b.id"))
    y = F.greatest(F.col("a.id"), F.col("b.id"))
    pairs = (
        ev.select(x.alias("__x"), y.alias("__y"))
        .groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).cast("long").alias("__cxy"))
        .where(F.col("__cxy") >= min_support)
    )
    directed = pairs.select(
        F.col("__x").alias("__ant"), F.col("__y").alias("__con"), "__cxy"
    ).unionAll(
        pairs.select(
            F.col("__y").alias("__ant"), F.col("__x").alias("__con"), "__cxy"
        )
    )
    bc = F.broadcast if broadcast_margins else (lambda d: d)
    joined = (
        directed.join(
            bc(items.select(F.col("__i"), F.col("__c").alias("__ca"))),
            F.col("__ant") == F.col("__i"),
        )
        .drop("__i")
        .join(
            bc(items.select(F.col("__i"), F.col("__c").alias("__cb"))),
            F.col("__con") == F.col("__i"),
        )
        .drop("__i")
        .crossJoin(F.broadcast(n_baskets))
    )
    num = (F.col("__cxy").cast(_D38) * F.col("__N").cast(_D38)).cast("double")
    den = (F.col("__ca").cast(_D38) * F.col("__cb").cast(_D38)).cast("double")
    return joined.select(
        F.col("__ant").alias("antecedent"),
        F.col("__con").alias("consequent"),
        F.col("__cxy").alias("n_pair"),
        F.col("__ca").alias("n_antecedent"),
        F.col("__cb").alias("n_consequent"),
        F.col("__N").alias("n_baskets"),
        (F.col("__cxy").cast("double") / F.col("__N").cast("double")).alias(
            "support"
        ),
        (F.col("__cxy").cast("double") / F.col("__ca").cast("double")).alias(
            "confidence"
        ),
        (num / den).alias("lift"),
    )


def basket_rules_sql(
    table: str,
    basket: str,
    item: str,
    *,
    min_support: int = 2,
) -> str:
    """DuckDB twin of :func:`basket_rules` (brute within-basket
    self-join instead of the chunked expansion — identical pair set;
    hugeint lift products, identical double shapes)."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    return f"""
        WITH __bk_facts AS (
            SELECT DISTINCT {basket} AS bk, {item} AS it FROM {table}
            WHERE ({basket}) IS NOT NULL AND ({item}) IS NOT NULL
        ),
        __bk_n AS (SELECT count(DISTINCT bk)::BIGINT AS N FROM __bk_facts),
        __bk_items AS (
            SELECT it, count(*)::BIGINT AS c FROM __bk_facts GROUP BY it
        ),
        __bk_pairs AS (
            SELECT fa.it AS x, fb.it AS y, count(*)::BIGINT AS cxy
            FROM __bk_facts fa JOIN __bk_facts fb
              ON fa.bk = fb.bk AND fa.it < fb.it
            GROUP BY 1, 2
            HAVING count(*) >= {min_support}
        ),
        __bk_dir AS (
            SELECT x AS ant, y AS con, cxy FROM __bk_pairs
            UNION ALL
            SELECT y AS ant, x AS con, cxy FROM __bk_pairs
        )
        SELECT d.ant AS antecedent, d.con AS consequent,
               d.cxy AS n_pair, ia.c AS n_antecedent, ib.c AS n_consequent,
               N AS n_baskets,
               d.cxy::DOUBLE / N::DOUBLE AS support,
               d.cxy::DOUBLE / ia.c::DOUBLE AS confidence,
               CAST(d.cxy::HUGEINT * N::HUGEINT AS DOUBLE)
                   / CAST(ia.c::HUGEINT * ib.c::HUGEINT AS DOUBLE) AS lift
        FROM __bk_dir d
        JOIN __bk_items ia ON d.ant = ia.it
        JOIN __bk_items ib ON d.con = ib.it
        CROSS JOIN __bk_n
    """

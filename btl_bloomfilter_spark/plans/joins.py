"""Explicit skew mitigation for hot-keyed equi-joins (salting).

A shuffle join hash-partitions both sides on the join key; one hot key
(the empty-document digest, a boilerplate conv_id prefix, a default
user id) lands its ENTIRE row population on one reducer and the stage
runs at the speed of that straggler.  AQE's skew-join handling splits
oversized partitions at runtime for sort-merge joins, but it needs
accurate size stats and does nothing for downstream per-key work.
Salting fixes the plan shape itself:

- the SKEWED side gets a deterministic salt in ``[0, salt)`` hashed
  from its row content (``xxhash64`` of the join keys plus the other
  columns — deterministic, so stage retries re-salt identically; a
  ``rand()``-based salt can duplicate or drop rows on retry, the same
  failure mode plans/agg documents for sketch merges);
- the OTHER side is replicated ``salt`` times, once per salt value;
- the join runs on ``keys + [salt]``, so the hot key spreads over
  ``salt`` reducers, each meeting exactly one replica row.

Every skewed row meets each matching other-side row exactly once, so
the result provably EQUALS the plain join — which is how q102
hash-oracles this operator against DuckDB's plain join.

Cost model (docstring contract, not magic): salting multiplies the
replicated side's shuffle volume by ``salt``.  Worth it when the other
side is small-ish (but too big or too numerous to broadcast) and the
skewed side has keys hot enough to straggle; useless when the "small"
side is as big as the skewed one — use bucketing (sources/bucketing)
or AQE there instead.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    *,
    salt: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on ``on``, spreading each
    hot key over ``salt`` reducers.  Supported ``how``: ``inner`` and
    ``left`` (outer sides of the REPLICATED table would emit one
    unmatched row per replica — rejected rather than silently wrong).
    Output columns = skewed's then other's non-key columns, exactly
    like ``skewed.join(other, on, how)``.

    Degeneracy caveat: the salt is a hash of the ROW, so rows that are
    byte-identical across every column co-salt and still land on one
    reducer.  If a hot key's rows are exact duplicates, salting cannot
    spread them (and nothing can make their join output smaller) —
    pre-aggregate the duplicates (count them, join once, re-expand)
    instead of salting.  A row-nondeterministic salt would spread
    them, but re-salts differently on stage retry — the correctness
    bug this operator's determinism exists to prevent.
    """
    if salt <= 1:
        raise ValueError("salt must be > 1 (1 would be a plain join)")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if not on:
        raise ValueError("on must name at least one join key")
    for c in (_SALT,):
        if c in skewed.columns or c in other.columns:
            raise ValueError(f"column {c} already exists on an input")
    s = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    o = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return s.join(o, on + [_SALT], how).drop(_SALT)


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    *,
    top: int = 20,
    parallelism: int,
    counts: DataFrame | None = None,
) -> DataFrame:
    """(rank, key…, cnt, share, cum_share, salt_hint) — the top hot
    keys of a prospective shuffle key, exactly, with the numbers a
    join planner needs BEFORE picking broadcast / salt / bucket: what
    fraction of all rows the hot key carries (``share``), how
    concentrated the head is (``cum_share``), and the salt factor
    that spreads that key to average-reducer load
    (``salt_hint = ceil(cnt·parallelism / N)`` — 1 means the key
    already fits one reducer's fair share; the value to pass as
    ``salted_join(salt=)`` is the max hint among keys you must
    co-shuffle).  Completes the planning kit: CMS inner-product
    (q106) estimates the join's OUTPUT size from blob summaries;
    this measures the INPUT's key skew; ``salted_join`` fixes it.

    Exact, engine-portable: counts are longs, the top-``top``
    selection is total-ordered (cnt DESC, then each key ASC — ties
    deterministic), share/cum_share single divisions of exact
    integers, salt_hint pure integer arithmetic
    ((cnt·P + N − 1) div N; cnt·P < 9.2e18 contract).  NULL keys
    participate (a NULL-heavy FK column is a classic real skew —
    the tie-break uses asc_nulls_last to match DuckDB's
    NULLS-LAST ASC default, pinned).

    Scale shape: the only row-scale stage is the map-side-combined
    ``groupBy(keys).count()``; the top-``top`` selection is
    ``orderBy().limit()`` — Catalyst's TakeOrderedAndProject, a
    per-partition heap + driver merge, never a global sort; the
    cumulative window runs over ≤ ``top`` rows.  The cell histogram
    feeds TWO branches (total + top-k), so the default plan scans it
    twice — at scale pass ``counts=`` (a persisted
    ``df.groupBy(*key_cols).count()``, the ``fingerprints=``
    convention) to make it one pass.
    """
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    if parallelism < 1:
        raise ValueError(f"parallelism must be >= 1, got {parallelism}")
    from pyspark.sql import Window

    cnts = (
        counts
        if counts is not None
        else df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("count"))
    )
    cnts = cnts.select(*key_cols, F.col("count").cast("long").alias("__cnt"))
    total = cnts.agg(F.sum("__cnt").alias("__N"))
    topk = cnts.orderBy(
        F.col("__cnt").desc(), *[F.col(k).asc_nulls_last() for k in key_cols]
    ).limit(top)
    w = (
        Window.orderBy(F.col("__cnt").desc(), *[F.col(k).asc_nulls_last() for k in key_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        topk.crossJoin(F.broadcast(total))
        .withColumn("__rank", F.row_number().over(w))
        .withColumn("__cum", F.sum("__cnt").over(w))
    )
    n = F.col("__N")
    p = F.lit(parallelism).cast("long")
    return ranked.select(
        F.col("__rank").alias("rank"),
        *key_cols,
        F.col("__cnt").alias("cnt"),
        (F.col("__cnt").cast("double") / n.cast("double")).alias("share"),
        (F.col("__cum").cast("double") / n.cast("double")).alias("cum_share"),
        F.expr(f"(__cnt * CAST({parallelism} AS BIGINT) + __N - 1) div __N")
        .cast("int")
        .alias("salt_hint"),
    )


def skew_report_sql(
    table: str,
    keys: list[str],
    *,
    top: int = 20,
    parallelism: int,
) -> str:
    """DuckDB twin of :func:`skew_report` (same deterministic total
    order, `//` integral salt hint, identical double shapes)."""
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    if parallelism < 1:
        raise ValueError(f"parallelism must be >= 1, got {parallelism}")
    ks = ", ".join(keys)
    order = "cnt DESC, " + ", ".join(f"{k} ASC" for k in keys)
    return f"""
        WITH __sk_cnt AS (
            SELECT {ks}, count(*)::BIGINT AS cnt FROM {table} GROUP BY {ks}
        ),
        __sk_tot AS (SELECT sum(cnt)::BIGINT AS N FROM __sk_cnt),
        __sk_top AS (
            SELECT * FROM __sk_cnt ORDER BY {order} LIMIT {top}
        ),
        __sk_r AS (
            SELECT row_number() OVER (ORDER BY {order}) AS rank,
                   {ks}, cnt,
                   sum(cnt) OVER (ORDER BY {order}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum
            FROM __sk_top
        )
        SELECT CAST(rank AS INT) AS rank, {ks}, cnt,
               cnt::DOUBLE / N::DOUBLE AS share,
               cum::DOUBLE / N::DOUBLE AS cum_share,
               CAST((cnt * {parallelism}::BIGINT + N - 1) // N AS INT)
                   AS salt_hint
        FROM __sk_r CROSS JOIN __sk_tot
    """

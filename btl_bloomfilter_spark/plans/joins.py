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

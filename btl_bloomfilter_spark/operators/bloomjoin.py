"""Bloom-filter semi-join (sideways information passing).

The classic relational use of a Bloom filter (reference semantics:
`BloomFilter.hpp:237-262` membership over the build side's keys):
pre-filter the LARGE probe side with a broadcast filter built from
the small side's join keys, so non-matching rows are dropped at the
scan — BEFORE the join's shuffle — then run the exact semi-join on
the survivors to remove the filter's false positives.  The result is
EXACTLY the semi-join (no false negatives by construction, false
positives removed by the final join), which is what makes the
operator hash-oracle-able against plain `IN (SELECT ...)` SQL.

When to use over Spark's built-ins: a broadcast-hash semi-join needs
the full small-side key set in memory (8+ bytes/key plus hash-table
overhead); the Bloom pre-filter needs ~1.2 bytes/key at 1% FPR, so a
"medium" build side (10^8-10^9 keys) that cannot broadcast-hash-join
can still prune the probe side's shuffle by its selectivity.  Spark's
own runtime row-group filters (spark.sql.optimizer.runtime.bloomFilter)
apply only within one query; this operator's filter is a library
Sketch — persistable via sources/bfio (.bf reference layout) and
reusable across jobs/shards, the same pattern as
jobs/decontaminate.py.

At 100 TB: the build side aggregates once into an m/8-byte blob
(reduce-scatter, `plans/agg.build_sketch`); the probe side's
pre-filter is a pure map over a broadcast blob (no shuffle); only
surviving rows enter the semi-join exchange.  With selectivity s the
join shuffles s + fpr·(1-s) of the corpus instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.probe import bloom_contains
from ..plans.agg import build_sketch
from .bloom import BloomFilter


def build_key_filter(
    small: DataFrame, key: str, *, fpr: float = 0.01, capacity: int | None = None
) -> BloomFilter:
    """Bloom filter over the distinct join keys of ``small``.

    ``capacity`` skips the sizing count when the caller already knows
    the (approximate, >= actual is safe) distinct-key count.
    """
    keys = small.select(F.col(key).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    if capacity is None:
        capacity = keys.distinct().count()
    return build_sketch(
        keys, "k", lambda: BloomFilter.for_capacity(max(capacity, 1), fpr, k=0)
    )


def bloom_semi_join(
    large: DataFrame,
    key_large: str,
    small: DataFrame,
    key_small: str,
    *,
    fpr: float = 0.01,
    bloom: BloomFilter | None = None,
    exact: bool = True,
) -> DataFrame:
    """``large`` semi-joined to ``small`` on key equality, with a
    broadcast Bloom pre-filter pruning ``large`` before the shuffle.

    ``bloom=`` reuses a filter from :func:`build_key_filter` (e.g.
    loaded via bfio) so repeated shards skip the build.  With
    ``exact=False`` the final FP-removing semi-join is skipped and the
    result may contain ~fpr extra non-matching rows — useful when a
    downstream exact join would deduplicate anyway.  NULL probe keys
    are dropped (SQL equality never matches NULL).
    """
    spark = large.sparkSession
    if bloom is None:
        bloom = build_key_filter(small, key_small, fpr=fpr)
    if bloom.k != 0:
        raise ValueError("key filter must be a whole-string (k=0) BloomFilter")
    pre = large.where(F.col(key_large).isNotNull()).where(
        bloom_contains(spark, bloom, F.col(key_large).cast("string"))
    )
    if not exact:
        return pre
    return pre.join(
        small, pre[key_large] == small[key_small], "left_semi"
    )

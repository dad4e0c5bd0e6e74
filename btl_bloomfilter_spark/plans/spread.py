"""Input fan-out for under-partitioned sources.

A single parquet file with one row group scans as ONE split no matter
how many cores the session has (`spark.sql.files.maxPartitionBytes`
cannot split inside a row group), and `.cache()` freezes that layout —
so every downstream first map stage (tokenize, explode, regex
featurize, hash) runs on one core while the rest idle.  The r6 plan
audit found every sf0.1 bench input arrives as exactly one row group
(documents/events/orders/customer/embeddings = 1 scan partition,
lineitem = 1 non-empty of 3), which serialized the map side of most
of the query suite.

:func:`fan_out` is the guard the heavy map-side operators call on
their input: round-robin repartition to the session default
parallelism, ONLY when the input arrives in fewer partitions.  On a
properly-partitioned 100-TB table the condition is false and the call
is a no-op (no exchange is added); on a degenerate layout the one
small exchange of raw rows buys a fully parallel map stage.  Values
are unaffected — every caller's output is partition-invariant (the
oracled-query contract); partition-DEPENDENT operators (the
partial-by-design counting family, q28-style diagnostics) must NOT
call this.

WHEN TO CALL IT — measured r6 rule, both directions: the exchange
(including its sort-before-repartition local pass, SPARK-23207) costs
~0.3-0.5s per 600k raw rows locally, so it pays ONLY where the
per-row map work is heavy — tokenize/shingle/k-mer explode, regex
featurize, per-token hashing (kmer_spectrum 2.38→0.73s, novelty
3.9→2.3s, bm25 1.30→0.82s, phrase index 1.66→1.34s).  For numeric
project+aggregate operators the saved single-core pass is CHEAPER
than the exchange (cochran_q 0.50→1.08s, mann_kendall 1.36→2.50s
when it was blanket-applied — reverted); the stats family therefore
does not call this.  Callers must pass a SCAN-shaped input
(projection/filter over a source or cache): the partition-count probe
uses ``df.rdd``, which under AQE eagerly executes any upstream
shuffle stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["fan_out"]


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``partitions`` (default:
    the session's ``defaultParallelism``) when — and only when — it
    currently arrives in fewer partitions.  A no-op (returns ``df``
    unchanged, no exchange planned) otherwise."""
    target = int(partitions) if partitions else df.sparkSession.sparkContext.defaultParallelism
    if target <= 1:
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic plans; fail open
        return df
    if current >= target:
        return df
    return df.repartition(target)

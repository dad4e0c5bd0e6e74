"""Within-group unordered pair expansion with triangular chunk
blocking — the shared candidate-generation kernel behind the exact
similarity joins (``operators/setjoin`` prefix filtering,
``operators/editjoin`` q-gram prefix filtering).

The naive shape — ``groupBy(key).collect_list`` then two explodes —
computes a d-row bucket's d²/2 pair events in ONE task (measured in
setjoin: a 3,823-doc bucket = 14.6M rows in a single task while 31
cores idled; AQE cannot split inside a group).  Instead, every row is
hashed into one of ``ceil(bucket/block)`` chunks (hash, not
row_number — a window would re-serialize the bucket just to number
it); within-chunk pairs expand per ``(key, chunk)`` group and
cross-chunk pairs per ``(key, chunk_a < chunk_b)`` join row,
round-robined over the cluster.  Each unordered pair lands in exactly
one chunk pair; total work is the same O(d²) but the largest task is
now ~O(block²).
"""
from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, functions as F

__all__ = ["grouped_pair_events"]


def grouped_pair_events(
    rows: DataFrame,
    keys: list[str],
    *,
    block: int = 512,
    order_field: str = "id",
    materialize: bool = True,
) -> DataFrame:
    """All unordered pairs of rows sharing ``keys``, as two struct
    columns ``(a, b)``.

    ``rows`` must carry a struct column ``p`` (the per-row payload);
    ``order_field`` names a field of ``p`` that is unique per row
    within a group (it both orients within-chunk pairs and seeds the
    chunk hash).  Each unordered pair is emitted EXACTLY once, but
    cross-chunk events carry no orientation guarantee — canonicalize
    with ``least/greatest`` on the caller side.  A pair generated
    under several key values (e.g. two docs sharing multiple prefix
    tokens) is emitted once per shared key value; ``.distinct()``
    after canonicalization is the caller's job.
    """
    if block < 1:
        raise ValueError("block must be >= 1")
    # strict column contract: exactly keys + the payload struct.  The
    # kernel injects working columns (pdf/nck/ck/xs/a/b); a caller row
    # already carrying one of those names would be silently clobbered
    # (the defect class mg_topk_by_key's reserved-name guard fixed).
    expected = set(keys) | {"p"}
    if set(rows.columns) != expected:
        raise ValueError(
            f"rows must carry exactly columns {sorted(expected)} (got {sorted(rows.columns)})"
        )
    reserved = {"p", "pdf", "nck", "ck", "xs", "a", "b"}
    bad = reserved.intersection(keys)
    if bad:
        raise ValueError(f"key names {sorted(bad)} are reserved by grouped_pair_events")
    pdfreq = rows.groupBy(*keys).agg(F.count("*").alias("pdf"))
    chunked = (
        rows.join(pdfreq, keys)
        .withColumn("nck", F.ceil(F.col("pdf") / F.lit(block)).cast("int"))
        .withColumn("ck", F.pmod(F.xxhash64(F.col("p")[order_field]), F.col("nck")).cast("int"))
    )
    lists = chunked.groupBy(*keys, "ck").agg(F.collect_list("p").alias("xs"))
    if materialize:
        # three consumers (within-chunk explode + both self-join
        # sides): uncached, Catalyst re-runs the upstream
        # rows→pdfreq→join→groupBy chain per consumer (the within
        # branch cannot share the self-join's exchange).  One eager
        # checkpoint computes the chunk table exactly once; it is the
        # same order of size as the candidate-event input.  Set False
        # only when the input is a trivially cheap scan.
        lists = lists.localCheckpoint(eager=True)
    a, b = F.col("a"), F.col("b")
    within = (
        lists.select(F.explode("xs").alias("a"), "xs")
        .select("a", F.explode("xs").alias("b"))
        .where(a[order_field] < b[order_field])
    )
    x, y = lists.alias("x"), lists.alias("y")
    same_key = functools.reduce(
        operator.and_, [F.col(f"x.{k}") == F.col(f"y.{k}") for k in keys]
    )
    cross = (
        x.join(y, same_key & (F.col("x.ck") < F.col("y.ck")))
        .select(F.col("x.xs").alias("xs_a"), F.col("y.xs").alias("xs_b"))
        .repartition(rows.sparkSession.sparkContext.defaultParallelism * 2)
        .select(F.explode("xs_a").alias("a"), "xs_b")
        .select("a", F.explode("xs_b").alias("b"))
    )
    return within.unionByName(cross)

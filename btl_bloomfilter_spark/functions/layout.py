"""Z-order (Morton) clustering keys for multi-dimensional data layout.

The north_rule frames the corpus as an Iceberg table; at 100 TB the
dominant read cost is how many files a query's predicates can SKIP via
file-level min/max statistics.  A table sorted by one column prunes
only on that column; interleaving the bits of several normalized
columns (Morton 1966; the technique behind Iceberg/Delta `ZORDER BY`)
gives every dimension partial locality, so range predicates on ANY of
the interleaved columns shrink each file's bounding box and min/max
pruning fires on all of them.

Everything here is integer bit arithmetic in whole-stage codegen —
``shiftleft``/``shiftright``/``&``/``|`` terms unrolled per bit — so
the key is deterministic, engine-portable (the DuckDB twin runs the
same unrolled expression; q95 hash-compares per-row keys), and costs
one projection.  No UDFs, no shuffle of its own.

Normalization to the fixed ``bits``-wide lattice is explicit and
caller-visible: :func:`normalize_minmax` does exact BIGINT affine
scaling ``(v - lo) * (2^bits - 1) DIV (hi - lo)`` (no float division —
fixed-point-oracle-policy), clamping out-of-range values so a stale
[lo, hi] from yesterday's stats pass degrades locality, never
correctness.

:func:`cluster_by_zorder` is the write-layout operator:
``repartitionByRange`` on the key (one range shuffle — the same cost
any sorted write pays) + ``sortWithinPartitions`` so downstream
parquet row-group stats are tight too.  tests/test_layout.py measures
the claim: on a 2-D grid, z-order layout prunes ~sqrt-tighter boxes on
BOTH dimensions where a linear sort leaves the second dimension's
per-file range at full width.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["interleave_bits", "interleave_bits_sql", "normalize_minmax",
           "normalize_minmax_sql", "cluster_by_zorder",
           "exact_range_boundaries", "kll_range_boundaries",
           "range_bucket", "range_bucket_sql"]


def _validate(ncols: int, bits: int) -> None:
    if ncols < 2:
        raise ValueError("interleaving needs at least 2 columns")
    if bits < 1 or ncols * bits > 63:
        raise ValueError("ncols * bits must fit a signed BIGINT (<= 63)")


def interleave_bits(*cols: Column | str, bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column into one
    BIGINT: bit i of column j lands at output position
    ``i * ncols + (ncols - 1 - j)`` counted from the least-significant
    end — column 0 owns the HIGH bit of each group, so earlier columns
    sort coarsest (matching the usual ZORDER BY column order
    intuition).  Inputs must already be
    non-negative and < 2^bits (see :func:`normalize_minmax`); higher
    bits are masked off defensively."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    _validate(len(cs), bits)
    n = len(cs)
    terms = []
    for j, c in enumerate(cs):
        v = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            # bit i of col j -> output bit i*n + (n-1-j)
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + (n - 1 - j))
            )
    return functools.reduce(lambda x, y: x.bitwiseOR(y), terms)


def interleave_bits_sql(*cols: str, bits: int = 16) -> str:
    """The identical unrolled expression as ANSI/DuckDB SQL (BIGINT
    ``>> << & |``) — the q95 oracle twin."""
    _validate(len(cols), bits)
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for j, c in enumerate(cols):
        v = f"(CAST({c} AS BIGINT) & {mask})"
        for i in range(bits):
            terms.append(f"((({v} >> {i}) & 1) << {i * n + (n - 1 - j)})")
    return "(" + " | ".join(terms) + ")"


def normalize_minmax(col: Column | str, lo: int, hi: int, *, bits: int = 16) -> Column:
    """Exact integer affine map of a BIGINT-valued column from
    [lo, hi] onto [0, 2^bits - 1]: ``((v - lo) * (2^bits - 1)) DIV
    (hi - lo)``, clamped.  Caller guarantees ``(hi - lo) * (2^bits-1)
    < 2^63`` (raise bits awareness: 16 bits leaves ~2^47 of input
    range).  lo/hi usually come from a stats pass or table metadata;
    stale bounds only cost locality because of the clamp."""
    if hi <= lo:
        raise ValueError("hi must be > lo")
    c = (F.col(col) if isinstance(col, str) else col).cast("long")
    clamped = F.greatest(F.lit(int(lo)), F.least(F.lit(int(hi)), c))
    top = (1 << bits) - 1
    # `div`: exact BIGINT integer division (codegen), never double —
    # identical to DuckDB's `//` on the non-negative operands here
    return F.call_function("div", (clamped - F.lit(int(lo))) * F.lit(top), F.lit(int(hi - lo)))


def normalize_minmax_sql(col: str, lo: int, hi: int, *, bits: int = 16) -> str:
    if hi <= lo:
        raise ValueError("hi must be > lo")
    top = (1 << bits) - 1
    clamped = f"greatest({int(lo)}, least({int(hi)}, CAST({col} AS BIGINT)))"
    return f"(({clamped} - {int(lo)}) * {top}) // {int(hi - lo)}"


def cluster_by_zorder(
    df: DataFrame, zkey: Column, *, num_partitions: int | None = None
) -> DataFrame:
    """Write-layout operator: range-partition + sort the data by a
    prebuilt z-key (from :func:`interleave_bits`) so both file-level
    AND row-group-level min/max stats are tight on every interleaved
    dimension.  One range shuffle (sampled range bounds — the same
    cost as any globally sorted write); the key column is dropped
    from the result."""
    if "__zkey" in df.columns:
        raise ValueError("input already has a __zkey column")
    keyed = df.withColumn("__zkey", zkey)
    parted = (
        keyed.repartitionByRange(num_partitions, "__zkey")
        if num_partitions
        else keyed.repartitionByRange("__zkey")
    )
    return parted.sortWithinPartitions("__zkey").drop("__zkey")


# ---------------------------------------------------------------------------
# Quantile-driven balanced range partitioning
# ---------------------------------------------------------------------------
#
# The other half of write layout: z-order fixes WITHIN-file locality,
# range partitioning fixes BETWEEN-file balance.  Spark's own
# repartitionByRange draws boundaries from a nondeterministic reservoir
# sample, so two runs of the same job lay the same table out
# differently and no oracle can replay the assignment.  Here the
# boundaries come from the data itself under an exact integer-rank
# spec (engine-portable: no float arithmetic anywhere — boundaries are
# actual column values, ranks are integer counts, assignment is strict
# comparisons), with the library's KLL sketch as the scale path when
# an exact pass over the value histogram is too expensive.
#
# Exact spec: boundary b_i (i = 1..B-1) is the value at ascending
# 1-based rank ceil(i*n/B) = (i*n + B-1) DIV B over the non-null
# values; bucket(x) = #{i : x > b_i}, a monotone map into [0, B-1].
# Duplicate boundary values (heavy ties) collapse deterministically,
# leaving empty buckets rather than splitting a tie arbitrarily.
#
# 100-TB shape of the exact path: ONE groupBy(value) histogram
# (map-side combined, value-compressed), repartitionByRange over the
# histogram, per-PARTITION cumsum windows (never a global
# single-partition window) stitched with broadcast per-partition
# offsets, and a broadcast rank-interval join that picks each rank's
# crossing row.  Boundary extraction ships B-1 rows to the driver;
# assignment is a pure codegen projection.


def exact_range_boundaries(
    df: DataFrame, col: str, n_buckets: int, *, partitions: int = 32
) -> list:
    """B-1 exact boundary VALUES for balanced range bucketing (see
    module notes for the rank spec).  Raises on empty input."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from pyspark.sql import Window

    # localCheckpoint (not persist): repartitionByRange draws its
    # partition bounds from a nondeterministic sample, so a cache
    # eviction + lineage recompute could re-split the histogram AFTER
    # the offsets below were collected; checkpointing truncates the
    # lineage so the pid layout is pinned, not merely cached.
    # DataFrame.unpersist() does NOT release a localCheckpoint's
    # blocks (they live in a separately persisted RDD), so the ids of
    # the RDDs the checkpoint pins are diffed out here and unpersisted
    # explicitly in the finally below — deterministic release instead
    # of waiting on driver GC + the async ContextCleaner.
    jsc = df.sparkSession.sparkContext._jsc
    rdd_ids_before = set(jsc.getPersistentRDDs().keySet().toArray())
    hist = (
        df.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count("*").alias("c"))
        .repartitionByRange(partitions, "v")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    ckpt_ids = set(jsc.getPersistentRDDs().keySet().toArray()) - rdd_ids_before
    try:
        totals = sorted(
            (r.pid, r.t)
            for r in hist.groupBy("pid").agg(F.sum("c").alias("t")).collect()
        )
        n = sum(t for _, t in totals)
        if n == 0:
            raise ValueError(f"exact_range_boundaries: no non-null values in {col!r}")
        offsets, acc = {}, 0
        for pid, t in totals:
            offsets[pid] = acc
            acc += t
        off_expr = F.element_at(
            F.create_map(
                *[x for pid, o in offsets.items() for x in (F.lit(pid), F.lit(o))]
            ),
            F.col("pid"),
        )
        w_loc = Window.partitionBy("pid").orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = hist.withColumn("cum", F.sum("c").over(w_loc) + off_expr)
        ranks = df.sparkSession.createDataFrame(
            [(i, (i * n + n_buckets - 1) // n_buckets) for i in range(1, n_buckets)],
            "i int, r long",
        )
        # crossing row: previous cum < r <= cum — exactly one per rank
        bounds = cum.join(
            F.broadcast(ranks),
            (ranks.r <= cum.cum) & (ranks.r > cum.cum - cum.c),
        )
        rows = bounds.select("i", "v").collect()
    finally:
        # release the checkpointed histogram blocks deterministically,
        # including on the empty-input raise (the same leak class
        # k_core's error path had)
        live = jsc.getPersistentRDDs()
        for rid in ckpt_ids:
            jrdd = live.get(rid)
            if jrdd is not None:
                jrdd.unpersist()
    got = {r.i: r.v for r in rows}
    if len(got) != n_buckets - 1:
        raise AssertionError(
            f"rank join returned {len(got)} boundaries, expected {n_buckets - 1}"
        )
    return [got[i] for i in range(1, n_buckets)]


def kll_range_boundaries(df: DataFrame, col: str, n_buckets: int, *, k: int = 200) -> list:
    """Scale-path boundaries from the library's KLL sketch (one
    mergeable pass, no histogram shuffle): quantiles at i/B.  Rank
    error is the KLL guarantee (~O(1/k) of n) — callers that need the
    exact spec use :func:`exact_range_boundaries`."""
    if n_buckets < 2:  # same contract as the exact path — a silent []
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from ..operators.kll import KLL
    from ..plans.agg import build_sketch

    sk = build_sketch(df.where(F.col(col).isNotNull()), col, lambda: KLL(k=k))
    # native floats (KLL is float-domain): numpy scalars would break
    # both F.lit and the SQL twin's literal formatting
    return [float(x) for x in sk.quantiles([i / n_buckets for i in range(1, n_buckets)])]


def _native(b):
    """Coerce a boundary to a native int/float without precision loss
    (float() on an int64 boundary would be lossy beyond 2^53)."""
    if isinstance(b, bool):
        raise TypeError("boolean boundaries are not orderable buckets")
    if isinstance(b, int):
        return b
    if isinstance(b, float):
        return b
    if hasattr(b, "dtype"):  # numpy scalar
        if b.dtype.kind == "b":
            raise TypeError("boolean boundaries are not orderable buckets")
        return int(b) if b.dtype.kind in "iu" else float(b)
    return b  # str/date etc. pass through for Spark lit; SQL twin handles str


def range_bucket(col: Column | str, boundaries: list) -> Column:
    """bucket(x) = #{b in boundaries : x > b} — one codegen projection
    (B-1 strict comparisons summed), monotone, engine-portable.  NULL
    values map to NULL."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(0)
    for b in boundaries:
        out = out + (c > F.lit(_native(b))).cast("int")
    return out


def range_bucket_sql(col: str, boundaries: list) -> str:
    """DuckDB twin of :func:`range_bucket`.  Float boundaries are
    emitted as shortest-round-trip literals CAST to DOUBLE (a bare
    decimal literal would be DECIMAL-typed; the explicit cast
    guarantees the comparison constant is the bit-identical double)."""
    if not boundaries:
        return "0"

    def lit(b) -> str:
        b = _native(b)
        if isinstance(b, float):
            return f"CAST({b!r} AS DOUBLE)"
        if isinstance(b, int):
            return repr(b)
        s = str(b).replace("'", "''")
        return f"'{s}'"

    terms = " + ".join(f"(CASE WHEN {col} > {lit(b)} THEN 1 ELSE 0 END)" for b in boundaries)
    return f"({terms})"

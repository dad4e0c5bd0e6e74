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
           "normalize_minmax_sql", "cluster_by_zorder"]


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

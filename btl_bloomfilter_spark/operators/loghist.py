"""Log-linear histogram: integer-exact relative-error quantiles.

The third quantile engine in the library, with a guarantee the other
two don't give: KLL (operators/kll.py) bounds RANK error and t-digest
(operators/tdigest.py) concentrates accuracy at the tails, but
neither bounds VALUE error — ``p99 = 10_000`` from KLL may be any
value whose rank is within εn of the true p99, arbitrarily far in
value on a heavy-tailed column.  The log-linear histogram bounds
RELATIVE VALUE error: every reported quantile interval [lo, hi)
provably contains the exact nearest-rank quantile with
(hi − lo)/lo ≤ 1/k.

This is the HdrHistogram / DDSketch family (Tene, HdrHistogram;
Masson et al., "DDSketch", VLDB'19) re-based on EXACT integer
arithmetic: where DDSketch buckets by ``floor(log_γ x)`` — a float
computation whose edge cases differ across libm implementations —
this histogram buckets non-negative int64 values by binade + linear
sub-bucket, all in shifts and comparisons:

    e  = floor(log2 v)            (bit length − 1, exact)
    s  = max(e − log2(k), 0)      (k = sub-buckets/binade, power of 2)
    id = s·k + (v >> s)

  * v < 2k  →  id = v: small values (the bulk of turn/token counts)
    are counted EXACTLY (width-1 buckets);
  * v ≥ 2k  →  bucket [base·2^s, (base+1)·2^s) with base = v>>s in
    [k, 2k): width/lo = 1/base ≤ 1/k.

Buckets are contiguous and monotone in id, and (lo, width) are
recoverable from id alone: s = id div k − 1, base = id − s·k,
lo = base << s.  Everything is int shifts — bit-identical in numpy,
Spark SQL, and DuckDB, so the distributed quantile query
hash-oracles INCLUDING its bounds.

Two surfaces:

* :class:`LogHistogram` — the mergeable Sketch (merge = dense int64
  vector add: associative, commutative, value-deterministic under any
  partitioning, unlike KLL/t-digest whose states are order-sensitive
  even though their ESTIMATES are bounded).  Plugs into
  plans/agg.build_sketch, grouped sketch aggs, and streaming.
* :func:`grouped_log_quantiles` — the pure-Catalyst grouped query
  (one map-side-combined (group, id) histogram, one per-group
  value-compressed cumulative window, group-sized aggregate) with a
  DuckDB twin :func:`grouped_log_quantiles_sql`.

Reference tie-in: the same accuracy philosophy as the reference's
counting structures (CountingBloomFilter.hpp counts exactly, within
a known collision bound) — the error is a DESIGN PARAMETER, never a
float artifact.  Contract: values must be in [0, 2^62] (hi = lo +
width stays in int64); negative values RAISE in both engines.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .base import Sketch


def _check_k(k: int) -> int:
    if k < 2 or (k & (k - 1)) != 0 or k > 65536:
        raise ValueError(f"k must be a power of two in [2, 65536], got {k}")
    return int(k).bit_length() - 1  # j = log2(k)


def _n_ids(k: int) -> int:
    # ids run 0 .. (62 - j)*k + 2k - 1 for v <= 2^62  ->  (64 - j)*k
    j = _check_k(k)
    return (64 - j) * k


class LogHistogram(Sketch):
    """Mergeable log-linear histogram over non-negative int64 values.

    State is ONE dense int64 count vector of ``(64 − log2 k)·k``
    cells (~30 KB at k=64) — merge is element-wise add, so rebuilds
    are byte-identical under any partitioning/merge order (pinned by
    the partition-invariance test, same law as BloomFilter's OR).
    """

    def __init__(self, k: int = 64):
        self.j = _check_k(k)
        self.k = int(k)
        self.counts = np.zeros(_n_ids(k), dtype=np.int64)
        self.n = 0

    # -- bucketing (exact, vectorized) --------------------------------
    def _ids(self, v: np.ndarray) -> np.ndarray:
        if len(v) and int(v.min()) < 0:
            raise ValueError("LogHistogram: negative value")
        if len(v) and int(v.max()) > (1 << 62):
            raise ValueError("LogHistogram: value exceeds 2^62 contract")
        x = v.astype(np.uint64)
        e = np.zeros(len(v), dtype=np.int64)
        y = x.copy()
        for sh in (32, 16, 8, 4, 2, 1):
            m = y >> np.uint64(sh)
            has = m > 0
            e[has] += sh
            y[has] = m[has]
        s = np.maximum(e - self.j, 0).astype(np.uint64)
        return (s.astype(np.int64) * self.k) + (x >> s).astype(np.int64)

    @staticmethod
    def bucket_bounds(bucket_id: int, k: int) -> tuple[int, int]:
        """(lo, width) of a bucket — exact ints, recoverable from id."""
        if bucket_id < 2 * k:
            return bucket_id, 1
        s = bucket_id // k - 1
        base = bucket_id - s * k
        return base << s, 1 << s

    # -- Sketch protocol ----------------------------------------------
    def update(self, values) -> None:
        v = np.asarray(values)
        v = v[~np.isnan(v.astype("float64"))] if v.dtype.kind == "f" else v
        v = v.astype(np.int64)
        if len(v) == 0:
            return
        self.counts += np.bincount(self._ids(v), minlength=len(self.counts)).astype(
            np.int64
        )
        self.n += len(v)

    def merge(self, other: "LogHistogram") -> "LogHistogram":
        if not isinstance(other, LogHistogram) or other.k != self.k:
            raise ValueError("incompatible LogHistogram merge")
        self.counts += other.counts
        self.n += other.n
        return self

    def params(self) -> dict[str, Any]:
        return {"k": self.k}

    def state_bytes(self) -> bytes:
        return int(self.n).to_bytes(8, "little") + self.counts.tobytes()

    def load_state(self, payload: bytes) -> None:
        self.n = int.from_bytes(payload[:8], "little")
        self.counts = np.frombuffer(payload[8:], dtype=np.int64).copy()

    def metrics(self) -> dict[str, Any]:
        nz = int(np.count_nonzero(self.counts))
        return {"n": int(self.n), "buckets_used": nz, "buckets_total": len(self.counts)}

    # -- queries -------------------------------------------------------
    def quantile_bounds(self, q: float) -> tuple[int, int]:
        """[lo, hi) interval containing the exact nearest-rank
        q-quantile, with (hi − lo)/max(lo, 1) ≤ 1/k guaranteed."""
        if self.n == 0:
            raise ValueError("empty histogram")
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q}")
        q_milli = int(round(q * 1000))
        rank = max(1, -(-q_milli * self.n // 1000))  # ceil(q_milli*n/1000)
        cum = np.cumsum(self.counts)
        bucket = int(np.searchsorted(cum, rank))
        lo, w = self.bucket_bounds(bucket, self.k)
        return lo, lo + w

    def quantile(self, q: float) -> float:
        lo, hi = self.quantile_bounds(q)
        return float(lo) + float(hi - lo) / 2.0

    def quantiles(self, qs: Iterable[float]) -> list[float]:
        return [self.quantile(q) for q in qs]


def grouped_log_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    *,
    k: int = 64,
    qs_milli: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """Per-group quantiles with a guaranteed relative-value error
    bound, as ONE Catalyst plan (no sketch blobs, no Python) — the
    distributed twin of :class:`LogHistogram` with identical
    bucketing, so the two agree bucket-for-bucket.

    For each group and each q (in milli-units, e.g. 990 = p99):
    nearest-rank quantile bucket = first bucket whose cumulative
    count reaches ceil(q·n/1000), decided as the INTEGER comparison
    1000·cum ≥ q·n.  Output (group…, q_milli, n, bucket_id, est_lo,
    est_hi, est_mid): the exact quantile value lies in
    [est_lo, est_hi), (est_hi − est_lo)/max(est_lo,1) ≤ 1/k, and
    est_mid = lo + width/2 is two IEEE ops — everything
    hash-oracles against :func:`grouped_log_quantiles_sql`.

    NULL values are dropped; NEGATIVE values raise in both engines
    (the histogram is defined over non-negative counts/lengths);
    values must be ≤ 2^62 (documented contract, like the fixed-point
    family's overflow bounds).  The column must be INTEGRAL — a
    float/double column is REJECTED with ValueError rather than
    implicitly cast, because the implicit double→long cast TRUNCATES
    in Spark but ROUNDS half-away in DuckDB (3.7 → 3 vs 4) and NaN
    diverges too; quantize explicitly first (the library's
    floor(x·scale) policy), as q148 does.

    Scale shape: one map-side-combined groupBy to the (group, id)
    histogram — at most (64 − log2 k)·k ≈ 3.7k ids per group, so the
    shuffle is group-count-sized, never row-sized; one per-GROUP
    cumulative window over ≤3.7k rows; the ×|qs| explode happens on
    the bucket-sized table, group-sized aggregate after.
    """
    from pyspark.sql import Window

    j = _check_k(k)
    if not qs_milli or any(not 0 < q <= 1000 for q in qs_milli):
        raise ValueError(f"qs_milli must be nonempty with values in (0,1000]: {qs_milli}")
    v0 = F.col(value_col) if isinstance(value_col, str) else value_col
    vt = df.select(v0.alias("__probe")).schema[0].dataType.simpleString()
    if vt in ("float", "double") or vt.startswith("decimal"):
        raise ValueError(
            f"grouped_log_quantiles: column has non-integral type {vt}; "
            "quantize explicitly (e.g. floor(x * scale) cast to long) — "
            "implicit float->long casts truncate in Spark but round in DuckDB"
        )
    v = F.when(
        v0.cast("long") < 0,
        F.raise_error(
            F.concat(F.lit("grouped_log_quantiles: negative value "), v0.cast("string"))
        ).cast("long"),
    ).otherwise(v0.cast("long"))
    e = F.length(F.conv(v, 10, 2)) - F.lit(1)
    s = F.greatest(e - F.lit(j), F.lit(0))
    bucket = (
        s.cast("long") * F.lit(k)
        + F.call_function("shiftright", v, s.cast("int"))
    ).alias("__id")
    h = (
        df.where(v0.isNotNull())
        .groupBy(*group_cols, bucket)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wa = Window.partitionBy(*group_cols)
    c = h.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(wa)
    )
    qlit = F.array(*[F.lit(int(q)) for q in qs_milli])
    exp = c.select(
        *group_cols, "__id", "__cum", "__n", F.explode(qlit).alias("q_milli")
    )
    hit = exp.where(F.col("__cum") * 1000 >= F.col("q_milli") * F.col("__n"))
    agg = hit.groupBy(*group_cols, "q_milli").agg(
        F.min("__id").alias("__b"), F.first("__n").alias("__n")
    )
    b = F.col("__b")
    s2 = F.when(b < 2 * k, F.lit(0).cast("long")).otherwise(
        (b / k).cast("long") - 1
    )
    base = b - s2 * k
    lo = F.call_function("shiftleft", base, s2.cast("int")).cast("long")
    width = F.call_function(
        "shiftleft", F.lit(1).cast("long"), s2.cast("int")
    ).cast("long")
    return agg.select(
        *group_cols,
        F.col("q_milli").cast("int").alias("q_milli"),
        F.col("__n").cast("long").alias("n"),
        b.cast("long").alias("bucket_id"),
        lo.alias("est_lo"),
        (lo + width).alias("est_hi"),
        (lo.cast("double") + width.cast("double") / F.lit(2.0)).alias("est_mid"),
    )


def grouped_log_quantiles_sql(
    table: str,
    group: str,
    value: str,
    *,
    k: int = 64,
    qs_milli: tuple[int, ...] = (500, 900, 990),
) -> str:
    """DuckDB twin of :func:`grouped_log_quantiles` — identical
    shift-based bucketing and integer rank comparison."""
    j = _check_k(k)
    qs = ", ".join(f"({int(q)})" for q in qs_milli)
    return f"""
        WITH src AS (
            SELECT {group} AS g,
                   CASE WHEN CAST({value} AS BIGINT) < 0
                        THEN CAST(error('grouped_log_quantiles: negative value') AS BIGINT)
                        ELSE CAST({value} AS BIGINT) END AS v
            FROM {table} WHERE {value} IS NOT NULL
        ),
        b AS (
            SELECT g,
                   greatest(length(bin(v)) - 1 - {j}, 0) * {k}
                     + (v >> greatest(length(bin(v)) - 1 - {j}, 0)) AS id
            FROM src
        ),
        h AS (SELECT g, id, count(*)::bigint AS c FROM b GROUP BY g, id),
        c AS (
            SELECT g, id,
                   sum(c) OVER (PARTITION BY g ORDER BY id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   sum(c) OVER (PARTITION BY g) AS n
            FROM h
        ),
        hit AS (
            SELECT g, q.q_milli, id, n
            FROM c CROSS JOIN (VALUES {qs}) q(q_milli)
            WHERE cum * 1000 >= q.q_milli * n
        ),
        agg AS (
            SELECT g, q_milli, min(id) AS b, any_value(n) AS n
            FROM hit GROUP BY g, q_milli
        ),
        fin AS (
            SELECT g, q_milli, n, b,
                   CASE WHEN b < {2 * k} THEN 0 ELSE b // {k} - 1 END AS s2
            FROM agg
        )
        SELECT g AS {group}, CAST(q_milli AS INT) AS q_milli,
               CAST(n AS BIGINT) AS n, CAST(b AS BIGINT) AS bucket_id,
               CAST((b - s2 * {k}) << s2 AS BIGINT) AS est_lo,
               CAST(((b - s2 * {k}) << s2) + (1::BIGINT << s2) AS BIGINT) AS est_hi,
               CAST((b - s2 * {k}) << s2 AS DOUBLE)
                 + CAST(1::BIGINT << s2 AS DOUBLE) / 2.0 AS est_mid
        FROM fin
    """

"""Misra-Gries mergeable heavy-hitters summary (deterministic top-k).

The north_rule asks for "heavy-hitter tools" as a mergeable sketch.
The engine already answers that with Count-Min (``operators.counting``,
q33/q88) — a randomized, *overestimating* structure whose state is
``d*w`` counters regardless of how skewed the data is.  Misra-Gries
(Misra & Gries, Sci. Comput. Program. 1982) is the complementary
deterministic summary: exactly ``k`` (item, count) pairs, *under*
estimates, and the classic frequent-items guarantee

    est(x) <= true(x) <= est(x) + N/(k+1)        for every item x,
    every x with true(x) > N/(k+1) is IN the summary.

Mergeability is the Agarwal et al. "Mergeable Summaries" (PODS'12,
§3.1) result: two MG summaries merge by adding counts item-wise and
then COMPRESSING — subtract the (k+1)-th largest count from every
counter and drop the non-positive ones.  Each compress that subtracts
``c*`` removes at least ``(k+1)*c*`` total weight, so the sum of all
subtractions across every partition and every merge level is at most
``N/(k+1)`` — the single-stream bound survives arbitrary partitioning
and merge trees, which is exactly the property a distributed build
needs (north_rule: "merge associativity ... under arbitrary partition
orderings").

Reference parity: btl_bloomfilter has no frequency sketch of its own —
its CountingBloomFilter (`CountingBloomFilter.hpp:135-183`) is the
closest surface and is already covered by ``operators.counting``.
MG is included as the deterministic member of the heavy-hitter family,
same as HLL/KLL/t-digest round out the cardinality/quantile families.

100-TB shape: stage 1 is a pure ``mapInPandas`` over the scan — each
task folds Arrow-batch ``value_counts`` into one bounded pandas Series
(compressed back to ``k`` whenever it exceeds ``compress_at``) and
emits at most ``k`` (item, cnt) rows plus ONE meta row carrying the
partition's row count and subtraction total.  Only ``P*(k+1)`` rows
ever cross the single shuffle (`groupBy(item).sum` — map-side partial
agg applies); the driver's final compress sees at most ``P*k`` rows.
No corpus-sized state, no skew sensitivity (a hot item is one counter,
not one shuffle key carrying its rows).

The summary is partition-dependent (WHICH borderline items survive
depends on where the stream was cut) but the guarantee above is not —
the board query (q93) therefore gates the bounds and the
all-heavy-found law rather than hash-comparing the summary itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["MGSummary", "mg_compress", "mg_partials", "mg_topk", "mg_topk_by_key"]


def mg_compress(counts: pd.Series, k: int) -> tuple[pd.Series, int]:
    """Reduce a (item -> count) Series to at most ``k`` counters.

    Subtracts the (k+1)-th largest count ``c*`` from every counter and
    drops the non-positive ones (PODS'12 §3.1 MERGE step).  At most
    ``k`` counters can exceed ``c*``, so the result is bounded; every
    surviving estimate shrinks by exactly ``c*`` and every dropped
    item's estimate was at most ``c*`` — either way per-item error
    grows by at most ``c*``.  Returns ``(compressed, c*)``.
    """
    if len(counts) <= k:
        return counts, 0
    vals = counts.to_numpy()
    j = len(vals) - k - 1  # (k+1)-th largest == (n-k)-th smallest
    cstar = int(np.partition(vals, j)[j])
    kept = counts[counts > cstar] - cstar
    return kept, cstar


def mg_partials(df: DataFrame, col: str, k: int, *, compress_at: int | None = None) -> DataFrame:
    """Per-partition MG summaries as a tiny DataFrame.

    Output schema ``(item string, cnt long, n_rows long, subtracted
    long)``: data rows have ``item`` non-null and carry counts; each
    partition additionally emits ONE meta row (``item`` NULL) with its
    total non-null row count and its accumulated compress subtraction.
    NULLs in ``col`` are excluded (documented, matching every other
    sketch builder here).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    cap = int(compress_at) if compress_at is not None else max(8 * k, 1024)
    if cap < k:
        raise ValueError("compress_at must be >= k")
    src = df.select(F.col(col).cast("string").alias("item")).where(F.col("item").isNotNull())

    def fn(batches):
        counts = pd.Series(dtype="int64")
        n = 0
        subtracted = 0
        for pdf in batches:
            vc = pdf["item"].value_counts()
            n += int(vc.sum())
            counts = pd.concat([counts, vc]).groupby(level=0).sum()
            if len(counts) > cap:
                counts, d = mg_compress(counts, k)
                subtracted += d
        counts, d = mg_compress(counts, k)
        subtracted += d
        out = pd.DataFrame(
            {
                "item": list(counts.index) + [None],
                "cnt": list(counts.to_numpy()) + [0],
                "n_rows": [0] * len(counts) + [n],
                "subtracted": [0] * len(counts) + [subtracted],
            }
        )
        yield out.astype({"cnt": "int64", "n_rows": "int64", "subtracted": "int64"})

    return src.mapInPandas(fn, "item string, cnt long, n_rows long, subtracted long")


@dataclass
class MGSummary:
    """Driver-side merged Misra-Gries summary."""

    k: int
    n: int  # total non-null rows summarized
    subtracted: int  # sum of every compress subtraction (tracked bound)
    counts: dict[str, int] = field(default_factory=dict)

    @property
    def err_bound(self) -> int:
        """Analytic worst-case underestimate: floor(N/(k+1))."""
        return self.n // (self.k + 1)

    @property
    def tracked_bound(self) -> int:
        """Data-dependent bound (<= err_bound): total weight actually
        subtracted across all partitions and merge levels; no item's
        underestimate can exceed it."""
        return self.subtracted

    def estimate(self, item: str) -> int:
        return self.counts.get(item, 0)


def mg_topk_by_key(df: DataFrame, keys: list[str], col: str, k: int) -> DataFrame:
    """Per-group Misra-Gries summary: for each distinct ``keys`` tuple,
    at most ``k`` (item, mg_est) rows plus the group size and its
    N/(k+1) bound.  ``applyInPandas`` per group — exact in-group
    ``value_counts`` (distinct-bounded state) then ONE compress, so
    estimates obey the same laws as :func:`mg_topk` and, whenever a
    group has <= k distinct items, equal the exact counts — which is
    how the board query (q99) hash-oracles this path against a plain
    GROUP BY.  Unlike the global summary, the per-group result is
    fully deterministic (no partition-cut dependence: the whole group
    reaches one task).

    Shape note: right for MANY moderate groups (per-task memory is the
    group's DISTINCT items, but Spark materializes the group's rows
    per task); for one giant key use :func:`mg_topk` over the filtered
    frame instead."""
    if k <= 0:
        raise ValueError("k must be positive")
    if not keys:
        raise ValueError("keys must name at least one column")
    reserved = {"item", "mg_est", "n_group", "err_bound"}
    clash = reserved.intersection(keys)
    if clash:
        raise ValueError(f"key columns collide with output names: {sorted(clash)}")
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [df.schema[kc] for kc in keys]
        + [
            StructField("item", StringType()),
            StructField("mg_est", LongType()),
            StructField("n_group", LongType()),
            StructField("err_bound", LongType()),
        ]
    )
    src = df.select(*keys, F.col(col).cast("string").alias("__item"))

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        vc = pdf["__item"].dropna().value_counts()
        n = int(vc.sum())
        counts, _ = mg_compress(vc, k)
        out = pd.DataFrame({"item": counts.index, "mg_est": counts.to_numpy()})
        for kc, kv in zip(keys, key):
            out[kc] = kv
        out["n_group"] = n
        out["err_bound"] = n // (k + 1)
        return out[[*keys, "item", "mg_est", "n_group", "err_bound"]]

    return src.groupBy(*keys).applyInPandas(fn, out_schema)


def mg_topk(df: DataFrame, col: str, k: int, *, compress_at: int | None = None) -> MGSummary:
    """Distributed Misra-Gries: mapInPandas partials -> one tiny
    ``groupBy(item).sum`` shuffle (at most ``partitions*(k+1)`` rows)
    -> driver compress to ``k``.  Guarantees (gated by q93 and
    tests/test_topk.py): for every item, ``est <= true`` and
    ``true - est <= min(n//(k+1), subtracted)``; every item with
    ``true > n//(k+1)`` appears in the summary."""
    parts = mg_partials(df, col, k, compress_at=compress_at)
    merged = parts.groupBy("item").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("subtracted").alias("subtracted"),
    )
    rows = merged.collect()
    n = 0
    subtracted = 0
    data: dict[str, int] = {}
    for r in rows:
        if r["item"] is None:
            n += r["n_rows"]
            subtracted += r["subtracted"]
        else:
            data[r["item"]] = r["cnt"]
    counts = pd.Series(data, dtype="int64")
    counts, d = mg_compress(counts, k)
    subtracted += d
    return MGSummary(k=int(k), n=n, subtracted=subtracted, counts={str(i): int(c) for i, c in counts.items()})

"""Distributed sketch-build plans.

The reference parallelizes by having OpenMP threads atomically update
one shared array (`Tests/AdHoc/ParallelFilter.cpp:109-120`).  The
Spark-native equivalent is:

    scan (column-pruned) → [repartition] → mapInPandas per-partition
    build (Arrow batches, numpy kernels, zero per-row Python) →
    tree-wise merge via groupBy(pid % fanin).applyInPandas →
    driver finalize

Merging replaces atomicity: every sketch's ``merge`` is associative +
commutative, so partition order never matters (tests verify under
permutations).  The tree fan-in bounds both shuffle width and driver
memory — with 10k partitions and fanin=16 no single task ever merges
more than 16 blobs, and the driver only ever collects ≤ fanin rows.

Checkpointing (north_rule): stage-0 partials can be persisted to a
Parquet state table with per-partition lineage + fill metrics; a rerun
with the same params resumes from it without rescanning the source.
"""

from __future__ import annotations

import json
import math
import os
from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.base import Sketch

PARTIAL_SCHEMA = "pid long, blob binary, n_rows long, metrics string"


def _build_fn(make_sketch: Callable[[], Sketch], colname: str):
    def fn(batches):
        from pyspark import TaskContext

        sk = make_sketch()
        n_rows = 0
        for pdf in batches:
            sk.update(pdf[colname])
            n_rows += len(pdf)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        yield pd.DataFrame(
            {
                "pid": [pid],
                "blob": [sk.serialize()],
                "n_rows": [n_rows],
                "metrics": [json.dumps(sk.metrics())],
            }
        )

    return fn


def _build_fn_arrow(make_sketch: Callable[[], Sketch], colname: str):
    """mapInArrow builder: feeds the sketch the raw Arrow column —
    zero-copy UTF-8 buffers, no pandas string materialization (which
    costs ~40% of partial-build wall time on text-heavy batches)."""

    def fn(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        sk = make_sketch()
        n_rows = 0
        for rb in batches:
            sk.update_arrow(rb.column(rb.schema.get_field_index(colname)))
            n_rows += rb.num_rows
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        yield pa.record_batch(
            [
                pa.array([pid], pa.int64()),
                pa.array([sk.serialize()], pa.binary()),
                pa.array([n_rows], pa.int64()),
                pa.array([json.dumps(sk.metrics())], pa.string()),
            ],
            names=["pid", "blob", "n_rows", "metrics"],
        )

    return fn


def _merge_stream_fn(batches):
    """Merge every partial in this (coalesced) partition via the
    sketch's batched bulk path."""
    from pyspark import TaskContext

    blobs: list[bytes] = []
    n_rows = 0
    for pdf in batches:
        for blob, nr in zip(pdf["blob"], pdf["n_rows"]):
            blobs.append(bytes(blob))
            n_rows += int(nr)
    if not blobs:
        return
    sk = Sketch.merge_blobs(blobs)
    ctx = TaskContext.get()
    yield pd.DataFrame(
        {
            "pid": [ctx.partitionId() if ctx is not None else 0],
            "blob": [sk.serialize()],
            "n_rows": [n_rows],
            "metrics": [json.dumps(sk.metrics())],
        }
    )


def partial_sketches(
    df: DataFrame,
    col: str,
    make_sketch: Callable[[], Sketch],
    *,
    repartition: int | None = None,
    proto: Sketch | None = None,
) -> DataFrame:
    """Stage 0: one serialized partial sketch per partition.

    ``select(col)`` first so Catalyst prunes columns at the scan.
    ``proto`` lets callers that already built a prototype avoid a
    second full-size allocation (a GB-scale filter is real memory).
    """
    sdf = df.select(col)
    if repartition:
        sdf = sdf.repartition(repartition)
    probe = proto if proto is not None else make_sketch()
    if hasattr(probe, "update_arrow") and dict(sdf.dtypes)[col] == "string":
        return sdf.mapInArrow(_build_fn_arrow(make_sketch, col), PARTIAL_SCHEMA)
    return sdf.mapInPandas(_build_fn(make_sketch, col), PARTIAL_SCHEMA)


SLICED_SCHEMA = "slice long, blob binary, n_rows long, n_entry long, t_entry long"


def _build_fn_arrow_sliced(make_sketch: Callable[[], Sketch], colname: str, n_slices: int):
    """mapInArrow builder emitting R state slices per partition
    (reduce-scatter stage 1).  Partition counters ride on slice 0."""

    def fn(batches):
        import pyarrow as pa

        sk = make_sketch()
        n_rows = 0
        for rb in batches:
            sk.update_arrow(rb.column(rb.schema.get_field_index(colname)))
            n_rows += rb.num_rows
        slices = sk.state_slices(n_slices)
        n = len(slices)
        yield pa.record_batch(
            [
                pa.array(list(range(n)), pa.int64()),
                pa.array(slices, pa.binary()),
                pa.array([n_rows] + [0] * (n - 1), pa.int64()),
                pa.array([getattr(sk, "n_entry", 0)] + [0] * (n - 1), pa.int64()),
                pa.array([getattr(sk, "t_entry", 0)] + [0] * (n - 1), pa.int64()),
            ],
            names=["slice", "blob", "n_rows", "n_entry", "t_entry"],
        )

    return fn


def build_sketch_sliced(
    df: DataFrame,
    col: str,
    make_sketch: Callable[[], Sketch],
    *,
    repartition: int | None = None,
    n_slices: int | None = None,
) -> Sketch:
    """Reduce-scatter build for array-register sketches.

    Stage 1 (mapInArrow): per-partition sketch → R byte-range slices.
    Stage 2 (groupBy(slice)): each of the R reduce tasks ORs only its
    range of every partial — merge parallelism is R, not fan-in, so
    reduce bandwidth scales with the cluster.  Driver collects exactly
    m/8 bytes (the R merged dense slices) and concatenates.
    """
    spark = df.sparkSession
    proto = make_sketch()
    params = proto.params()
    cls = type(proto)
    if n_slices is None:
        n_slices = max(16, min(256, spark.sparkContext.defaultParallelism * 2))
    sdf = df.select(col)
    if repartition:
        sdf = sdf.repartition(repartition)
    sliced = sdf.mapInArrow(_build_fn_arrow_sliced(make_sketch, col, n_slices), SLICED_SCHEMA)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sidx = int(pdf["slice"].iloc[0])
        merged = cls.merge_slice_blobs(params, sidx, n_slices, [bytes(b) for b in pdf["blob"]])
        return pd.DataFrame(
            {
                "slice": [sidx],
                "blob": [merged],
                "n_rows": [int(pdf["n_rows"].sum())],
                "n_entry": [int(pdf["n_entry"].sum())],
                "t_entry": [int(pdf["t_entry"].sum())],
            }
        )

    rows = sliced.groupBy("slice").applyInPandas(merge_group, SLICED_SCHEMA).collect()
    rows.sort(key=lambda r: r["slice"])
    if not rows:
        raise ValueError("no partitions produced partial sketches")
    if len(rows) != n_slices:
        raise ValueError(f"expected {n_slices} merged slices, got {len(rows)}")
    return cls.assemble_slices(
        params,
        [bytes(r["blob"]) for r in rows],
        n_entry=sum(r["n_entry"] for r in rows),
        t_entry=sum(r["t_entry"] for r in rows),
    )


def tree_merge(partials: DataFrame, num_partials: int, *, fanin: int = 16) -> Sketch:
    """Reduce partials tree-wise with NARROW (shuffle-free) stages.

    Blobs are big (m/8 bytes); a hash-shuffle would spill them to
    shuffle files and re-read.  Instead each reduction level persists
    the current partials (so the coalesce below doesn't collapse the
    upstream build stage's parallelism) and `coalesce(groups)` merges
    fanin parents per task via a narrow dependency — no shuffle files,
    no exchange.  The driver only ever collects ≤ fanin final blobs.
    """
    from pyspark import StorageLevel

    cur = partials
    n = max(1, num_partials)
    persisted = []
    while n > fanin:
        cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
        cur.count()  # materialize at full upstream parallelism
        persisted.append(cur)
        groups = math.ceil(n / fanin)
        cur = cur.coalesce(groups).mapInPandas(_merge_stream_fn, PARTIAL_SCHEMA)
        n = groups
    rows = cur.collect()
    for p in persisted:
        p.unpersist()
    if not rows:
        raise ValueError("no partitions produced partial sketches")
    return Sketch.merge_blobs([bytes(r["blob"]) for r in rows])


def build_sketch(
    df: DataFrame,
    col: str,
    make_sketch: Callable[[], Sketch],
    *,
    repartition: int | None = None,
    fanin: int = 16,
    checkpoint_dir: str | None = None,
    lineage: str = "",
    strategy: str = "auto",
) -> Sketch:
    """Full distributed build: partials → (checkpoint) → merge.

    strategy:
      - "sliced" / "auto": reduce-scatter merge (build_sketch_sliced)
        when the sketch supports byte-range slicing and no checkpoint
        is requested — merge parallelism scales with the cluster.
      - "tree": partial blobs + narrow coalesce tree merge; required
        for checkpoint/resume (partials persist as the state table).

    With ``checkpoint_dir`` the stage-0 partials are persisted (with
    lineage + metrics columns); a rerun whose params match resumes
    from them instead of rescanning the source (north_rule resume).
    ``checkpoint_dir`` must be a driver-visible local/shared POSIX
    path (see :func:`require_local_checkpoint_dir`).
    """
    spark = df.sparkSession
    if checkpoint_dir:
        require_local_checkpoint_dir(checkpoint_dir)
    proto = make_sketch()
    if (
        strategy in ("auto", "sliced")
        and checkpoint_dir is None
        and proto.state_slices(2) is not None
        and hasattr(proto, "update_arrow")
        and dict(df.select(col).dtypes)[col] == "string"
    ):
        return build_sketch_sliced(df, col, make_sketch, repartition=repartition)
    params_json = json.dumps(
        {"cls": type(proto).__name__, "params": proto.checkpoint_params(), "col": col, "lineage": lineage},
        sort_keys=True,
    )
    if checkpoint_dir and _checkpoint_matches(checkpoint_dir, params_json):
        partials = spark.read.parquet(os.path.join(checkpoint_dir, "partials"))
        n = partials.count()
        return tree_merge(partials, n, fanin=fanin)

    partials = partial_sketches(df, col, make_sketch, repartition=repartition, proto=proto)
    if checkpoint_dir:
        path = os.path.join(checkpoint_dir, "partials")
        # invalidate BEFORE overwriting: a crash between writing new
        # partials and new params.json must not leave the OLD params
        # paired with NEW partials (a later run would silently resume
        # from mismatched state)
        stale = os.path.join(checkpoint_dir, "params.json")
        if os.path.exists(stale):
            os.remove(stale)
        partials.withColumn("lineage", F.lit(lineage)).write.mode("overwrite").parquet(path)
        with open(os.path.join(checkpoint_dir, "params.json"), "w") as f:
            f.write(params_json)
        partials = spark.read.parquet(path)
        n = partials.count()
    else:
        n = df.rdd.getNumPartitions() if repartition is None else repartition
    return tree_merge(partials, n, fanin=fanin)


def require_local_checkpoint_dir(checkpoint_dir: str) -> None:
    """The checkpoint convention (Spark-written parquet data + a
    driver-written params.json/_SUCCESS marker pair) requires a
    DRIVER-VISIBLE local/shared POSIX path: with an HDFS/S3 URI the
    data would land remotely while the marker silently lands on the
    driver's disk and resume never triggers (ADVICE r4).  Fail fast on
    any non-file scheme instead; a remote store needs the markers
    routed through the Hadoop FileSystem API, which this library
    deliberately keeps out of its driver path.  Any URI scheme is
    rejected — including file:// , which Spark's writer would accept
    but the driver's open()/os.path marker I/O would mangle into a
    relative './file:...' path — pass the plain POSIX path instead."""
    if "://" in checkpoint_dir:
        scheme = checkpoint_dir.split("://", 1)[0]
        raise ValueError(
            f"checkpoint_dir must be a plain driver-visible local/shared "
            f"filesystem path (got scheme {scheme!r}: {checkpoint_dir!r}); "
            f"mount the store and pass the POSIX mount path (no file:// prefix)"
        )


def _checkpoint_matches(checkpoint_dir: str, params_json: str) -> bool:
    p = os.path.join(checkpoint_dir, "params.json")
    success = os.path.join(checkpoint_dir, "partials", "_SUCCESS")
    if not (os.path.exists(p) and os.path.exists(success)):
        return False
    with open(p) as f:
        return f.read() == params_json


# ---------------------------------------------------------------------------
# Grouped sketch aggregation (map-side partial agg + shuffle of blobs only)
# ---------------------------------------------------------------------------


def grouped_partials_fn(make_sketch: Callable[[], Sketch], keys: Sequence[str], col: str):
    def fn(batches):
        states: dict[tuple, Sketch] = {}
        for pdf in batches:
            for kv, sub in pdf.groupby(list(keys), dropna=False, sort=False):
                if not isinstance(kv, tuple):
                    kv = (kv,)
                sk = states.get(kv)
                if sk is None:
                    sk = states[kv] = make_sketch()
                sk.update(sub[col])
        for kv, sk in states.items():
            row = {k: [v] for k, v in zip(keys, kv)}
            row["blob"] = [sk.serialize()]
            yield pd.DataFrame(row)

    return fn


def grouped_partials_fn_arrow(make_sketch: Callable[[], Sketch], keys: Sequence[str], col: str):
    """mapInArrow grouped builder: only the (short) key columns are
    materialized to python; the value column stays Arrow — per-key
    slices go through update_arrow zero-copy."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        states: dict[tuple, Sketch] = {}
        key_types: list = []
        for rb in batches:
            vals = rb.column(rb.schema.get_field_index(col))
            key_types = [rb.schema.field(k).type for k in keys]
            key_pdf = rb.select(list(keys)).to_pandas()
            # ONE take per batch: gather rows permuted into key order,
            # then hand each key a zero-copy contiguous slice — with
            # many keys this beats a per-key take by the number of keys
            groups = key_pdf.groupby(list(keys), dropna=False, sort=False)
            idx_blocks = []
            spans: list[tuple] = []  # (key, start, len)
            pos = 0
            for kv, sub in groups:
                if not isinstance(kv, tuple):
                    kv = (kv,)
                ix = sub.index.to_numpy()
                idx_blocks.append(ix)
                spans.append((kv, pos, ix.size))
                pos += ix.size
            if not spans:
                continue
            ordered = vals.take(pa.array(np.concatenate(idx_blocks)))
            for kv, start, ln in spans:
                sk = states.get(kv)
                if sk is None:
                    sk = states[kv] = make_sketch()
                sk.update_arrow(ordered.slice(start, ln))
        for kv, sk in states.items():
            # explicit key types: pa.array([None]) is null-typed and the
            # JVM cannot read it as the declared key column (null keys
            # crashed the job; pandas NaN keys normalize back to null)
            arrays = [
                pa.array([None if pd.isna(v) else v], type=t) for v, t in zip(kv, key_types)
            ]
            arrays.append(pa.array([sk.serialize()], pa.binary()))
            yield pa.record_batch(arrays, names=list(keys) + ["blob"])

    return fn


def sketch_by_key(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    make_sketch: Callable[[], Sketch],
    finalize: Callable[[Sketch], float],
    out_col: str = "estimate",
    *,
    key_schema: str | None = None,
    salt_partitions: int | None = None,
    out_type: str = "double",
) -> DataFrame:
    """Per-key sketch estimates with map-side partial aggregation.

    ``out_type`` is the DDL type of ``finalize``'s return value —
    default scalar ``double``; pass e.g. ``array<double>`` for
    multi-quantile finalizes (the value is emitted as-is then).

    Stage 1 (mapInPandas) builds one partial sketch per (partition,
    key) — the sketch analog of a map-side combine, so only
    (key, blob) rows shuffle, never raw values.  Stage 2 merges per
    key and finalizes.  With ``salt_partitions`` an intermediate
    groupBy(keys, salt) stage splits hot keys across reducers before
    the final merge (north_rule skew mitigation).
    """
    keys = list(keys)
    if key_schema is None:
        # infer DDL types from the input schema (defaulting every key
        # to string silently corrupts numeric keys)
        type_of = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        key_schema = ", ".join(f"{k} {type_of[k]}" for k in keys)
    partial_schema = f"{key_schema}, blob binary"
    out_schema = f"{key_schema}, {out_col} {out_type}"

    sdf = df.select(*keys, col)
    proto = make_sketch()
    if hasattr(proto, "update_arrow") and dict(sdf.dtypes)[col] == "string":
        partials = sdf.mapInArrow(grouped_partials_fn_arrow(make_sketch, keys, col), partial_schema)
    else:
        partials = sdf.mapInPandas(grouped_partials_fn(make_sketch, keys, col), partial_schema)

    def _merge_partition_fn(group_cols: list[str], payload_col: str, emit):
        """mapInPandas body: merge blobs per key WITHIN a hash-
        partitioned partition.  One Python call per PARTITION (a
        groupBy().applyInPandas here pays per-GROUP call overhead —
        at thousands of keys that dominates the whole job)."""

        def fn(batches):
            acc: dict[tuple, Sketch] = {}
            for pdf in batches:
                for kv, sub in pdf.groupby(group_cols, dropna=False, sort=False):
                    if not isinstance(kv, tuple):
                        kv = (kv,)
                    sk = Sketch.merge_blobs([bytes(b) for b in sub["blob"]])
                    prev = acc.get(kv)
                    acc[kv] = sk if prev is None else prev.merge(sk)
            if not acc:
                return
            rows: dict[str, list] = {c: [] for c in group_cols}
            rows[payload_col] = []
            for kv, sk in acc.items():
                for c, v in zip(group_cols, kv):
                    rows[c].append(v)
                rows[payload_col].append(emit(sk))
            yield pd.DataFrame(rows)

        return fn

    if salt_partitions:
        # salt must be DETERMINISTIC: a nondeterministic expression
        # (e.g. monotonically_increasing_id) feeding a groupBy shuffle
        # re-salts rows differently on stage retry, duplicating or
        # dropping partial blobs.  Hashing (keys, blob) is a pure
        # function of the row, so recomputes land in the same bucket.
        salted = partials.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.col("blob")), F.lit(salt_partitions)),
        )
        partials = (
            salted.repartition(*[F.col(k) for k in keys], F.col("__salt"))
            .mapInPandas(
                _merge_partition_fn(keys + ["__salt"], "blob", lambda sk: sk.serialize()),
                f"{key_schema}, __salt bigint, blob binary",
            )
            .drop("__salt")
        )

    emit = (lambda sk: float(finalize(sk))) if out_type == "double" else finalize
    return partials.repartition(*[F.col(k) for k in keys]).mapInPandas(
        _merge_partition_fn(keys, out_col, emit), out_schema
    )

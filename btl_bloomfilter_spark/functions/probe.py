"""Broadcast-probe column functions.

The reference's query path (`testBloom_rolling.cpp:19-33`) streams a
corpus against a loaded filter.  Spark-native equivalent: broadcast
the serialized sketch once, then probe with an Arrow-vectorized
pandas UDF — a pure map (no shuffle), Catalyst plans it as
`Project(ArrowEvalPython)` over a pruned scan.  Using
`df.filter(bloom_contains(...))` is a broadcast semi-join against the
Bloom filter, the classic BF use.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql.functions import pandas_udf

from ..operators.base import Sketch

# per-worker deserialized-sketch cache (rebuilt lazily per executor).
# Keyed by CONTENT hash so identical sketches probed repeatedly share
# one entry, and bounded (FIFO) so a long-lived app probing many
# filters can't accumulate GBs of dense state in every Python worker.
_WORKER_CACHE: dict[str, Sketch] = {}
_WORKER_CACHE_MAX = 8


def _cache_get(token: str, blob_value) -> Sketch:
    sk = _WORKER_CACHE.get(token)
    if sk is None:
        while len(_WORKER_CACHE) >= _WORKER_CACHE_MAX:
            _WORKER_CACHE.pop(next(iter(_WORKER_CACHE)))
        sk = _WORKER_CACHE[token] = Sketch.deserialize(blob_value)
    return sk


def _blob_token(blob: bytes) -> str:
    import hashlib

    return hashlib.sha1(blob).hexdigest()


def _probe_udf(spark: SparkSession, sketch: Sketch, method: str, ret_type: str):
    blob = sketch.serialize()
    bc = spark.sparkContext.broadcast(blob)
    token = _blob_token(blob)

    @pandas_udf(ret_type)
    def probe(s: pd.Series) -> pd.Series:
        sk = _cache_get(token, bc.value)
        return pd.Series(getattr(sk, method)(s))

    return probe


def bloom_contains(spark: SparkSession, bf, col) -> Column:
    """True iff every window/element of the value is in the filter
    (BloomFilter.hpp:237-262 semantics, per-string reduction)."""
    return _probe_udf(spark, bf, "contains_batch", "boolean")(col)


def bloom_seen_fraction(spark: SparkSession, bf, col) -> Column:
    """Fraction of the string's k-gram windows present in the filter
    (hits/total tally of testBloom_rolling.cpp:27-32)."""
    return _probe_udf(spark, bf, "seen_fraction", "double")(col)


def counting_estimate(spark: SparkSession, cbf, col) -> Column:
    """Min-count estimate per element (CountingBloomFilter.hpp:190-196
    / count-min point query)."""
    return _probe_udf(spark, cbf, "estimate_batch", "double")(col)


def register_sql(spark: SparkSession, name: str, sketch: Sketch, method: str, ret_type: str) -> None:
    """Expose a probe as a SQL function: SELECT name(text) FROM ..."""
    spark.udf.register(name, _probe_udf(spark, sketch, method, ret_type))


def with_probe_columns(
    df,
    sketch: Sketch,
    col: str,
    *,
    frac_col: str | None = None,
    contains_col: str | None = None,
    keep: list[str] | None = None,
):
    """Zero-copy probe: append seen-fraction / contains columns via
    mapInArrow — the hot query path at scale, no pandas string
    materialization (unlike the pandas_udf Column variants above).
    Returns df + requested columns; plan stays a pure map.

    ``keep`` prunes the OUTPUT columns (mapInArrow is opaque to
    Catalyst, so downstream projection cannot prune through it): pass
    the columns the consumer actually needs — e.g. ``keep=[]`` when
    only aggregating the probe column — and the probed text column is
    not re-serialized back across the Arrow boundary (at probe scale
    that write-back otherwise rivals the probe compute itself)."""
    import pyarrow as pa

    spark = df.sparkSession
    blob = sketch.serialize()
    bc = spark.sparkContext.broadcast(blob)
    token = _blob_token(blob)

    if keep is None:
        keep = [f.name for f in df.schema.fields]
    # prune the INPUT side too: mapInArrow is opaque to Catalyst in
    # both directions, so without this select the scan reads (and the
    # JVM→Python bridge serializes) every column of df even when only
    # the probe column and `keep` are consumed
    need = list(dict.fromkeys(keep + [col]))
    if len(need) < len(df.schema.fields):
        df = df.select(*need)
    type_of = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    fields = [f"{c} {type_of[c]}" for c in keep]
    if frac_col:
        fields.append(f"{frac_col} double")
    if contains_col:
        fields.append(f"{contains_col} boolean")
    out_schema = ", ".join(fields)

    def fn(batches):
        sk = _cache_get(token, bc.value)
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index(col))
            arrays = [rb.column(rb.schema.get_field_index(c)) for c in keep]
            names = list(keep)
            if frac_col:
                arrays.append(pa.array(sk.seen_fraction_arrow(arr), pa.float64()))
                names.append(frac_col)
            if contains_col:
                arrays.append(pa.array(sk.contains_arrow(arr), pa.bool_()))
                names.append(contains_col)
            yield pa.record_batch(arrays, names=names)

    return df.mapInArrow(fn, out_schema)

"""Streaming gap-based sessionization via Spark's native
``session_window`` — the Structured Streaming twin of
``operators/sessions`` (same semantics, managed state instead of a
sort window).

Semantics bridge (pinned by q146's gates): Spark's session window is
[first_ts, last_ts + gap) and merges two events iff the later one
starts STRICTLY before the earlier window's end, i.e. a new session
starts when the gap is >= ``gap`` — while the batch sessionizer
(`sessions.sessionize`) breaks when the gap is STRICTLY > gap.  The
two disagree only when an inter-event gap equals the session gap to
the MICROSECOND; callers comparing the two (and q146) either choose a
gap no real data hits exactly or assert the no-boundary-gap
precondition.  ``session_start``/``session_end`` are reported in
batch terms: start = first event, end = last event (window end minus
gap), so rows are directly comparable to ``sessions.session_stats``.

Scale shape: state is per (key, open-session) — Spark merges session
windows in the state store and finalizes a session once the watermark
passes its end; the aggregation is map-side combined per micro-batch
before touching state.  Append output mode means each finalized
session is emitted EXACTLY once per checkpoint lineage (replaying a
finished stream over the same checkpoint emits nothing — q146 gate).

Reference relation: btl_bloomfilter has no streaming; this serves
SURVEY's streaming axis alongside stream_build_sketch /
stream_windowed_sketch_by_key / stream_keyed_online_mibf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["stream_session_stats"]


def stream_session_stats(
    stream: DataFrame,
    ts_col: str,
    key_cols: list[str],
    *,
    gap_seconds: int,
    watermark_delay: str,
) -> DataFrame:
    """Streaming (key..., session_start, session_end, n_events) —
    append-mode finalized sessions over an event stream.

    ``session_end`` is the LAST EVENT's timestamp (batch convention),
    not the session window's end.  Use ``outputMode("append")``; a
    session row appears once its window is older than the watermark.
    """
    if gap_seconds < 1:
        raise ValueError(f"gap_seconds must be >= 1, got {gap_seconds}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    gap = f"{int(gap_seconds)} seconds"
    agg = (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("__w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("session_end"),
        )
    )
    return agg.select(
        *key_cols,
        F.col("__w.start").alias("session_start"),
        "session_end",
        "n_events",
    )

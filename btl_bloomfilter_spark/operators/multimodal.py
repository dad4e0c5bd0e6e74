"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata
structs.  The Spark-side plumbing — schemas, Arrow batch shapes,
mapInPandas signatures, partitioning — is real and tested; the
actual codec work is stubbed (this container has no image/audio
libs): `decode_features` uses a clearly-marked deterministic fake
(seeded byte-hash features) and `decode_real` raises
NotImplementedError where a PIL/ffmpeg call would go.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions import hashing as H

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)

FEATURE_DIM = 32


def synthetic_media_df(spark, n: int, *, seed: int = 42, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (binary payloads + metadata)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                kind = ["image", "audio", "video"][int(i) % 3]
                payload = rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": payload,
                        "width": int(rng.integers(16, 4096)) if kind != "audio" else 0,
                        "height": int(rng.integers(16, 4096)) if kind != "audio" else 0,
                        "duration_ms": int(rng.integers(100, 600_000)) if kind != "image" else 0,
                        "codec": {"image": "png", "audio": "opus", "video": "av1"}[kind],
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(partitions).mapInPandas(gen, MEDIA_SCHEMA)


def media_from_documents(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media table derived from a text table with pure
    Catalyst expressions — the oracle-able twin of
    :func:`synthetic_media_df` (every field is a closed-form function
    of (id, text), so DuckDB can reproduce the downstream rollups
    exactly): payload = UTF-8 bytes of the text, kind cycles
    image/audio/video on id % 3, duration = 10·bytes + 100 ms for
    timed kinds.  Used by the driver-board media_stats query (q36)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "utf-8")
    nbytes = F.length(payload)
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(kind != "audio", (F.pmod(nbytes * 7, F.lit(4080)) + 16).cast("int"))
        .otherwise(F.lit(0))
        .alias("width"),
        F.when(kind != "audio", (F.pmod(nbytes * 13, F.lit(4080)) + 16).cast("int"))
        .otherwise(F.lit(0))
        .alias("height"),
        # BIGINT arithmetic: with INT math a payload over ~214 MB would
        # silently wrap (ANSI off) and diverge from the DuckDB oracle,
        # which computes in wider precision
        F.when(kind != "image", nbytes.cast("long") * 10 + 100)
        .otherwise(F.lit(0).cast("long"))
        .alias("duration_ms"),
        F.element_at(
            F.array(F.lit("png"), F.lit("opus"), F.lit("av1")), (F.col(id_col) % 3 + 1).cast("int")
        ).alias("codec"),
    )


def decode_real(payload: bytes, kind: str):
    """Where the real codec call goes (PIL / soundfile / pyav).

    STUB: media libraries are not available in this environment.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libs not present in this "
        "container; use decode_features (deterministic fake) for plumbing"
    )


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic fake 'decoder': FEATURE_DIM floats derived from a
    seeded hash of the payload bytes.  Stands in for a real embedding
    so downstream plumbing (schema, batching, joins) is testable.
    One batched hash call per Arrow batch — not per row."""
    hexes = [(bytes(p) if p is not None else b"").hex() for p in payloads]
    if not hexes:
        return np.zeros((0, FEATURE_DIM), dtype=np.float32)
    h = H.hash_strings(hexes, FEATURE_DIM)
    return (h.astype(np.float64) / 2**64).astype(np.float32)


def extract_features(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """binary → array<float> features via mapInPandas (Arrow batches).

    Real pipelines swap `_fake_features` for a batch decode; the
    signature (pd.Series of bytes → (n, D) float32) is the contract.
    """
    out_schema = df.schema.simpleString()[7:-1] + f", features array<float>"

    def fn(batches):
        for pdf in batches:
            feats = _fake_features(pdf[payload_col])
            pdf = pdf.copy()
            pdf["features"] = list(feats)
            yield pdf

    return df.mapInPandas(fn, out_schema)


def frame_sample(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video 'frame sampling' plumbing: one row per sampled timestamp.

    Deterministic fake: frames are fixed-size byte slices of the
    payload; a real impl would seek/decode at each ts.
    """

    def fn(batches):
        for pdf in batches:
            vid = pdf[(pdf["kind"] == "video") & (pdf["duration_ms"] > 0)]
            if not len(vid):
                yield pd.DataFrame({"media_id": [], "ts_ms": [], "frame": []}).astype(
                    {"media_id": "int64", "ts_ms": "int32", "frame": "object"}
                )
                continue
            dur = vid["duration_ms"].to_numpy(dtype=np.int64)
            n_frames = (dur + every_ms - 1) // every_ms  # frames at 0, every_ms, ...
            row_of = np.repeat(np.arange(len(vid)), n_frames)
            # within-row frame index → timestamp, all vectorized
            offs = np.concatenate([[0], np.cumsum(n_frames)[:-1]])
            ts = (np.arange(row_of.size) - offs[row_of]) * every_ms
            payloads = [bytes(p) for p in vid["payload"]]
            media_ids = vid["media_id"].to_numpy()[row_of]
            plen = np.array([max(1, len(p) - 16) for p in payloads], dtype=np.int64)
            off_in_payload = ts % plen[row_of]
            frames = [
                payloads[r][o : o + 16] for r, o in zip(row_of, off_in_payload)
            ]  # byte-slice per FRAME is inherent; the per-ROW loop is gone
            yield pd.DataFrame(
                {"media_id": media_ids, "ts_ms": ts.astype(np.int32), "frame": frames}
            )

    return df.mapInPandas(fn, "media_id long, ts_ms int, frame binary")


def media_stats(df: DataFrame) -> DataFrame:
    """Typed-metadata rollup (pure built-ins)."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("bytes_total"),
        F.round(F.avg("duration_ms"), 3).alias("avg_duration_ms"),
    )

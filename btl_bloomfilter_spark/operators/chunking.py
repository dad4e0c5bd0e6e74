"""Sliding-window document chunking (RAG / context-window prep).

The standard pre-embedding / pre-training step the pipeline was
missing: split each document into overlapping fixed-budget chunks with
deterministic offsets, so retrieval embeddings (operators/similarity,
pq) and packed training sequences (operators/packing) consume bounded
pieces with provenance back to (doc_id, token offset).

Pure per-row codegen — tokenize once (the engine-shared ``_WS``
class), build the chunk-start index list with ``sequence``, and
``transform`` it into (start, n_tokens, text) structs before ONE
explode.  No UDF, no shuffle, no state; 100-TB shape is a map over the
scan with output rows ≈ input tokens / step.  Fully SQL-expressible,
so the board query (q97) hash-compares chunk TEXT per row against a
DuckDB ``range``/``list_transform`` twin.

Semantics (mirrored exactly by :func:`chunk_documents_sql`):
- tokens = whitespace split after ``_WS`` trim; NULL/empty text → 0
  chunks (the row disappears — callers keeping empties should union
  them back);
- chunk i covers tokens [i*step, i*step + size) (0-based),
  ``step = size - overlap``; the last chunk may be shorter but is
  never empty; a doc with <= size tokens yields exactly 1 chunk;
- starts are ``0, step, 2*step, …, step * floor((n-1)/step)`` — the
  largest start is strictly below n, so every chunk contributes at
  least one new token, chunks cover the doc completely, and
  neighbouring chunks share exactly ``overlap`` tokens (fewer only at
  the final, short chunk);
- chunk_text re-joins the token slice with single spaces (original
  whitespace runs are NOT preserved — both engines agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import _WS, _clean, _clean_sql

__all__ = ["chunk_documents", "chunk_documents_sql"]


def _validate(size: int, overlap: int) -> None:
    if size < 1:
        raise ValueError("size must be >= 1")
    if not (0 <= overlap < size):
        raise ValueError("overlap must be in [0, size)")


def chunk_documents(
    df: DataFrame, col: str, id_col: str, *, size: int, overlap: int = 0
) -> DataFrame:
    """Explode ``col`` into overlapping ``size``-token chunks stepping
    ``size - overlap`` tokens; returns (id, chunk_idx, tok_start,
    n_tokens, chunk_text)."""
    _validate(size, overlap)
    step = size - overlap
    t = _clean(col)
    toks = F.split(t, rf"[{_WS}]+")
    n = F.when(t == "", F.lit(0)).otherwise(F.size(toks))
    # last start = step * floor((n-1)/step)  (n>0), so the final chunk
    # always contains at least one new token
    last = F.call_function("div", n - 1, F.lit(step)) * step
    starts = F.when(n > 0, F.sequence(F.lit(0).cast("long"), last, F.lit(step).cast("long"))).otherwise(
        F.array().cast("array<bigint>")
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            s.alias("tok_start"),
            F.least(F.lit(size), n - s).alias("n_tokens"),
            F.array_join(F.slice(toks, (s + 1).cast("int"), F.lit(size)), " ").alias("chunk_text"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(chunks).alias("c"))
        .select(
            "id",
            F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.tok_start").cast("int").alias("tok_start"),
            F.col("c.n_tokens").cast("int").alias("n_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    table: str, col: str, id_col: str, *, size: int, overlap: int = 0
) -> str:
    """DuckDB twin producing identical rows (token slices re-joined
    with single spaces, same start/step law)."""
    _validate(size, overlap)
    step = size - overlap
    t = _clean_sql(col)
    return f"""
        WITH base AS (
            SELECT {id_col} AS id,
                   CASE WHEN {t} = '' THEN []::VARCHAR[]
                        ELSE string_split_regex({t}, '[{_WS}]+') END AS toks
            FROM {table}
        ),
        sized AS (SELECT id, toks, len(toks) AS n FROM base WHERE len(toks) > 0),
        ex AS (
            SELECT id, toks, n, unnest(range(0, ((n - 1) // {step}) + 1)) AS i
            FROM sized
        )
        SELECT id, CAST(i AS INTEGER) AS chunk_idx,
               CAST(i * {step} AS INTEGER) AS tok_start,
               CAST(least({size}, n - i * {step}) AS INTEGER) AS n_tokens,
               array_to_string(toks[(i * {step} + 1):(i * {step} + {size})], ' ') AS chunk_text
        FROM ex
    """

"""SQL-callable Python table functions (UDTFs).

Completes the §2.7 binding triple literally — the reference exposes
its ops through SWIG/boost bindings (`swig/BloomFilter.i:1-60`,
`pythonInterface/BloomFilter_pythonwrapper.cpp:346-376`); our SQL
surface now has all three shapes:

- scalar UDFs  — functions/probe.register_sql (``bf_contains(text)``)
- aggregates   — functions/udaf (``btl_hll_distinct(conv_id)``)
- table fns    — this module (``FROM t, LATERAL btl_kmers(text, 12)``)

Registered TVFs:

- ``btl_kmers(text, k)`` → (pos, kmer) — the reference's k-mer
  iterator (`ntHashIterator.hpp`: slide a k-window over the
  sequence) as a SQL table function over character k-mers.
- ``btl_shingles(text, n)`` → (pos, shingle) — word n-grams under
  the library-wide explicit whitespace class (textstats._WS).

Scale honesty: a Python UDTF is an interpreted per-row expander —
the ad-hoc SQL exploration surface, same contract as functions/udaf.
The corpus-scale path for the identical expansion is pure Catalyst
(textstats._grams / dedup shingle pipelines); tests pin EXACT
row-set equality between the two paths, and the board query (q87)
hash-oracles the UDTF output against DuckDB.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

from .textstats import _WS

_WS_RE = re.compile(f"[{_WS}]+")
_STRIP_RE = re.compile(rf"^[{_WS}]+|[{_WS}]+$")


@udtf(returnType="pos int, kmer string")
class _KmersUDTF:
    """Character k-mers with 0-based positions; NULL/short text → no rows."""

    def eval(self, text: str, k: int):
        if text is None or k is None or k <= 0:
            return
        for i in range(len(text) - k + 1):
            yield i, text[i : i + k]


@udtf(returnType="pos int, shingle string")
class _ShinglesUDTF:
    """Word n-gram shingles (textstats tokenization: strip then split
    on the explicit ASCII whitespace class)."""

    def eval(self, text: str, n: int):
        if text is None or n is None or n <= 0:
            return
        t = _STRIP_RE.sub("", text)
        toks = _WS_RE.split(t) if t else []
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_tvfs(spark) -> None:
    """Register ``btl_kmers`` and ``btl_shingles`` on this session."""
    spark.udtf.register("btl_kmers", _KmersUDTF)
    spark.udtf.register("btl_shingles", _ShinglesUDTF)


def kmers_tvf_sql(table_expr: str, text_col: str, k: int) -> str:
    """DuckDB twin of ``FROM t, LATERAL btl_kmers(text, k)``:
    (all other columns of ``table_expr``, pos, kmer) rows."""
    return f"""(
        SELECT t.*, i - 1 AS pos, substr({text_col}, i, {k}) AS kmer
        FROM {table_expr} t,
             LATERAL unnest(range(1, greatest(length({text_col}) - {k} + 2, 1))) AS u(i)
    )"""


def shingles_tvf_sql(table_expr: str, text_col: str, n: int) -> str:
    """DuckDB twin of ``FROM t, LATERAL btl_shingles(text, n)`` (same
    tokenization as textstats: strip, split on the explicit class)."""
    clean = f"regexp_replace(coalesce({text_col}, ''), '^[{_WS}]+|[{_WS}]+$', '', 'g')"
    words = f"(CASE WHEN {clean} = '' THEN [] ELSE string_split_regex({clean}, '[{_WS}]+') END)"
    return f"""(
        SELECT t.*, i - 1 AS pos, array_to_string(ws[i:i+{n - 1}], ' ') AS shingle
        FROM (SELECT *, {words} AS ws FROM {table_expr}) t,
             LATERAL unnest(range(1, greatest(len(ws) - {n} + 2, 1))) AS u(i)
    )"""

"""Benchmark decontamination for training corpora.

A standard LLM-pipeline hygiene step: flag training documents whose
k-gram windows overlap a held-out benchmark/eval corpus, so eval data
can be excluded from training.  Pure composition of the library's own
primitives — a Bloom filter built over the benchmark's windows
(distributed build, bit-exact OR merge, plans/agg.build_sketch)
broadcast against the corpus (zero-copy Arrow probe,
functions/probe.with_probe_columns) — so the screen runs at full
corpus scale as a PURE MAP on the corpus side: no shuffle, no join,
the only aggregate is the benchmark window count used for sizing.

100-TB shape: the benchmark (the small side, typically MBs-GBs) is the
only thing ever collected/broadcast — as an m/8-byte filter, not as
text; the corpus streams through executors once.  The filter is
reusable across corpus shards / days via ``bloom=`` (persist it with
sources/bfio.save_bloom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def contamination_screen(
    docs: DataFrame,
    bench: DataFrame | None,
    col: str,
    *,
    k: int = 25,
    fpr: float = 1e-4,
    frac_col: str = "contamination_frac",
    keep: list[str] | None = None,
    bloom=None,
):
    """Append ``frac_col`` — the fraction of each row's ``k``-byte
    windows present in the benchmark corpus — to ``docs``.

    Statistics: a clean document's expected fraction is bounded by the
    filter's FPR (self-measurable afterwards via ``bloom.fpr()``); a
    document containing a verbatim benchmark span of L bytes
    contributes ~(L - k + 1) matching windows, so even a single copied
    sentence moves the fraction far above the FPR floor.  Choose ``k``
    large enough that natural shared phrases are rare (~25 bytes ≈ 4-5
    English words); thresholds are the caller's policy — a typical
    pipeline quarantines frac ≥ 0.05 and confirms with the exact span
    finder (operators/dedup.duplicate_spans against the benchmark).

    Sizing is exact, not a byte proxy: capacity = the benchmark's total
    window count from one JVM-side aggregate.

    Returns ``(screened_df, bloom)`` so the filter can be saved
    (sources/bfio.save_bloom) and passed back via ``bloom=`` to screen
    further corpus shards without rebuilding — in that case ``bench``
    may be None (it is not read), which also makes the screen usable on
    a STREAMING ``docs`` (the probe is a plain map; the only action
    here is the sizing aggregate, skipped on reuse).
    """
    from ..functions.probe import with_probe_columns
    from ..operators.bloom import BloomFilter
    from ..plans.agg import build_sketch

    if bloom is None and bench is None:
        raise ValueError("either a benchmark DataFrame or a prebuilt bloom= is required")
    if bloom is None:
        n_windows = (
            bench.agg(
                F.sum(F.greatest(F.octet_length(col) - F.lit(k - 1), F.lit(0)))
            ).collect()[0][0]
            or 0
        )
        bloom = build_sketch(
            bench,
            col,
            lambda: BloomFilter.for_capacity(n=max(int(n_windows), 1), fpr=fpr, k=k),
        )
    elif bloom.k != k:
        raise ValueError(f"reused filter has k={bloom.k}, screen requested k={k}")
    screened = with_probe_columns(docs, bloom, col, frac_col=frac_col, keep=keep)
    return screened, bloom

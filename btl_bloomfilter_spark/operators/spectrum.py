"""K-mer abundance spectrum — exact, plus an ntCard-style sampled
estimator.

The reference library ships inside BCGSC's Bioinformatics Technology
Lab toolchain, whose sizing workflow is: estimate the k-mer frequency
HISTOGRAM first (ntCard: Mohamadi, Khan, Birol — Bioinformatics 2017),
then size the Bloom/miBF from F0 (= distinct k-mers) and f1
(= singletons).  `writeBloom_rolling.cpp:96-103` takes that entry
count as its `-n`; this module computes the histogram itself — the
input to every `params.size_for_fpr` call — as a first-class operator.

Spectrum: ``multiplicity f → n_kmers`` = number of DISTINCT k-mers
whose total occurrence count across the corpus is exactly f.  Derived
totals: F0 = Σ n_kmers (distinct), F1 = Σ f·n_kmers (total k-mer
occurrences), f1 = n_kmers at f=1.

Exact path (:func:`kmer_spectrum`) — pure Catalyst, two aggregations:

    explode k-mers → groupBy(kmer).count → groupBy(count).count

The explode feeds a hash aggregate with map-side partial combine, so
the shuffle carries (kmer, partial_count) — already far smaller than
the exploded stream for any repetitive corpus — and the second
aggregation is histogram-sized (≤ max multiplicity rows).  K-mers are
produced by a `transform(sequence(...), i -> substring(...))` JVM
expression (no Python), the same windowing as the reference's
`ntHashIterator.hpp` slide and the q87 TVF, so the DuckDB twin
(:func:`kmer_spectrum_sql`) is character-identical and the board
query hash-oracles the WHOLE histogram.

Sampled path (:func:`kmer_spectrum_sampled`) — ntCard's insight is
that the histogram does not need every k-mer: sample DISTINCT k-mers
by a hash condition (here ``xxhash64(kmer, salt) mod s == 0``, i.e.
keep a deterministic 1/s of the k-mer UNIVERSE with all their
occurrences), build the exact spectrum of the sample, scale class
sizes by s.  Because selection is a pure function of the k-mer, every
occurrence of a selected k-mer survives → each selected k-mer lands
in its TRUE multiplicity class, and E[n_kmers_sampled(f)] =
n_kmers(f)/s exactly (each distinct k-mer is a Bernoulli(1/s) trial).
The filter sits BELOW the groupBy, so at 100 TB the heavy shuffle
shrinks by s× — the whole point.  (ntCard's own estimator further
reuses one pass for all f via a count-min-like table; our two-line
Spark formulation keeps the same unbiasedness law with the engine's
native partial aggregation instead.)  Hashing choice: the sampling
hash only needs to be a uniform pure function of the k-mer string, so
we use Spark's JVM-side ``xxhash64`` rather than routing through the
NTF64 Arrow kernel — whole-stage codegen end to end.

Error law (gated in tests): n_kmers_sampled(f) ~ Binomial(n_kmers(f),
1/s), so |s·sampled − exact| ≤ z·s·sqrt(n_kmers(f)/s) = z·sqrt(s·exact)
with the usual normal z; tests assert z=4 plus an additive +s slack
for the small-count classes where the normal approximation frays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "kmer_events",
    "kmer_spectrum",
    "kmer_spectrum_sampled",
    "kmer_spectrum_sql",
    "spectrum_summary",
]


def _kmer_array(col: str, k: int):
    """array<string> of all k-length substrings of ``col`` (JVM expr);
    NULL text → empty array, text shorter than k → empty array."""
    c = f"coalesce({col}, '')"
    return F.expr(
        f"CASE WHEN length({c}) >= {k} THEN "
        f"transform(sequence(1, length({c}) - {k} + 1), i -> substring({c}, i, {k})) "
        f"ELSE array() END"
    )


def kmer_events(df: DataFrame, col: str, k: int) -> DataFrame:
    """One row per k-mer OCCURRENCE: ``(kmer)``.  Shared generator for
    the exact and sampled paths; the caller aggregates."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from ..plans.spread import fan_out

    # fan_out: the k-mer window expansion is the map cost; an
    # under-partitioned source would run it on one core (no-op on
    # healthy layouts — see plans/spread)
    return fan_out(df.select(F.col(col).alias("__t"))).select(
        F.explode(_kmer_array("__t", k)).alias("kmer")
    )


def kmer_spectrum(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact abundance spectrum: ``(multiplicity, n_kmers)``, one row
    per occurring multiplicity.  Deterministic, integer-typed,
    hash-oracle-able against :func:`kmer_spectrum_sql`."""
    counts = kmer_events(df, col, k).groupBy("kmer").agg(F.count("*").alias("multiplicity"))
    return (
        counts.groupBy("multiplicity")
        .agg(F.count("*").alias("n_kmers"))
        .select(F.col("multiplicity").cast("long"), F.col("n_kmers").cast("long"))
    )


def kmer_spectrum_sampled(
    df: DataFrame, col: str, k: int, *, s: int, salt: int = 0
) -> DataFrame:
    """ntCard-style sampled spectrum: ``(multiplicity,
    n_kmers_sampled, n_kmers_est)`` where ``n_kmers_est = s *
    n_kmers_sampled`` is unbiased for the exact class size (see module
    doc).  ``s`` is the inverse sampling rate; ``salt`` varies the
    k-mer-universe sample (seed sweep in tests)."""
    if s < 1:
        raise ValueError("s must be >= 1")
    ev = kmer_events(df, col, k).where(
        F.pmod(F.xxhash64(F.col("kmer"), F.lit(int(salt))), F.lit(int(s))) == 0
    )
    counts = ev.groupBy("kmer").agg(F.count("*").alias("multiplicity"))
    return (
        counts.groupBy("multiplicity")
        .agg(F.count("*").alias("n_kmers_sampled"))
        .select(
            F.col("multiplicity").cast("long"),
            F.col("n_kmers_sampled").cast("long"),
            (F.col("n_kmers_sampled") * F.lit(int(s))).cast("long").alias("n_kmers_est"),
        )
    )


def spectrum_summary(spectrum: DataFrame) -> DataFrame:
    """One row ``(f0_distinct, f1_total, singletons)`` from an exact
    spectrum — the quantities the reference's sizing formulas consume
    (`BloomFilter.hpp:406-419` take n = f0; miBF saturation analysis
    wants the singleton fraction)."""
    return spectrum.agg(
        F.sum("n_kmers").cast("long").alias("f0_distinct"),
        F.sum(F.col("multiplicity") * F.col("n_kmers")).cast("long").alias("f1_total"),
        F.coalesce(
            F.sum(F.when(F.col("multiplicity") == 1, F.col("n_kmers"))), F.lit(0)
        ).cast("long").alias("singletons"),
    )


def kmer_spectrum_sql(table_expr: str, col: str, k: int) -> str:
    """DuckDB twin of :func:`kmer_spectrum` (same windowing as
    functions/tvf.kmers_tvf_sql): ``(multiplicity, n_kmers)``."""
    c = f"coalesce({col}, '')"
    return f"""(
        SELECT cnt AS multiplicity, count(*) AS n_kmers FROM (
            SELECT substr({c}, i, {k}) AS kmer, count(*) AS cnt
            FROM {table_expr} t,
                 LATERAL unnest(range(1, greatest(length({c}) - {k} + 2, 1))) AS u(i)
            GROUP BY 1
        ) GROUP BY 1
    )"""

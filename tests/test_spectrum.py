"""K-mer abundance spectrum: exact vs brute force, DuckDB twin
parity, ntCard-style sampled estimator law (unbiasedness + z-bound),
edge cases (NULL / short / empty text)."""

import collections
import math

import duckdb
import pandas as pd
import pytest

from btl_bloomfilter_spark.operators.spectrum import (
    kmer_spectrum,
    kmer_spectrum_sampled,
    kmer_spectrum_sql,
    spectrum_summary,
)


def _brute_spectrum(texts, k):
    c = collections.Counter()
    for t in texts:
        if t is None:
            continue
        for i in range(len(t) - k + 1):
            c[t[i : i + k]] += 1
    spec = collections.Counter(c.values())
    return dict(spec)


TEXTS = [
    "ACGTACGTAC",
    "ACGTACGTAC",          # exact duplicate → every k-mer at least doubled
    "TTTTTTTT",            # internal repeats: one distinct 4-mer, high multiplicity
    "ACG",                 # shorter than k → no k-mers
    "",                    # empty
    None,                  # NULL
    "GGGACGTACGTTT",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id int, text string")


def test_exact_spectrum_matches_brute_force(spark, docs):
    got = {
        r["multiplicity"]: r["n_kmers"] for r in kmer_spectrum(docs, "text", 4).collect()
    }
    assert got == _brute_spectrum(TEXTS, 4)


def test_exact_spectrum_matches_duckdb_twin(spark, docs):
    pdf = pd.DataFrame({"text": [t for t in TEXTS]})
    con = duckdb.connect()
    con.register("docs", pdf)
    oracle = {
        int(m): int(n)
        for m, n in con.sql(
            f"SELECT * FROM {kmer_spectrum_sql('docs', 'text', 4)}"
        ).fetchall()
    }
    got = {
        r["multiplicity"]: r["n_kmers"] for r in kmer_spectrum(docs, "text", 4).collect()
    }
    assert got == oracle


def test_summary_f0_f1_singletons(spark, docs):
    spec = kmer_spectrum(docs, "text", 4)
    row = spectrum_summary(spec).collect()[0]
    brute = _brute_spectrum(TEXTS, 4)
    assert row["f0_distinct"] == sum(brute.values())
    assert row["f1_total"] == sum(m * n for m, n in brute.items())
    assert row["singletons"] == brute.get(1, 0)


def test_sampled_estimator_unbiased_and_bounded(spark):
    # A corpus large enough for the z-bound to mean something: 400
    # deterministic pseudo-random docs over a 4-letter alphabet.
    rows = []
    state = 12345
    for i in range(400):
        chars = []
        for _ in range(60):
            state = (state * 48271) % 2147483647
            chars.append("ACGT"[state % 4])
        rows.append((i, "".join(chars)))
    docs = spark.createDataFrame(rows, "id int, text string")
    k, s = 8, 4
    exact = {
        r["multiplicity"]: r["n_kmers"] for r in kmer_spectrum(docs, "text", k).collect()
    }
    f0 = sum(exact.values())

    # Per-seed: every estimated class within z=4 of the exact value
    # (Binomial(n, 1/s): sd of s*sampled = sqrt(s*n) up to the 1-1/s
    # factor we bound by 1), plus +s additive slack for tiny classes.
    f0_ests = []
    for salt in range(5):
        est = {
            r["multiplicity"]: r["n_kmers_est"]
            for r in kmer_spectrum_sampled(docs, "text", k, s=s, salt=salt).collect()
        }
        for m in set(exact) | set(est):
            e, g = exact.get(m, 0), est.get(m, 0)
            assert abs(g - e) <= 4 * math.sqrt(s * max(e, 1)) + s, (salt, m, e, g)
        f0_ests.append(sum(est.values()))

    # Seed-averaged F0 estimate close to exact (unbiasedness, not just
    # the per-seed envelope): 3 standard errors of the 5-seed mean.
    mean = sum(f0_ests) / len(f0_ests)
    se = math.sqrt(s * f0 / len(f0_ests))
    assert abs(mean - f0) <= 3 * se + s


def test_sampled_filter_is_below_the_aggregate(spark, docs):
    # The s-fold shuffle saving requires the hash filter BEFORE the
    # groupBy(kmer): the optimized plan must show the pmod predicate
    # in a Filter below the first HashAggregate.
    plan = kmer_spectrum_sampled(docs, "text", 4, s=3)._jdf.queryExecution().optimizedPlan().toString()
    agg_at = plan.find("Aggregate")
    filt_at = plan.find("pmod")
    assert agg_at != -1 and filt_at != -1 and filt_at > agg_at  # deeper = printed later


def test_k_validation(spark, docs):
    with pytest.raises(ValueError):
        kmer_spectrum(docs, "text", 0)
    with pytest.raises(ValueError):
        kmer_spectrum_sampled(docs, "text", 4, s=0)

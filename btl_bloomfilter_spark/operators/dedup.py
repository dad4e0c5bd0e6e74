"""Deduplication operators for large-scale training-data pipelines.

- exact_dedup: hash-groupBy (shuffle on digest, scales linearly)
- ngram_jaccard_pairs: exact n-gram-set Jaccard via shingle explode +
  self-join on shingle (pure DataFrame ops → Catalyst plans the
  shuffle; blocking by shared shingle keeps it far from O(n²))
- MinHash + LSH banding: signatures via one Arrow-vectorized kernel
  (reusing the library's seeded multi-hash fan-out, nte64), candidate
  pairs by band-bucket groupBy — the standard web-scale near-dup path
- SimHash: 64-bit weighted-vote fingerprint; hamming-≤d candidates by
  4-band exact-match blocking (pigeonhole: d≤3 ⇒ one band equal)

All shuffles key on content digests (uniform), so no skew salting is
needed here; the LSH band join broadcasts nothing and scales as the
number of colliding pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import hashing as H


# ------------------------------ exact --------------------------------


def exact_dedup(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """One row per distinct value: keeper id (min), dup count."""
    return (
        df.groupBy(F.md5(F.col(col)).alias("digest"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def exact_dedup_keep(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """The deduplicated table itself (keeps the min-id row per value)."""
    w = exact_dedup(df, col, id_col).select("keeper_id")
    return df.join(w, df[id_col] == w["keeper_id"], "left_semi")


# -------------------------- n-gram jaccard ---------------------------


def shingles(df: DataFrame, col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-grams per document (id, shingle)."""
    toks = F.split(F.trim(F.col(col)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - n)  # starts 0..L-n
    gram = F.when(F.size(toks) >= n, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))).otherwise(
        F.array().cast("array<string>")
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(gram).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, col: str, id_col: str, *, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact Jaccard over word n-gram sets for all pairs sharing ≥1
    shingle.  inter/(|A|+|B|-inter) ≥ threshold.

    Plan: explode → self-join on shingle (shuffle keyed by shingle)
    → pair-count agg → join per-doc set sizes.  Only co-shingled
    pairs ever materialize.
    """
    sh = shingles(df, col, id_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        inter.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


# ----------------------------- MinHash -------------------------------


def minhash_signatures(
    df: DataFrame, col: str, id_col: str, *, num_perm: int = 128, shingle_n: int = 3, seed_salt: int = 0
) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signatures.

    Kernel: per Arrow batch, hash every shingle once with the seeded
    whole-string hash, fan out to num_perm permutations with the exact
    NTE64 law (nthash.hpp:537-542), take the per-row minimum per
    permutation — one numpy pass, no per-row Python.
    """

    @pandas_udf("array<long>")
    def sig_udf(texts: pd.Series) -> pd.Series:
        token_lists = [str(t).split() if t is not None else [] for t in texts]
        grams: list[str] = []
        rows: list[int] = []
        for i, toks in enumerate(token_lists):
            for j in range(max(0, len(toks) - shingle_n + 1)):
                grams.append(" ".join(toks[j : j + shingle_n]))
                rows.append(i)
        out = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if grams:
            hashes = H.hash_strings(grams, num_perm, seeds=H.seed_table(seed_salt))
            np.minimum.at(out, np.asarray(rows), hashes)
        # to signed for Spark long
        return pd.Series(list(out.astype(np.int64)))

    return df.select(F.col(id_col).alias("id"), sig_udf(F.col(col)).alias("sig"))


def minhash_lsh_candidates(
    sig_df: DataFrame, *, bands: int = 32, rows_per_band: int = 4
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on all rows of ≥1 band.

    Band key = (band_idx, hash of the band's slice); groupBy band key
    then pair within buckets.  Shuffle is keyed by band hash
    (uniform); bucket sizes stay tiny for non-dup corpora.
    """
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = sig_df.select("id", "sig", band_idx).withColumn(
        "band_key",
        F.xxhash64(
            F.concat_ws(
                ",",
                F.col("band"),
                F.expr(f"cast(slice(sig, band * {rows_per_band} + 1, {rows_per_band}) as array<string>)"),
            )
        ),
    ).drop("sig")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_jaccard_estimate(sig_df: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of equal
    signature slots (zip_with, JVM-side)."""
    sa = sig_df.alias("sa")
    sb = sig_df.alias("sb")
    num_perm = None  # computed in expression
    eq = F.size(
        F.filter(
            F.zip_with(F.col("sa.sig"), F.col("sb.sig"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        pairs.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.round(eq.cast("double") / F.size("sa.sig"), 6).alias("est_jaccard"),
        )
    )


def minhash_dedup(
    df: DataFrame,
    col: str,
    id_col: str,
    *,
    num_perm: int = 128,
    shingle_n: int = 3,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup pairs with estimated jaccard ≥ threshold."""
    sigs = minhash_signatures(df, col, id_col, num_perm=num_perm, shingle_n=shingle_n).cache()
    cands = minhash_lsh_candidates(sigs, bands=bands, rows_per_band=max(1, num_perm // bands))
    est = minhash_jaccard_estimate(sigs, cands)
    return est.where(F.col("est_jaccard") >= threshold)


# ----------------------------- SimHash -------------------------------


def simhash_col(col_series: pd.Series, seed_salt: int = 0) -> np.ndarray:
    """64-bit SimHash per text: sign-vote over token hashes."""
    token_lists = [str(t).split() if t is not None else [] for t in col_series]
    all_toks: list[str] = []
    rows: list[int] = []
    for i, toks in enumerate(token_lists):
        all_toks.extend(toks)
        rows.extend([i] * len(toks))
    out = np.zeros(len(token_lists), dtype=np.uint64)
    if all_toks:
        h = H.hash_strings(all_toks, 1, seeds=H.seed_table(seed_salt))[:, 0]
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        votes = np.zeros((len(token_lists), 64), dtype=np.int64)
        np.add.at(votes, np.asarray(rows), 2 * bits - 1)
        fp = (votes > 0).astype(np.uint64)
        out = (fp << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def simhash(df: DataFrame, col: str, id_col: str, *, seed_salt: int = 0) -> DataFrame:
    @pandas_udf("long")
    def sh_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash_col(texts, seed_salt).astype(np.int64))

    return df.select(F.col(id_col).alias("id"), sh_udf(F.col(col)).alias("simhash"))


def simhash_candidates(sh_df: DataFrame, *, max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via 4-band blocking
    (pigeonhole: ≤3 differing bits ⇒ at least one 16-bit band equal)."""
    bands = 4
    width = 64 // bands
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    mask = (1 << width) - 1
    banded = sh_df.select("id", "simhash", band_idx).withColumn(
        "band_val", F.expr(f"shiftrightunsigned(simhash, band * {width}) & {mask}")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).where(F.col("hamming") <= max_hamming)

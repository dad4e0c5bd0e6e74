"""Weighted MinHash over token multisets via exact integer expansion.

Plain MinHash (operators/dedup.minhash_dedup) estimates SET Jaccard —
a document that repeats "error timeout retry" five hundred times looks
identical to one that says it once.  Weighted Jaccard

    J_w(A, B) = sum_t min(a_t, b_t) / sum_t max(a_t, b_t)

over token COUNTS is the multiset-aware similarity LLM-corpus dedup
actually wants (boilerplate logs, template spam).  The classical
estimator (Ioffe, ICDM 2010) draws real-valued exponential samples —
libm, non-portable.  This module uses the older exact reduction
instead (Gollapudi & Panigrahy, and the original Broder construction):
expand each token t with capped count c to the c distinct elements
(t,1)..(t,c); the plain Jaccard of the expanded SETS *is* the weighted
Jaccard of the capped multisets, so an ordinary MinHash over the
expansion is an unbiased estimator whose per-permutation match
probability is exactly J_w.  Everything is integer/md5 arithmetic on
the library's portable `functions/splits._hash60` primitive, so the
signatures — and therefore candidate pairs, match counts, and the
one-division floats — are bit-identical across engines: q120
hash-oracles the full output against the generated DuckDB twin
(`weighted_minhash_pairs_sql`).

Count cap: counts are clamped to ``cap`` before expansion (expansion
work per token is O(cap), not O(count) — a 10^6-repeat token would
otherwise dominate a partition).  The capped J_w is itself a proper
similarity (min/max commute with clamping), reported exactly; the cap
is part of the operator's contract, not a hidden approximation.

100-TB shape: tokenize + groupBy(id, token) with map-side combine is
the only corpus-sized shuffle; the (token, rep, perm) expansion feeds
a min() aggregate whose partial combine collapses each partition to
at most |docs|·num_perm rows before the exchange.  Candidate pairs
come from a signature equi-join on (perm, sig) — banding with band
size 1; ``hot_bucket_limit`` (a count window over the bucket key,
deterministic and mirrored in the twin) drops degenerate buckets
(stop-token minima shared by half the corpus) before the join can go
quadratic, the same escape hatch the n-gram/anchor dedup family uses.
The exact J_w verify joins token counts ONLY for surviving candidate
pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from btl_bloomfilter_spark.functions.splits import _hash60, _key_sql
from btl_bloomfilter_spark.functions.textstats import _WS, _clean, _clean_sql

__all__ = [
    "token_counts",
    "weighted_signatures",
    "weighted_minhash_pairs",
    "weighted_minhash_pairs_sql",
]


def token_counts(df: DataFrame, text_col: str, id_col: str, *, cap: int) -> DataFrame:
    """(id, token, c) with c = min(count, cap); empty tokens dropped."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from ..plans.spread import fan_out

    return (
        fan_out(
            df.select(
                F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("__t")
            )
        )
        .select("id", F.explode(F.split(_clean("__t"), rf"[{_WS}]+")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("id", "token")
        .agg(F.least(F.count("*"), F.lit(int(cap))).alias("c"))
    )


def weighted_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 16,
    cap: int = 4,
    seed: int | str = 0,
    counts: DataFrame | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(id, perm, sig): sig = min over expanded (token, rep<=c) of the
    portable 60-bit md5 hash of (seed, token, rep, perm).

    The hash h(token, rep, perm) does not depend on the document id,
    so it is computed ONCE PER DISTINCT (token, rep, perm) — a
    vocab × cap × num_perm table — instead of once per expanded
    corpus row (the r5 shape: corpus_tokens × cap × num_perm md5
    evaluations; the md5 count drops by the corpus/vocab ratio).  Per
    token the table stores, for each perm, the RUNNING MIN over rep
    ≤ r (cap entries), so a (id, token, c) row reads its per-perm
    partial signature by one array index; per-doc signatures are
    num_perm plain min() aggregates with map-side partial combine.
    Values are identical to the per-row expansion (min over the same
    multiset of hashes) — pinned by the q120 full-output oracle.

    ``broadcast_vocab`` (default True) broadcasts the hash table into
    the token join; set False when the distinct-token universe is too
    large for executor memory (the join plans as a regular exchange).
    ``counts=`` lets a caller share one materialized
    :func:`token_counts` table across the signature and verify stages.
    """
    if num_perm < 1:
        raise ValueError("num_perm must be >= 1")
    P = int(num_perm)
    if counts is None:
        counts = token_counts(df, text_col, id_col, cap=cap)
    # vocab-sized hash table: for each token, cmax = max c it needs;
    # per perm an array of running minima over rep = 1..cmax
    toks = counts.groupBy("token").agg(F.max("c").alias("cmax"))
    rep_h = (
        toks.select(
            "token",
            "cmax",
            F.explode(F.expr("sequence(1, cmax)")).alias("rep_i"),
        )
        .select(
            "token",
            "cmax",
            "rep_i",
            F.col("rep_i").cast("string").alias("rep"),
            F.explode(F.expr(f"sequence(0, {P - 1})")).alias("perm"),
        )
        .withColumn("perm_s", F.col("perm").cast("string"))
        .withColumn("h", _hash60(["token", "rep", "perm_s"], seed))
    )
    # per (token, perm): h ordered by rep, then running min (cap is
    # tiny, the O(cap^2) slice scan is report-scale arithmetic)
    per_perm = rep_h.groupBy("token", "perm").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rep_i", "h"))), lambda s: s["h"]
        ).alias("hs")
    ).select(
        "token",
        "perm",
        F.expr(
            "transform(sequence(1, size(hs)), r -> array_min(slice(hs, 1, r)))"
        ).alias("cm"),
    )
    # per token: dense perm -> running-min array map (perm is 0..P-1)
    tok_tbl = per_perm.groupBy("token").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("perm", "cm"))), lambda s: s["cm"]
        ).alias("cms")
    )
    maybe_b = F.broadcast if broadcast_vocab else (lambda d: d)
    part = counts.join(maybe_b(tok_tbl), "token").select(
        "id",
        *[
            F.element_at(F.element_at("cms", p + 1), F.col("c").cast("int")).alias(f"__s{p}")
            for p in range(P)
        ],
    )
    wide = part.groupBy("id").agg(
        *[F.min(f"__s{p}").alias(f"__s{p}") for p in range(P)]
    )
    return wide.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(p).alias("perm"), F.col(f"__s{p}").alias("sig"))
                    for p in range(P)
                ]
            )
        ).alias("__ps"),
    ).select("id", F.col("__ps.perm").alias("perm"), F.col("__ps.sig").alias("sig"))


def weighted_minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 16,
    cap: int = 4,
    min_matches: int = 4,
    seed: int | str = 0,
    hot_bucket_limit: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs with the estimator AND the exact capped
    weighted Jaccard: (id_a, id_b, match_cnt, est_jw, inter_c, union_c,
    exact_jw), ordered by (id_a, id_b).  est_jw = match_cnt/num_perm;
    exact_jw = sum min / sum max over capped counts — each a single
    int->double division, bit-identical across engines."""
    if not 1 <= min_matches <= num_perm:
        raise ValueError("min_matches must be in [1, num_perm]")
    # ONE materialized token-count table feeds the signature stage and
    # all three verify consumers (sizes + both intersection probes);
    # uncached, Catalyst re-runs the tokenize+groupBy per consumer
    counts = token_counts(df, text_col, id_col, cap=cap).localCheckpoint(eager=True)
    sigs = weighted_signatures(
        df, text_col, id_col, num_perm=num_perm, cap=cap, seed=seed, counts=counts
    )
    if hot_bucket_limit is not None:
        w = Window.partitionBy("perm", "sig")
        sigs = sigs.withColumn("__bn", F.count("*").over(w)).where(
            F.col("__bn") <= int(hot_bucket_limit)
        ).drop("__bn")
    a = sigs.select(F.col("id").alias("id_a"), "perm", "sig")
    b = sigs.select(F.col("id").alias("id_b"), "perm", "sig")
    cand = (
        a.join(b, ["perm", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("match_cnt"))
        .where(F.col("match_cnt") >= F.lit(int(min_matches)))
    )
    sizes = counts.groupBy("id").agg(F.sum("c").alias("size"))
    ca = counts.select(F.col("id").alias("id_a"), "token", F.col("c").alias("c_a"))
    cb = counts.select(F.col("id").alias("id_b"), "token", F.col("c").alias("c_b"))
    inter = (
        cand.select("id_a", "id_b")
        .join(ca, "id_a")
        .join(cb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("c_a", "c_b")).alias("inter_c"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("size").alias("size_b"))
    return (
        cand.join(inter, ["id_a", "id_b"])
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "match_cnt",
            (F.col("match_cnt").cast("double") / F.lit(float(num_perm))).alias("est_jw"),
            F.col("inter_c").cast("long").alias("inter_c"),
            (F.col("size_a") + F.col("size_b") - F.col("inter_c")).cast("long").alias("union_c"),
            (
                F.col("inter_c").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter_c")).cast("double")
            ).alias("exact_jw"),
        )
        .orderBy("id_a", "id_b")
    )


def weighted_minhash_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 16,
    cap: int = 4,
    min_matches: int = 4,
    seed: int | str = 0,
    hot_bucket_limit: int | None = None,
) -> str:
    """DuckDB twin: same split class, same md5-60-bit hash, same
    expansion/banding/verify construction."""
    t = _clean_sql(text_col)
    h = _key_sql(seed, ["token", "rep", "perm_s"])
    bucket_filter = (
        f"QUALIFY count(*) OVER (PARTITION BY perm, sig) <= {int(hot_bucket_limit)}"
        if hot_bucket_limit is not None
        else ""
    )
    return f"""(
        WITH counts AS (
            SELECT id, token, least(count(*), {int(cap)}) AS c
            FROM (
                SELECT CAST({id_col} AS BIGINT) AS id,
                       unnest(string_split_regex({t}, '[{_WS}]+')) AS token
                FROM {table}
            )
            WHERE token <> ''
            GROUP BY id, token
        ),
        expanded AS (
            SELECT id, token, rep::VARCHAR AS rep, perm, perm::VARCHAR AS perm_s
            FROM counts,
                 LATERAL unnest(range(1, c + 1)) AS r(rep),
                 LATERAL unnest(range(0, {int(num_perm)})) AS p(perm)
        ),
        sigs0 AS (
            SELECT id, perm,
                   min(CAST(('0x' || substr({h}, 1, 15)) AS UBIGINT)::BIGINT) AS sig
            FROM expanded GROUP BY id, perm
        ),
        sigs AS (
            SELECT id, perm, sig FROM sigs0
            {bucket_filter}
        ),
        cand AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS match_cnt
            FROM sigs a JOIN sigs b ON a.perm = b.perm AND a.sig = b.sig
            WHERE a.id < b.id
            GROUP BY a.id, b.id
            HAVING count(*) >= {int(min_matches)}
        ),
        sizes AS (SELECT id, sum(c) AS size FROM counts GROUP BY id),
        inter AS (
            SELECT c.id_a, c.id_b, sum(least(ca.c, cb.c)) AS inter_c
            FROM cand c
            JOIN counts ca ON ca.id = c.id_a
            JOIN counts cb ON cb.id = c.id_b AND cb.token = ca.token
            GROUP BY c.id_a, c.id_b
        )
        SELECT cand.id_a, cand.id_b, cand.match_cnt,
               CAST(cand.match_cnt AS DOUBLE) / {float(num_perm)} AS est_jw,
               CAST(inter.inter_c AS BIGINT) AS inter_c,
               CAST(sa.size + sb.size - inter.inter_c AS BIGINT) AS union_c,
               CAST(inter.inter_c AS DOUBLE)
                 / CAST(sa.size + sb.size - inter.inter_c AS DOUBLE) AS exact_jw
        FROM cand
        JOIN inter USING (id_a, id_b)
        JOIN sizes sa ON sa.id = cand.id_a
        JOIN sizes sb ON sb.id = cand.id_b
        ORDER BY cand.id_a, cand.id_b
    )"""

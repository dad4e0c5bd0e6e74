"""Exact threshold set-similarity join via prefix filtering
(AllPairs: Bayardo et al. WWW'07; PPJoin: Xiao et al. WWW'08).

``operators.dedup.ngram_jaccard_pairs`` (q06) generates a candidate
pair for EVERY shared shingle — exact, but at 100 TB the candidate
volume is Σ_token df(token)², which stopword-like hot tokens blow up
(q06 survives by capping document frequency, i.e. by changing the
universe).  Prefix filtering gets the SAME exact answer with no
universe change: order every document's token set by ascending global
document frequency (rarest first) and join only on each document's
PREFIX — the first ``|x| - ceil(t*|x|) + 1`` tokens.

Why that is lossless (the prefix-filter theorem): Jaccard(x,y) >= t
implies overlap |x ∩ y| >= t/(1+t)*(|x|+|y|) >= ceil(t*|x|); two sets
whose overlap is at least α must share a token within the first
``|x| - α + 1`` positions of ANY common total order (if they disagreed
on all of them, fewer than α common tokens remain).  So joining
prefixes under the df-ascending order yields a candidate SUPERSET, and
the exact verification pass (``array_intersect`` on the full sorted
arrays) removes the false positives — output provably identical to the
brute-force all-pairs join, which is exactly how the board oracle
checks it (q94 hash-compares against a brute-force DuckDB twin).

100-TB shape: the df-ascending order is the whole trick — hot tokens
sort LAST and fall outside almost every prefix, so candidate buckets
are keyed by RARE tokens (df² of a rare token is tiny).  Stages, each
a standard shuffle on shrinking data: distinct (id, token) → token df
(map-side partial count) → order+group per id (one shuffle on id) →
prefix explode grouped by token (the q06/duplicate_spans collect_list
pair expansion — no self-join, one Exchange) → distinct candidate
pairs → two hash joins back to the (id → sorted tokens) table for
verification.  Candidates, not the corpus, cross the late shuffles.
Remaining skew risk: a rare-ish token shared by d docs still yields
d²/2 in-group pairs; the group payload is (id, sz) structs only, and
AQE skew-split applies to the verify joins.

The ordered-token-set table has THREE consumers (prefix explode and
both verify probes); their pruned subplans canonicalize differently,
so neither ReuseExchange nor AQE stage reuse dedupes them (verified
on the executed plan: 6 source scans in the self-contained form).
Fine at report scale, wrong at 100 TB — the persist-once path is
:func:`ordered_token_sets` + ``token_sets=``, one corpus scan, caller
owns the cache lifecycle (the ``duplicate_spans(fingerprints=)``
convention).

Float-boundary policy (fixed-point-oracle-policy memory): the
threshold comparison is ``inter >= t * union`` in IEEE double —
bit-identical in Spark and DuckDB, so hash parity holds for any t;
board queries pick t = 0.5 (exactly representable) so the boundary is
also exact in real arithmetic.  The prefix length subtracts a 1e-9
epsilon before ``ceil`` so a double product landing an ulp ABOVE a
true integer can only LENGTHEN the prefix (more candidates — still
exact), never shorten it (missed pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import _WS, _clean
from ..plans.pairs import grouped_pair_events
from ..plans.spread import fan_out

__all__ = ["containment_join", "ordered_token_sets", "prefix_similarity_join"]


def ordered_token_sets(
    df: DataFrame, col: str, id_col: str, *, tokens_col: str | None = None
) -> DataFrame:
    """The (id, toks, sz) table the join runs over: per-doc DISTINCT
    tokens sorted by ascending global document frequency (ties by
    token).  ``col`` is whitespace-tokenized with the engine-shared
    ``_WS`` class (NULL/empty → no tokens → the doc joins nothing);
    pass ``tokens_col`` to use a pre-built ``array<string>`` column
    (shingles, turn digests, …) instead — ``col`` is then ignored.

    Exposed separately for the persist-once path (same convention as
    ``duplicate_spans(fingerprints=)``): the join has THREE consumers
    of this table (prefix explode + both verify probes) whose pruned
    subplans Catalyst canonicalizes differently, so without caller
    caching the corpus is scanned and re-aggregated per consumer.
    At scale: ``sets = ordered_token_sets(...).persist()`` then
    ``prefix_similarity_join(..., token_sets=sets)`` → ONE corpus
    scan, and the caller owns the unpersist."""
    if tokens_col is not None:
        src = fan_out(df.select(F.col(id_col).alias("id"), F.col(tokens_col).alias("__t")))
        tok = src.select("id", F.explode("__t").alias("token"))
    else:
        src = fan_out(df.select(F.col(id_col).alias("id"), F.col(col).alias("__t")))
        tok = src.select(
            "id",
            F.explode(F.split(_clean("__t"), rf"[{_WS}]+")).alias("token"),
        )
    tok = tok.where(F.col("token").isNotNull() & (F.col("token") != "")).distinct()
    dfreq = tok.groupBy("token").agg(F.count("*").alias("dfq"))
    return (
        tok.join(dfreq, "token")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dfq", "token"))), lambda s: s["token"]
            ).alias("toks")
        )
        .withColumn("sz", F.size("toks"))
    )


def prefix_similarity_join(
    df: DataFrame,
    col: str,
    id_col: str,
    *,
    threshold: float,
    tokens_col: str | None = None,
    token_sets: DataFrame | None = None,
    block: int = 512,
) -> DataFrame:
    """All pairs (id_a < id_b) with token-set Jaccard >= threshold.

    Returns ``(id_a, id_b, inter_n, union_n)``; ``jaccard`` is
    ``inter_n / union_n`` exactly, left to the caller so the output
    stays integer-typed (hash-oracle-able).  Pass ``token_sets`` (a
    persisted :func:`ordered_token_sets` result) to scan the corpus
    once — see that function's docstring.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    if block < 1:
        raise ValueError("block must be >= 1")
    t = float(threshold)
    docs = (
        token_sets
        if token_sets is not None
        else ordered_token_sets(df, col, id_col, tokens_col=tokens_col)
    )

    # prefix length |x| - ceil(t*|x|) + 1; epsilon only ever lengthens
    plen = (F.col("sz") - F.ceil(F.lit(t) * F.col("sz") - F.lit(1e-9)) + 1).cast("int")
    pref = docs.select(
        "id", "sz", F.posexplode(F.slice("toks", F.lit(1), plen)).alias("pos0", "token")
    ).withColumn("pos", F.col("pos0") + 1).drop("pos0")

    # event-level filters, both lossless:
    #  - size: Jaccard >= t forces min|set| >= t * max|set|
    #  - positional (PPJoin §3): a token at 1-based order-position i of
    #    x / j of y can witness at most 1 + min(|x|-i, |y|-j) overlap,
    #    which must reach alpha = ceil(t/(1+t)*(|x|+|y|)); a true
    #    pair's FIRST common token always passes (all its overlap sits
    #    at or after that token), and the prefix theorem puts that
    #    token inside both prefixes, so at least one generating event
    #    per true pair survives.  Epsilon before ceil: only ever keeps
    #    more.
    def _event_ok(a, b):
        alpha = F.ceil(
            F.lit(t / (1.0 + t)) * (a["sz"] + b["sz"]).cast("double") - F.lit(1e-9)
        )
        return (
            (F.least(a["sz"], b["sz"]).cast("double")
             >= F.lit(t) * F.greatest(a["sz"], b["sz"]).cast("double"))
            & ((1 + F.least(a["sz"] - a["pos"], b["sz"] - b["pos"])) >= alpha)
        )

    # Triangular chunk blocking caps the pair-expansion TASK size: a
    # token shared by d docs owes d²/2 candidate events, and a plain
    # groupBy(token).collect_list pair expansion computes all of them
    # in ONE task.  The shared kernel (plans/pairs.grouped_pair_events,
    # extracted from this operator — its docstring carries the
    # measurement and proof sketch) hashes rows into chunks and emits
    # each unordered pair exactly once; orientation is least/greatest
    # by id below.  Work is the same O(d²); the largest task ~O(block²).
    events = grouped_pair_events(
        pref.select("token", F.struct("id", "sz", "pos").alias("p")),
        ["token"],
        block=block,
    )
    a, b = F.col("a"), F.col("b")
    cand = (
        events.where(_event_ok(a, b))
        .select(
            F.least(a["id"], b["id"]).alias("id_a"),
            F.greatest(a["id"], b["id"]).alias("id_b"),
        )
        .distinct()
    )

    a = docs.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"), F.col("sz").alias("sz_a"))
    b = docs.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"), F.col("sz").alias("sz_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.cast("long").alias("inter_n"),
            (F.col("sz_a") + F.col("sz_b") - inter).cast("long").alias("union_n"),
        )
        .where(F.col("inter_n").cast("double") >= F.lit(t) * F.col("union_n").cast("double"))
    )


def containment_join(
    df: DataFrame,
    col: str,
    id_col: str,
    *,
    threshold: float,
    tokens_col: str | None = None,
    token_sets: DataFrame | None = None,
) -> DataFrame:
    """Exact ASYMMETRIC threshold join: all ORDERED pairs (id_sub,
    id_sup), id_sub != id_sup, with containment |T_sub ∩ T_sup| /
    |T_sub| >= threshold — "document id_sub's token set is (mostly)
    inside id_sup's".  The quote/subset-detection complement of
    :func:`prefix_similarity_join`: Jaccard is blind to a short
    fragment inside a long document (union is dominated by the long
    side), containment is exactly that relation — the dedup pass a
    training pipeline needs for embedded copies, boilerplate
    inclusions and benchmark fragments quoted inside crawl pages.

    Returns ``(id_sub, id_sup, inter_n, sub_sz)`` — all integers, the
    containment ratio ``inter_n / sub_sz`` left to the caller (the
    hash-oracle convention of prefix_similarity_join).

    Exactness (one-sided prefix filter): overlap needed is
    alpha = ceil(t·|sub|); if sub and sup share >= alpha tokens, the
    first ``|sub| - alpha + 1`` tokens of sub UNDER ANY COMMON TOTAL
    ORDER contain at least one shared token (all-miss would leave
    fewer than alpha positions).  So joining sub-PREFIX events against
    sup-FULL token events on the token is a lossless candidate
    superset; exact ``array_intersect`` verification removes the rest.
    Unlike the symmetric join there is no useful prefix on the sup
    side — alpha depends on the (unknown at explode time) sub size —
    so the sup side explodes fully: the candidate volume per token is
    ``prefix_df(token) · df(token)``, which the df-ascending order
    keeps small exactly like the symmetric case (hot tokens fall out
    of every prefix, so ``prefix_df ≈ 0`` where ``df`` is large).
    A cheap lossless event filter ``sz_sup >= ceil(t·sz_sub)``
    (overlap can't exceed |sup|) prunes fragments-of-fragments early.
    Residual skew (rare-ish prefix token × large df) is AQE
    skew-split territory — the join is a plain equi-join on token.

    100-TB shape: token df table + ordered sets (one corpus scan when
    ``token_sets`` is passed, the persist-once convention), sub-prefix
    explode ~ |prefix| rows/doc, sup explode |T| rows/doc, ONE
    token-keyed hash join, distinct candidates, two verify hash joins.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    t = float(threshold)
    docs = (
        token_sets
        if token_sets is not None
        else ordered_token_sets(df, col, id_col, tokens_col=tokens_col)
    )

    plen = (F.col("sz") - F.ceil(F.lit(t) * F.col("sz") - F.lit(1e-9)) + 1).cast("int")
    pref = docs.select(
        F.col("id").alias("id_sub"),
        F.col("sz").alias("sub_sz0"),
        F.explode(F.slice("toks", F.lit(1), plen)).alias("token"),
    )
    full = docs.select(
        F.col("id").alias("id_sup"), F.col("sz").alias("sup_sz0"), F.explode("toks").alias("token")
    )
    alpha = F.ceil(F.lit(t) * F.col("sub_sz0") - F.lit(1e-9))
    cand = (
        pref.join(full, "token")
        .where((F.col("id_sub") != F.col("id_sup")) & (F.col("sup_sz0") >= alpha))
        .select("id_sub", "id_sup")
        .distinct()
    )

    a = docs.select(F.col("id").alias("id_sub"), F.col("toks").alias("toks_sub"), F.col("sz").alias("sub_sz"))
    b = docs.select(F.col("id").alias("id_sup"), F.col("toks").alias("toks_sup"))
    inter = F.size(F.array_intersect("toks_sub", "toks_sup"))
    return (
        cand.join(a, "id_sub")
        .join(b, "id_sup")
        .select(
            "id_sub",
            "id_sup",
            inter.cast("long").alias("inter_n"),
            F.col("sub_sz").cast("long").alias("sub_sz"),
        )
        .where(F.col("inter_n") >= F.ceil(F.lit(t) * F.col("sub_sz") - F.lit(1e-9)))
    )

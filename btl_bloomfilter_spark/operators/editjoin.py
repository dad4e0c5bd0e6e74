"""Exact threshold edit-distance (Levenshtein) self-join via q-gram
prefix filtering (Ed-Join: Xiao, Wang & Lin, VLDB'08), with a
provably-complete short-string fallback.

The missing exact-similarity sibling of ``setjoin``: q94's prefix
filter answers token-set Jaccard; this operator answers *character*
similarity — near-identical titles, boilerplate lines, typo'd URLs,
OCR noise — where token sets are blind (one character edit leaves
Jaccard ≈ 1 inside a token, ≈ 0 across a token boundary).

Why brute force is out: levenshtein is O(len²) per pair and the pair
space is O(N²).  The two losless prunes, and why each is safe:

- **q-gram prefix filter** (the scale path).  One edit operation —
  insert, delete, substitute — changes the CONTENT of at most ``q``
  of a string's length-q substrings: windows not overlapping the edit
  keep their content (a shifted suffix window still spells the same
  gram, and gram *sets* are position-free), so the DISTINCT-gram sets
  of strings within distance ``d`` differ by at most ``q·d`` grams on
  each side.  Order all grams by one global total order (document
  frequency ascending, ties by gram — any total order is correct;
  df-ascending makes candidate buckets keyed by RARE grams, exactly
  the setjoin trick).  If two strings each have ≥ ``q·d + 1`` distinct
  grams and their length-``q·d + 1`` prefixes are disjoint, their
  distance exceeds ``d``: wlog max(P_x) ≤ max(P_y) in the global
  order; |D_x \\ D_y| ≤ q·d forces some g ∈ P_x ∩ D_y, and
  g ≤ max(P_x) ≤ max(P_y) places g inside P_y (a prefix holds ALL of
  its set's elements up to its max).  So joining on prefix grams
  yields a candidate superset — verification removes the rest.
- **short-string fallback** (strings too short for the theorem).  The
  prefix guarantee needs ≥ ``q·d + 1`` distinct grams.  A string x
  with ``|D_x| ≤ q·d`` can lose *all* its grams within d edits, but
  its partner is bounded too: each edit CREATES at most q distinct
  grams, so ``|D_y| ≤ |D_x| + q·d ≤ 2·q·d``.  Route all strings with
  ``|D| ≤ 2·q·d`` (including len < q: zero grams) through length
  blocking — each string probes lengths ``len .. len+d`` against
  exact length (``|len_x − len_y| ≤ d`` is the edit-distance lower
  bound, so this blocking is complete on its own) — and keep only
  pairs where ``min(|D_a|, |D_b|) ≤ q·d``.  The two paths are
  DISJOINT (long path requires both ≥ q·d+1), so no cross-path dedup.
  Length is a low-cardinality, naturally hot key, so the equi-join
  runs through ``plans/joins.salted_join`` (``short_salt`` reducers
  per length) instead of one task per length.

Pair uniqueness: the long path canonicalizes least/greatest-by-id and
``.distinct()``s (two strings can share several prefix grams); the
short path emits each pair once structurally — from the shorter
string's probe, id ascending on ties.

Verification is Spark's THRESHOLDED ``levenshtein(a, b, d)`` — the
banded O(d·len) dynamic program (returns −1 above d), not the full
O(len²) table; at 100 TB the verify stage is ``d·len`` work per
candidate, and candidates, not the corpus, cross the late shuffles.

100-TB shape: distinct (id, gram) → gram df (map-side partial count)
→ per-id ordered prefix (one shuffle on id) → prefix explode through
``plans/pairs.grouped_pair_events`` (triangular chunk blocking — the
d²-in-one-task skew fix measured in setjoin) → distinct candidates →
two hash joins back to (id → s) for the banded verify.  The short
path's length-blocked join keys on raw length — low cardinality by
construction, but its universe is only the ≤ 2·q·d-gram strings.

Cross-engine caveat (pinned in tests): Spark's ``levenshtein`` counts
CHARACTERS, DuckDB's counts BYTES — 'café'→'cafe' is 1 vs 2.  Board
query q105 therefore runs over ASCII (hex-digest) keys; the operator
itself is unicode-correct (``substring``/``length`` are char-based,
matching Spark's levenshtein semantics), pinned by a Spark-side
brute-force parity test over unicode strings.

Reference parity note: the reference library has no similarity join;
this is part of the LLM-pipeline operator set (near-dup curation),
same family as operators/setjoin (q94) and operators/dedup (q06/q24).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.joins import salted_join
from ..plans.pairs import grouped_pair_events

__all__ = ["qgram_profile", "edit_distance_join"]


def qgram_profile(
    df: DataFrame, col: str, id_col: str, *, q: int = 2, max_dist: int = 2,
    order: str = "df",
) -> DataFrame:
    """The per-string table the join runs over: ``(id, s, len, gsz,
    prefix)`` where ``prefix`` is the first ``q·max_dist + 1`` distinct
    q-grams under a global total order and ``gsz`` the distinct-gram
    count.  NULL strings are dropped (no distance is defined against
    NULL); empty strings participate (len 0, 0 grams).

    ``order`` picks the global gram order — ANY total order is correct
    (the prefix theorem only needs both sides sorted the same way);
    the choice is pure candidate selectivity:

    - ``"df"`` (default): document frequency ascending, ties by gram —
      hot grams sort LAST and fall outside almost every prefix, so
      candidate buckets are keyed by RARE grams.  Costs one extra
      corpus-gram aggregation + join-back.  The right default for
      natural text, whose gram distribution is always skewed.
    - ``"hash"``: ``xxhash64(gram)`` ascending, ties by gram — the
      profile becomes a PURE MAP (zero shuffles before candidate
      generation).  Prefixes are a pseudo-random gram sample, so hot
      grams DO enter prefixes: only safe when the gram distribution is
      near-uniform (digests, ids, codes), where it is measurably
      faster for identical output.

    Exposed separately for the persist-once path (the
    ``setjoin.ordered_token_sets`` / ``duplicate_spans(fingerprints=)``
    convention): the join consumes this table on the candidate side
    and twice on the verify side, so at scale
    ``prof = qgram_profile(...).persist()`` then
    ``edit_distance_join(..., profile=prof)`` scans the corpus once,
    caller owning the cache lifecycle.
    """
    if q < 1:
        raise ValueError("q must be >= 1")
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if order not in ("df", "hash"):
        raise ValueError("order must be 'df' or 'hash'")
    pl = q * max_dist + 1
    base = df.select(
        F.col(id_col).alias("id"), F.col(col).alias("s")
    ).where(F.col(col).isNotNull())
    base = base.withColumn("len", F.length("s"))
    gram_arr = F.array_distinct(
        F.expr(f"transform(sequence(1, len - {q} + 1), i -> substring(s, i, {q}))")
    )
    meta = {"q": q, "max_dist": max_dist, "order": order}
    if order == "hash":
        ordered = F.transform(
            F.array_sort(
                F.transform(gram_arr, lambda g: F.struct(F.xxhash64(g).alias("h"), g.alias("gram")))
            ),
            lambda st: st["gram"],
        )
        return (
            base.withColumn(
                "gsz", F.when(F.col("len") >= q, F.size(gram_arr)).otherwise(F.lit(0)).cast("int")
            )
            .withColumn(
                "prefix",
                F.when(F.col("len") >= q, F.slice(ordered, 1, pl))
                .otherwise(F.array().cast("array<string>")),
            )
            .withMetadata("prefix", meta)
        )
    grams = base.where(F.col("len") >= q).select("id", F.explode(gram_arr).alias("gram"))
    dfreq = grams.groupBy("gram").agg(F.count("*").alias("dfq"))
    per_id = (
        grams.join(dfreq, "gram")
        .groupBy("id")
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dfq", "gram"))),
                    lambda st: st["gram"],
                ),
                1,
                pl,
            ).alias("prefix"),
            F.count("*").alias("gsz"),
        )
    )
    return (
        base.join(per_id, "id", "left")
        .withColumn("gsz", F.coalesce(F.col("gsz"), F.lit(0)).cast("int"))
        .withColumn("prefix", F.coalesce(F.col("prefix"), F.array().cast("array<string>")))
        .withMetadata("prefix", meta)
    )


def edit_distance_join(
    df: DataFrame,
    col: str,
    id_col: str,
    *,
    max_dist: int = 2,
    q: int = 2,
    block: int = 512,
    order: str = "df",
    short_salt: int = 8,
    profile: DataFrame | None = None,
) -> DataFrame:
    """All pairs ``(id_a < id_b, dist)`` with
    ``levenshtein(s_a, s_b) <= max_dist``.

    Output is provably identical to the brute-force all-pairs join
    (both prunes are lossless — module docstring carries the proofs),
    which is how q105 hash-oracles it against a brute-force DuckDB
    twin.  ``dist`` is the exact distance (long).  Callers must supply
    unique ids; pass ``profile`` (a persisted :func:`qgram_profile`)
    to scan the corpus once.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    d = int(max_dist)
    if profile is not None:
        # the prefix theorem silently breaks on a mismatched profile
        # (a q=3/d=1 profile stores 4-gram prefixes where a q=3/d=2
        # join needs 7), so qgram_profile stamps its parameters into
        # the prefix column's metadata and we refuse anything else.
        # q must match exactly; a LARGER profile max_dist only
        # lengthens prefixes (superset of candidates — still exact);
        # the gram order never affects correctness, only selectivity.
        m = dict(profile.schema["prefix"].metadata or {}) if "prefix" in profile.columns else {}
        if m.get("q") != q or m.get("max_dist") is None or int(m["max_dist"]) < d:
            raise ValueError(
                f"profile incompatible with join parameters: profile metadata {m!r} "
                f"vs q={q}, max_dist={d} (profiles must come from qgram_profile with "
                f"the same q and max_dist >= the join's)"
            )
        prof = profile
    else:
        prof = qgram_profile(df, col, id_col, q=q, max_dist=d, order=order)
    qd = q * d

    # --- long path: q-gram prefix filter, both sides >= qd+1 grams ---
    pref = prof.where(F.col("gsz") >= qd + 1).select(
        F.explode("prefix").alias("gram"), F.struct("id", "len").alias("p")
    )
    a, b = F.col("a"), F.col("b")
    cand_long = (
        grouped_pair_events(pref, ["gram"], block=block)
        .where(F.abs(a["len"] - b["len"]) <= d)
        .select(
            F.least(a["id"], b["id"]).alias("id_a"),
            F.greatest(a["id"], b["id"]).alias("id_b"),
        )
        .distinct()
    )

    # --- short path: length blocking among <= 2*qd-gram strings,
    #     keeping only pairs the long path cannot see (min gsz <= qd).
    #     Length is a LOW-CARDINALITY key and short strings bunch on
    #     few lengths, so the equi-join goes through salted_join: the
    #     build side salts deterministically, the probe side
    #     replicates, and a hot length's d² verify work spreads over
    #     `short_salt` reducers instead of one task (the same
    #     single-task pathology plans/pairs fixes for the long path).
    short = prof.where(F.col("gsz") <= 2 * qd).select("id", "len", "gsz")
    probe = short.select(
        F.col("id").alias("pid"),
        F.col("len").alias("plen"),
        F.col("gsz").alias("pgsz"),
        F.explode(F.sequence(F.col("len"), F.col("len") + d)).alias("len"),
    )
    if short_salt > 1:
        joined = salted_join(short, probe, ["len"], salt=short_salt)
    else:
        joined = short.join(probe, "len")
    cand_short = (
        joined.where(
            (
                (F.col("plen") < F.col("len"))
                | ((F.col("plen") == F.col("len")) & (F.col("pid") < F.col("id")))
            )
            & (F.least(F.col("pgsz"), F.col("gsz")) <= qd)
        )
        .select(
            F.least(F.col("pid"), F.col("id")).alias("id_a"),
            F.greatest(F.col("pid"), F.col("id")).alias("id_b"),
        )
    )

    cand = cand_long.unionByName(cand_short)  # paths disjoint: no dedup needed
    sa = prof.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = prof.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a"),
            F.col("id_b"),
            F.levenshtein("s_a", "s_b", d).cast("long").alias("dist"),
        )
        .where(F.col("dist") >= 0)
    )

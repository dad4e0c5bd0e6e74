"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
scores each raw-corpus document by how much more likely its features
are under a small trusted/target corpus than under the raw corpus,
then resamples proportionally to the importance weight.  Features
are hashed n-grams (unigrams + bigrams) counted into a fixed number
of buckets, so both corpus profiles are tiny (``num_buckets`` longs)
regardless of corpus size.

    log w(d) = sum over gram occurrences g in d of
                 ln p_target[h(g)] - ln p_raw[h(g)]
    p_c[k]   = (count_c[k] + 1) / (T_c + B)        (Laplace)

Determinism policy (same as lmscore): the per-bucket log-ratio is
quantized ONCE on the B-row bucket table — both ln() terms rounded
to micro-nats (long) before subtracting — so the per-document
aggregate is an exact, order-independent long sum, reproducible
bit-for-bit across engines and partition layouts.

Bucket hashing is the engine-portable md5 path shared with
``functions.splits`` (Spark's ``hash`` is Murmur3-with-seed, DuckDB's
differs; md5 hex agrees everywhere), so the whole operator is
hash-oracle-able.

Plan shape (the 100-TB one):

    profile(target), profile(raw):  one scan each -> explode grams ->
        md5 bucket -> groupBy(bucket) count  (map-side partial agg;
        result <= B rows however large the corpus)
    score(candidates):  one scan -> explode grams -> bucket ->
        broadcast join with the B-row ratio table -> groupBy(id)
        sum(long)

Profiles are plain DataFrames — persist them once (``bucket_counts``)
and score any number of candidate shards without rescanning either
corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..plans.spread import fan_out as _r6_fan_out

from .lmscore import MICRO, _tokens, _tokens_sql


def _grams(col: str, lowercase: bool) -> F.Column:
    """Unigrams + space-joined bigrams as one array (the DSIR
    feature set, hashed downstream)."""
    toks = _tokens(col, lowercase)
    sz = F.size(toks)
    bigrams = F.when(
        sz >= 2,
        F.zip_with(
            F.slice(toks, 1, sz - 1),
            F.slice(toks, 2, sz - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _grams_sql(col: str, lowercase: bool) -> str:
    # the token expression is inlined (not a correlated subquery) —
    # verbose but engine-robust; oracle SQL is test-scale only
    t = _tokens_sql(col, lowercase)
    return (
        f"list_concat({t}, CASE WHEN len({t}) >= 2 THEN "
        f"list_transform(list_zip(({t})[1:len({t})-1], ({t})[2:len({t})]), "
        f"z -> z[1] || ' ' || z[2]) ELSE []::varchar[] END)"
    )


def _bucket(gram: F.Column, num_buckets: int, seed: int | str) -> F.Column:
    """md5 bucket of one gram string — same construction as
    functions.splits._hash60 (first 15 hex digits: 60 bits, lossless
    signed-long cast), applied to a computed column."""
    key = F.md5(F.concat_ws("|", F.lit(str(seed)), gram))
    return (F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % num_buckets).alias(
        "bucket"
    )


def _bucket_sql(gram_expr: str, num_buckets: int, seed: int | str) -> str:
    s = str(seed).replace("'", "''")
    return (
        f"(('0x' || substr(md5(concat_ws('|', '{s}', {gram_expr})), 1, 15))::ubigint "
        f"% {num_buckets})::bigint"
    )


def bucket_counts(
    df: DataFrame,
    col: str,
    *,
    num_buckets: int = 4096,
    seed: int | str = 0,
    lowercase: bool = True,
) -> DataFrame:
    """(bucket, cnt) hashed-gram profile of a corpus — one scan,
    map-side partial agg, <= num_buckets result rows.  Persist this
    once per corpus and reuse across scoring runs."""
    df = _r6_fan_out(df)  # no-op on healthy layouts; unsticks 1-row-group sources
    return (
        df.select(F.explode(_grams(col, lowercase)).alias("gram"))
        .select(_bucket(F.col("gram"), num_buckets, seed))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _ratio_table(
    candidates_spark, target_counts: DataFrame, raw_counts: DataFrame, num_buckets: int
) -> tuple[DataFrame, int]:
    """B-row (bucket, lr_micro) table: quantized ln-ratio per bucket,
    plus the floor ratio for buckets seen in neither corpus.

    Each profile is collected ONCE (<= num_buckets rows) and the
    ratio table is assembled driver-side — evaluating the totals agg
    and the join against the same lazy ``bucket_counts`` plan would
    scan each profile corpus twice.  ``round(ln(x) * 1e6)`` lands on
    the same micro grid in CPython, the JVM and DuckDB (<= 1-ulp ln
    differences, absorbed by the grid — same policy as lmscore)."""
    t_cnt = {int(r["bucket"]): int(r["cnt"]) for r in target_counts.collect()}
    r_cnt = {int(r["bucket"]): int(r["cnt"]) for r in raw_counts.collect()}
    td = float(sum(t_cnt.values()) + num_buckets)
    rd = float(sum(r_cnt.values()) + num_buckets)

    def _micro(c: int, denom: float) -> int:
        return round(math.log((c + 1) / denom) * MICRO)

    rows = [
        (b, _micro(t_cnt.get(b, 0), td) - _micro(r_cnt.get(b, 0), rd))
        for b in sorted(t_cnt.keys() | r_cnt.keys())
    ]
    ratios = candidates_spark.createDataFrame(rows or [], "bucket long, lr_micro long")
    floor_micro = _micro(0, td) - _micro(0, rd)
    return ratios, floor_micro


def dsir_log_weights(
    candidates: DataFrame,
    col: str,
    id_col: str,
    target_counts: DataFrame,
    raw_counts: DataFrame,
    *,
    num_buckets: int = 4096,
    seed: int | str = 0,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document DSIR importance log-weight.  Returns (id_col,
    n_grams, lr_micro_sum, log_weight) with log_weight = round(sum /
    1e6, 6); positive means the document looks more like the target
    corpus than the raw corpus.  Every candidate appears; gram-less
    documents carry n_grams=0 and NULL log_weight.

    ``target_counts`` / ``raw_counts`` come from :func:`bucket_counts`
    with the SAME num_buckets/seed/lowercase (profile once, score any
    number of shards).  Resample with weight exp(log_weight), e.g. via
    ``functions.splits.priority_sample``.
    """
    ratios, floor_micro = _ratio_table(
        candidates.sparkSession, target_counts, raw_counts, num_buckets
    )

    grams = candidates.select(
        F.col(id_col).alias("__id"), F.explode(_grams(col, lowercase)).alias("gram")
    ).select("__id", _bucket(F.col("gram"), num_buckets, seed))
    scored = (
        grams.join(F.broadcast(ratios), "bucket", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("lr_micro"), F.lit(floor_micro))).alias(
                "lr_micro_sum"
            ),
        )
    )
    return (
        candidates.select(F.col(id_col))
        .join(scored, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("lr_micro_sum", F.lit(0)).alias("lr_micro_sum"),
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("lr_micro_sum").cast("double") / MICRO, 6),
            ).alias("log_weight"),
        )
    )


def dsir_log_weights_sql(
    cand_table: str,
    col: str,
    id_col: str,
    target_table: str,
    raw_table: str,
    *,
    num_buckets: int = 4096,
    seed: int | str = 0,
    lowercase: bool = True,
) -> str:
    """DuckDB twin of :func:`dsir_log_weights` with profiles built
    in-query from ``target_table`` / ``raw_table`` — the identical
    staged construction, for oracle checks."""
    grams = _grams_sql(col, lowercase)
    bucket = _bucket_sql("gram", num_buckets, seed)
    return f"""
WITH tgrams AS (
  SELECT unnest({grams}) AS gram FROM {target_table}
),
rgrams AS (
  SELECT unnest({grams}) AS gram FROM {raw_table}
),
tcounts AS (
  SELECT {bucket} AS bucket, count(*) AS cnt FROM tgrams GROUP BY 1
),
rcounts AS (
  SELECT {bucket} AS bucket, count(*) AS cnt FROM rgrams GROUP BY 1
),
tot AS (
  SELECT (SELECT coalesce(sum(cnt), 0) FROM tcounts)::bigint + {num_buckets} AS td,
         (SELECT coalesce(sum(cnt), 0) FROM rcounts)::bigint + {num_buckets} AS rd
),
ratios AS (
  SELECT coalesce(t.bucket, r.bucket) AS bucket,
         round(ln((coalesce(t.cnt, 0) + 1)::double / td::double) * 1000000.0)::bigint
         - round(ln((coalesce(r.cnt, 0) + 1)::double / rd::double) * 1000000.0)::bigint
           AS lr_micro
  FROM tcounts t FULL JOIN rcounts r ON t.bucket = r.bucket, tot
),
floorv AS (
  SELECT round(ln(1.0 / td::double) * 1000000.0)::bigint
         - round(ln(1.0 / rd::double) * 1000000.0)::bigint AS m
  FROM tot
),
cgrams AS (
  SELECT {id_col} AS id, {bucket} AS bucket
  FROM (SELECT {id_col}, unnest({grams}) AS gram FROM {cand_table})
),
scored AS (
  SELECT c.id, count(*) AS n_grams,
         sum(coalesce(ratios.lr_micro, floorv.m))::bigint AS lr_micro_sum
  FROM cgrams c LEFT JOIN ratios ON c.bucket = ratios.bucket, floorv
  GROUP BY c.id
)
SELECT d.{id_col},
       coalesce(s.n_grams, 0)::bigint AS n_grams,
       coalesce(s.lr_micro_sum, 0)::bigint AS lr_micro_sum,
       CASE WHEN s.n_grams > 0
            THEN round(s.lr_micro_sum::double / 1000000.0, 6)
       END AS log_weight
FROM {cand_table} d LEFT JOIN scored s ON d.{id_col} = s.id
""".strip()

"""Deterministic hash-based dataset splitting and sampling.

Training-data pipelines need train/val/test assignment and
down-sampling that is (a) stable under repartitioning, retries and
re-runs, (b) reproducible across engines, and (c) a pure row-local
expression — no shuffle, no state.  Spark's ``df.sample`` /
``randomSplit`` are none of these (seed + partition dependent), so
every serious pipeline keys the decision off a content hash instead.

All functions here hash ``md5(seed || '|' || key columns)`` and take
the first 15 hex digits (60 bits, always < 2^63, so the signed-long
cast is lossless) — md5 hex output is identical in Spark and DuckDB,
which makes every operator below exactly hash-oracle-able.  Each
Spark expression has a byte-identical DuckDB SQL twin.

Scale notes: every column is a pure Catalyst projection (WholeStage
codegen, no Python, no shuffle); filtering by the flag pushes down to
the scan like any other predicate.  At 100 TB the split/sample
decision costs one md5 per row per pass and parallelizes perfectly.
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F

# Resolution of the split/sample space: fractions are quantized to
# 1/RESOLUTION.  1e6 keeps quantization error ≤ 5e-7, far below any
# sampling-rate intent, while staying well inside the 60-bit space.
RESOLUTION = 1_000_000


def _key(seed: int | str, cols: list[str]) -> Column:
    """md5 over seed + key columns.  NULL key values are encoded as a
    NUL byte (concat_ws would otherwise DROP a NULL together with its
    separator, making ('x', NULL) and (NULL, 'x') collide)."""
    return F.md5(
        F.concat_ws(
            "|",
            F.lit(str(seed)),
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
        )
    )


def _key_sql(seed: int | str, cols: list[str]) -> str:
    parts = ", ".join(f"coalesce({c}::varchar, chr(0))" for c in cols)
    s = str(seed).replace("'", "''")
    return f"md5(concat_ws('|', '{s}', {parts}))"


def _hash60(cols: list[str], seed: int | str) -> Column:
    """Raw 60-bit content hash (first 15 md5 hex digits; < 2^63, so
    the signed-long cast is lossless) — the shared primitive behind
    every operator in this module."""
    return F.conv(F.substring(_key(seed, cols), 1, 15), 16, 10).cast("long")


def hash_bucket(cols: list[str], num_buckets: int, *, seed: int | str = 0) -> Column:
    """Stable bucket in [0, num_buckets) from md5 of the key columns.

    The workhorse for deterministic splits, sharded processing, and
    A/B cohort assignment.  Unlike ``pmod(hash(...))``, the md5 path
    is engine-portable (Spark's ``hash`` is Murmur3-with-Spark-seed,
    DuckDB's differs) and unlike ``rand`` it is content-keyed.
    """
    return (_hash60(cols, seed) % F.lit(num_buckets)).alias("bucket")


def hash_bucket_sql(cols: list[str], num_buckets: int, *, seed: int | str = 0) -> str:
    return f"(('0x' || substr({_key_sql(seed, cols)}, 1, 15))::ubigint % {num_buckets})::bigint"


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    total = sum(fractions.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        out.append((name, int(round(acc * RESOLUTION))))
    out.append((names[-1], RESOLUTION))
    return out


def assign_split(
    cols: list[str], fractions: dict[str, float], *, seed: int | str = 0
) -> Column:
    """Split-name column ('train'/'val'/'test'/...) assigned by hash.

    ``fractions`` maps split name → fraction (must sum to 1; order
    matters — earlier entries take lower bucket ranges).  Assignment
    is row-local and content-keyed: re-running, repartitioning, or
    adding new rows never flips an existing row's split — the property
    randomSplit cannot give you and the reason pipelines hash-split.
    """
    bucket = hash_bucket(cols, RESOLUTION, seed=seed)
    expr = None
    for name, thr in _thresholds(fractions):
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.alias("split")


def assign_split_sql(
    cols: list[str], fractions: dict[str, float], *, seed: int | str = 0
) -> str:
    bucket = hash_bucket_sql(cols, RESOLUTION, seed=seed)
    arms = " ".join(
        f"WHEN {bucket} < {thr} THEN '{name}'" for name, thr in _thresholds(fractions)
    )
    return f"(CASE {arms} END)"


def sample_flag(cols: list[str], rate: float, *, seed: int | str = 0) -> Column:
    """Boolean deterministic-Bernoulli(rate) flag keyed on content.

    ``df.where(sample_flag(...))`` is a stable sample: the same rows
    survive on every run and on every engine.  Same-seed rates are
    NESTED (monotone): a 1% sample is a subset of the 10% sample,
    because both threshold one shared bucket value — so two same-seed
    flags always OVERLAP and are NOT a partition.  For disjoint
    train/eval-style partitioning use one flag and its negation
    (``flag`` vs ``~flag``), or :func:`assign_split`.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return (hash_bucket(cols, RESOLUTION, seed=seed) < F.lit(int(round(rate * RESOLUTION)))).alias(
        "sampled"
    )


def sample_flag_sql(cols: list[str], rate: float, *, seed: int | str = 0) -> str:
    thr = int(round(rate * RESOLUTION))
    return f"({hash_bucket_sql(cols, RESOLUTION, seed=seed)} < {thr})"


def stratified_sample_flag(
    cols: list[str],
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    seed: int | str = 0,
) -> Column:
    """Per-stratum deterministic sampling — e.g. keep 100% of rare
    languages but 5% of English.  ``rates`` maps stratum value →
    rate; strata not listed get ``default_rate``.  One shared bucket
    value thresholded per-stratum, so all of :func:`sample_flag`'s
    determinism/nesting properties hold within each stratum.
    """
    for v in list(rates.values()) + [default_rate]:
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rates must be in [0,1], got {v}")
    bucket = hash_bucket(cols, RESOLUTION, seed=seed)
    expr = None
    for value, rate in rates.items():
        cond = F.col(strata_col) == F.lit(value)
        thr = F.lit(int(round(rate * RESOLUTION)))
        expr = F.when(cond, bucket < thr) if expr is None else expr.when(cond, bucket < thr)
    default = bucket < F.lit(int(round(default_rate * RESOLUTION)))
    expr = default if expr is None else expr.otherwise(default)
    return expr.alias("sampled")


def stratified_sample_flag_sql(
    cols: list[str],
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    seed: int | str = 0,
) -> str:
    # SQL twin compares strata as quoted string literals — use string
    # stratum values (the Spark twin's F.lit accepts any type)
    bucket = hash_bucket_sql(cols, RESOLUTION, seed=seed)
    arms = " ".join(
        f"WHEN {strata_col} = '{str(value).replace(chr(39), chr(39) * 2)}' "
        f"THEN {bucket} < {int(round(rate * RESOLUTION))}"
        for value, rate in rates.items()
    )
    default = f"{bucket} < {int(round(default_rate * RESOLUTION))}"
    if not arms:
        return f"({default})"
    return f"(CASE {arms} ELSE {default} END)"


# ---- weighted sampling: priority sampling (Duffield-Lund-Thorup) ----
# Priority sampling (JACM 2007): priority q_i = w_i / u_i with
# u_i ~ U(0,1]; keep the k largest priorities per group.  Yields
# near-optimal unbiased subset-sum estimates via w_hat = max(w_i, tau)
# where tau is the (k+1)-th priority.  Chosen over Efraimidis-
# Spirakis (u^(1/w)) deliberately: ES needs pow(), whose libm
# implementations differ across engines in the last ulp and can flip
# near-tie orderings; priority sampling needs only int->double
# conversion, + and / — all IEEE-754-exact — so Spark and DuckDB
# produce BIT-IDENTICAL priorities and the operator is exactly
# hash-oracle-able.


_TWO60 = float(1 << 60)


def priority_sample(
    df,
    keys: list[str],
    weight_col: str,
    k: int,
    id_cols: list[str],
    *,
    seed: int | str = 0,
):
    """Top-k weighted sample per key group, deterministic and
    engine-portable.  Returns the sampled rows with ``priority`` and
    ``sample_rank`` columns.  Rows with non-positive or NULL weight
    are excluded (they have zero inclusion probability in the
    estimator anyway).

    Plan shape: one shuffle on ``keys`` into a rank window; Spark's
    WindowGroupLimit pushes the ``rank <= k`` filter into the sort, so
    each partition keeps only k rows per group.  Ties in priority are
    broken by ``id_cols`` so the selection is total-ordered.
    """
    from pyspark.sql import Window

    u = (_hash60(id_cols, seed).cast("double") + F.lit(0.5)) / F.lit(_TWO60)
    pri = F.col(weight_col).cast("double") / u
    w = Window.partitionBy(*keys).orderBy(
        F.desc("priority"), *[F.col(c).asc() for c in id_cols]
    )
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("priority", pri)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def priority_sql(weight_col: str, id_cols: list[str], *, seed: int | str = 0) -> str:
    """DuckDB twin of the priority expression (bit-identical: the
    60-bit hash -> double conversion, + 0.5 and the division are all
    IEEE-exact in both engines)."""
    h = f"('0x' || substr({_key_sql(seed, id_cols)}, 1, 15))::ubigint"
    return f"({weight_col}::double / (({h}::double + 0.5) / {1 << 60}.0))"

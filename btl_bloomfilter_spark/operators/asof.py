"""As-of join — attach the most recent earlier right-side row.

Spark has no ASOF JOIN operator (DuckDB, Pandas and kdb do); the
naive emulation is a range join (`l.key = r.key AND r.ts <= l.ts`
plus a per-left-row argmax), which Catalyst executes as a broadcast
nested loop or a join-then-window over the EXPLODED match set —
quadratic in rows-per-key.  This operator is the linear, Spark-first
formulation:

    union(left tagged 0, right tagged 1)
    -> ONE shuffle on key
    -> per-partition sort on (ts, tag, tiebreak)
    -> last(right_payload, ignorenulls) over rows up to current
    -> keep left rows

Wall-clock is sort + single pass regardless of key skew in the
match-count sense (no match-set materialization); the only shuffle
is the window's hash partition on key.  With `tolerance` the match
is nulled when older than the given gap (the Pandas
``merge_asof(tolerance=...)`` semantics).

Tie semantics: a right row AT the left row's timestamp matches
(<=, like DuckDB ASOF and pandas merge_asof default); among several
right rows sharing (key, ts) the one greatest by the LAST column of
``right_on + right_cols`` order below wins deterministically — dedup
the right side first if that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    *,
    right_cols: list[str] | None = None,
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """``left`` with, per row, the latest ``right`` row whose ``ts``
    is <= the left row's ``ts`` within the same ``on`` keys.

    ``right_cols`` selects which right columns to attach (default:
    all non-key, non-ts columns), each renamed with ``suffix``; the
    matched right timestamp is attached as ``ts + suffix``.
    ``tolerance`` (seconds — fractional allowed — for timestamp ts,
    plain number otherwise) nulls matches older than the gap;
    timestamp gaps compare at full microsecond precision via interval
    arithmetic.  NULL join keys never match (SQL equality semantics:
    right rows with a NULL key are excluded, left rows with a NULL
    key pass through unmatched), and rows with NULL ts never match.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != ts]
    payload = F.struct(
        F.col(ts).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.where(F.col(ts).isNotNull())
    for k in on:
        # NULL never equals NULL in a join; Window.partitionBy would
        # group NULL keys together, so drop them from the build side
        r = r.where(F.col(k).isNotNull())
    r = r.select(*on, F.col(ts).alias("__ev_ts"), payload.alias("__p")).withColumn(
        "__tag", F.lit(1)
    )
    l = left.withColumn("__ev_ts", F.col(ts)).withColumn(
        "__p", F.lit(None).cast(r.schema["__p"].dataType)
    ).withColumn("__tag", F.lit(0))
    # right (tag 1) sorts BEFORE left (tag 0) at equal ts, so a
    # same-timestamp right row is visible to the left row's frame
    u = l.select(*left.columns, "__ev_ts", "__p", "__tag").unionByName(
        r.select(
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
              if c not in on and c != ts],
            *on,
            F.col("__ev_ts").alias(ts),
            "__ev_ts", "__p", "__tag",
        ).select(*left.columns, "__ev_ts", "__p", "__tag")
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ev_ts").asc(), F.col("__tag").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).where(
        F.col("__tag") == 0
    )
    m = F.col("__m")
    if tolerance is not None:
        ts_col, m_ts = F.col(ts), m["__ts"]
        if dict(left.dtypes)[ts].startswith("timestamp"):
            # interval arithmetic keeps microsecond precision (a long
            # cast truncates to seconds and mis-ranks sub-second gaps)
            gap = ts_col - m_ts
            tol = F.expr(f"make_dt_interval(0, 0, 0, {float(tolerance)!r})")
        else:
            gap, tol = ts_col - m_ts, F.lit(tolerance)
        m = F.when(gap <= tol, m)
    out = matched.select(
        *left.columns,
        m["__ts"].alias(ts + suffix),
        *[m[c].alias(c + suffix) for c in right_cols],
    )
    return out

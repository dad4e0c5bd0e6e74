"""Interval (range) join — points matched to containing intervals.

Spark executes `p.ts BETWEEN i.start AND i.end` joins as a
BroadcastNestedLoopJoin (small side) or falls to a cartesian product —
O(|P|·|I|) work that is unrunnable at 100 TB.  DuckDB/Trino ship IEJoin
for this; Spark has nothing built-in.  This operator is the standard
scalable reformulation (bucketized equi-join, the pattern behind
Databricks' range-join "bin" hints):

    intervals: explode into the fixed-width buckets they overlap
               (`sequence(floor(start/W), floor(end/W))`)
    points:    bucket = floor(ts/W)   — each point in EXACTLY one bucket
    equi-join on ([keys,] bucket)  →  exact range predicate refine

Because a point lives in exactly one bucket and a qualifying interval
covers that bucket, every qualifying (point, interval) pair meets in
exactly one bucket: **no duplicate pairs, no dedup pass**.  The join is
a plain shuffled equi-join — SortMergeJoin/ShuffledHashJoin on
([keys,] bucket) — so it partitions, spills and AQE-skew-splits like
any other join; the plan-pin test asserts no NestedLoop/Cartesian node
survives.

Cost model: each interval replicates into `duration/W + 1` buckets.
`bucket_width=None` auto-sizes W to the p90 interval duration (one
approxQuantile scan of the intervals side), giving ≤ ~2 replicas for
90% of intervals; `max_replication` guards the degenerate corpus (one
year-long interval with W=1s) by raising with the measured factor
instead of silently exploding the shuffle.

Timestamps are compared at full microsecond precision
(`unix_micros`); plain numeric columns join as-is, so the same
operator serves time ranges and value ranges (e.g. part-price bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _fdiv(col: F.Column, w: int) -> F.Column:
    """Exact floor division on longs: (x - pmod(x, w)) / w with the
    division done in DECIMAL(38,0).  The numerator is an exact
    multiple of w, but for |x| > 2^53 it is not exactly representable
    as a double — a double division can land just below the true
    integer quotient and the long cast would truncate to bucket-1
    (silently dropping qualifying pairs, e.g. nanosecond-epoch
    longs).  Decimal arithmetic is exact at this width for the full
    long range, negatives included (pmod keeps the numerator a
    floor-multiple)."""
    numer = (col - F.pmod(col, F.lit(w))).cast("decimal(38,0)")
    return (numer / F.lit(w)).cast("long")


def _as_long(df: DataFrame, col: str) -> F.Column:
    """Order-preserving long view of a point/bound column.

    TIMESTAMP (ltz) uses unix_micros directly (instant-based, exact).
    TIMESTAMP_NTZ has no epoch function and an implicit NTZ→LTZ cast
    would inject the session timezone (verified: the naive
    to_utc_timestamp chain shifts by the session offset), so wall-clock
    micros are assembled arithmetically from tz-free field extracts —
    bit-exact and session-tz-independent."""
    t = df.schema[col].dataType
    if isinstance(t, TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(t, TimestampNTZType):
        c = f"`{col}`"
        return F.expr(
            f"unix_date(cast({c} as date)) * 86400000000L + hour({c}) * 3600000000L"
            f" + minute({c}) * 60000000L + cast(extract(second from {c}) * 1000000 as long)"
        )
    if isinstance(t, DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("long")
    return F.col(col).cast("long")


def interval_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    *,
    on: list[str] | None = None,
    bucket_width: int | None = None,
    end_inclusive: bool = False,
    max_replication: float = 64.0,
) -> DataFrame:
    """Inner-join each ``points`` row to every ``intervals`` row whose
    ``[start_col, end_col)`` range contains ``point_col`` (closed-open;
    ``end_inclusive=True`` for closed-closed), optionally also matching
    equality ``on`` keys present in both sides.

    Returns all points columns + all intervals columns (names must not
    collide — rename before joining).  Rows with NULL point/bounds and
    empty intervals (end before start) never match (inner-join
    semantics).  ``bucket_width`` is in microseconds for
    timestamp columns, days for dates, column units otherwise;
    ``None`` auto-sizes to the p90 interval duration.
    """
    on = list(on or [])
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"column name collision between sides: {sorted(clash)}")

    pts = points.withColumn("__v", _as_long(points, point_col)).where(F.col("__v").isNotNull())
    ivs = (
        intervals.withColumn("__s", _as_long(intervals, start_col))
        .withColumn("__e", _as_long(intervals, end_col))
        .where(F.col("__s").isNotNull() & F.col("__e").isNotNull())
        .where(F.col("__e") >= F.col("__s") if end_inclusive else F.col("__e") > F.col("__s"))
    )

    if bucket_width is None:
        # p90 duration: ≤ ~2 bucket replicas for 90% of intervals.
        # One extra scan of the (small) intervals side; pass an
        # explicit width to skip it.
        q = ivs.select((F.col("__e") - F.col("__s")).alias("d")).approxQuantile("d", [0.9], 0.01)
        bucket_width = max(int(q[0]) if q else 1, 1)
    w = int(bucket_width)
    if w < 1:
        raise ValueError("bucket_width must be >= 1")

    # replication guard: mean buckets-per-interval, one tiny agg
    stats = ivs.agg(
        F.avg((F.col("__e") - F.col("__s")) / w + 1.0).alias("avg_rep"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if stats["n"] and stats["avg_rep"] > max_replication:
        raise ValueError(
            f"bucket_width={w} replicates each interval into "
            f"{stats['avg_rep']:.1f} buckets on average (> max_replication="
            f"{max_replication}); raise bucket_width or max_replication"
        )

    # end bucket: for closed-open, a point at exactly __e does not
    # match, but __e may share __e//w with matching points below it
    iv_exp = ivs.withColumn(
        "__bkt",
        F.explode(F.sequence(_fdiv(F.col("__s"), w), _fdiv(F.col("__e"), w))),
    )
    pts_b = pts.withColumn("__bkt", _fdiv(F.col("__v"), w))

    upper = (F.col("__v") <= F.col("__e")) if end_inclusive else (F.col("__v") < F.col("__e"))
    joined = pts_b.join(iv_exp, on=on + ["__bkt"], how="inner").where(
        (F.col("__v") >= F.col("__s")) & upper
    )
    return joined.select(*points.columns, *[c for c in intervals.columns if c not in on])


def interval_join_count(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    interval_id: str,
    *,
    on: list[str] | None = None,
    bucket_width: int | None = None,
    end_inclusive: bool = False,
) -> DataFrame:
    """Points-per-interval counts (the common rollup): the interval
    side keeps id+bounds only, and the count groups on the interval id
    — partial map-side aggregation applies, so only (id, count) rows
    cross the second shuffle."""
    keys = list(on or [])
    ivs = intervals.select(*keys, interval_id, start_col, end_col)
    j = interval_join(
        points.select(*keys, point_col),
        point_col,
        ivs,
        start_col,
        end_col,
        on=on,
        bucket_width=bucket_width,
        end_inclusive=end_inclusive,
    )
    return j.groupBy(interval_id).agg(F.count(F.lit(1)).alias("n_points"))

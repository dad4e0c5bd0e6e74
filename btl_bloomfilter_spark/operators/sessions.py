"""Gap-based sessionization of event / transcript streams.

The standard analytics primitive Spark's batch API lacks as a single
operator (Structured Streaming has ``session_window``; batch jobs
re-derive it by hand every time): group events by key, order by
event time, and start a new session whenever the gap from the
previous event exceeds ``gap_seconds``.  Used here for agent-session
analytics over the events/transcripts tables (how long do tool-use
bursts run, how many events per burst).

Semantics (all exact integer arithmetic — fully hash-oracle-able):

    break(row)   = ts_micros - lag(ts_micros) > gap_seconds * 1e6
    session_idx  = running count of breaks within the key (0-based)

Rows with NULL timestamps are excluded (documented; a NULL has no
position in a gap sequence).  Ties on the timestamp cannot affect
assignment: equal timestamps have gap 0, which never breaks, so any
tie order yields the same session — assignment is deterministic
without a tiebreaker column.

Plan shape (the 100-TB one): ONE shuffle on the session key, then a
running-sum window that streams within each partition — no self-join,
no range join.  ``session_stats`` adds one partial-aggregating
groupBy on (key, session_idx), which reuses the window's partitioning
(same leading key) and therefore exchanges nothing new.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .rangejoin import _as_long

MICROS = 1_000_000


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    gap_seconds: int,
    session_col: str = "session_idx",
) -> DataFrame:
    """All input columns plus ``session_col`` (0-based session index
    within the key).  NULL-timestamp rows are dropped."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    gap_micros = int(gap_seconds) * MICROS
    # typed epoch-micros view: LTZ via unix_micros, NTZ via tz-free
    # field assembly (rangejoin._as_long) — session-tz independent
    mic = _as_long(df, ts_col)
    w = Window.partitionBy(*key_cols).orderBy(mic)
    brk = (
        (mic - F.lag(mic).over(w) > gap_micros).cast("long")
    )
    return (
        df.where(F.col(ts_col).isNotNull())
        .withColumn(
            session_col,
            F.sum(F.coalesce(brk, F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    gap_seconds: int,
) -> DataFrame:
    """One row per (key..., session_idx): n_events, start/end
    timestamps, duration_micros (exact long) and duration_secs
    (round-6 of the exact value)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds=gap_seconds)
    mic = _as_long(s, ts_col)
    return (
        s.groupBy(*key_cols, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            (F.max(mic) - F.min(mic)).alias("duration_micros"),
        )
        .withColumn(
            "duration_secs",
            F.round(F.col("duration_micros").cast("double") / MICROS, 6),
        )
    )


def session_stats_sql(
    table: str,
    key_cols: list[str],
    ts_col: str,
    *,
    gap_seconds: int,
) -> str:
    """DuckDB twin of :func:`session_stats` — identical window
    construction on epoch-microsecond longs, for oracle checks."""
    keys = ", ".join(key_cols)
    gap_micros = int(gap_seconds) * MICROS
    return f"""
WITH ordered AS (
  SELECT {keys}, {ts_col},
         epoch_us({ts_col}) AS mic,
         CASE WHEN epoch_us({ts_col})
                   - lag(epoch_us({ts_col})) OVER (PARTITION BY {keys} ORDER BY epoch_us({ts_col}))
                   > {gap_micros}
              THEN 1 ELSE 0 END AS brk
  FROM {table}
  WHERE {ts_col} IS NOT NULL
),
sessioned AS (
  SELECT {keys}, {ts_col}, mic,
         sum(brk) OVER (PARTITION BY {keys} ORDER BY mic
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint
           AS session_idx
  FROM ordered
)
SELECT {keys}, session_idx,
       count(*)::bigint AS n_events,
       min({ts_col}) AS start_ts,
       max({ts_col}) AS end_ts,
       (max(mic) - min(mic))::bigint AS duration_micros,
       round((max(mic) - min(mic))::double / 1000000.0, 6) AS duration_secs
FROM sessioned
GROUP BY {keys}, session_idx
""".strip()

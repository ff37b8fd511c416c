"""Gap-based sessionization over the ``events`` stream table.

Two equivalent formulations, both one-shuffle-on-user at any scale:

  - ``sessionize``: the classic lag/cumulative-sum labeling — a window
    over (user, ts) marks a new session when the gap to the previous
    event is strictly greater than the threshold, and a running sum of
    those marks is the per-user session ordinal. Two window functions
    over the SAME partitioning+ordering, so Catalyst plans ONE Exchange
    + ONE Sort.
  - ``session_stats``: Spark's built-in ``F.session_window`` (the
    Structured-Streaming-capable gap window, usable in batch). Events
    merge while the gap is <= the duration (touching ranges merge),
    exactly the lag-chain rule above, so its groups are provably
    identical to ``sessionize``'s labels — the DuckDB oracle for it IS
    the lag/cumsum SQL, which pins the built-in's semantics
    independently.

Gaps are computed in integer microseconds — the events fixture has
microsecond timestamps, and float seconds would round differently across
engines. The events table stores TIMESTAMP_NTZ (naive wall time), so
micros are derived with ``timestampdiff(MICROSECOND, epoch, ts)`` —
tz-independent, exactly DuckDB's ``epoch_us`` over naive timestamps —
never ``unix_micros``/``cast``, which would drag the session timezone
into the answer.

Reference parity note: the reference crawler has no sessionization; this
is part of the training-data-pipeline surface (grouping raw event/crawl
logs into user/host sessions before feature extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_MIN = 60_000_000


def _us(ts_col: str) -> "F.Column":
    """Integer microseconds since the naive epoch for a TIMESTAMP_NTZ
    column — DuckDB ``epoch_us`` semantics, no timezone involved."""
    return F.expr(
        "timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Label every event with its per-user session ordinal (1-based).

    New session when the gap to the user's previous event is STRICTLY
    greater than the threshold: ``F.session_window`` ranges are
    ``[ts, ts+gap]`` for merging purposes — two events exactly one gap
    apart touch and merge (verified empirically in
    tests/test_sessions_sampling.py) — and this labeling must agree with
    it. Ties on ts are broken by id for a deterministic scan order; the
    fixture has none, but determinism must not depend on that.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = _us(ts_col)
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | (us - prev > gap_minutes * US_PER_MIN), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(is_new).over(run))


def session_stats(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session aggregates via the built-in gap window: (user,
    session_start_us, n_events, duration_us, n_types).

    ``session_window`` is the idiomatic Spark path (and the one that
    carries over to ``readStream`` unchanged); start/duration are
    re-derived from min/max event time rather than the window struct so
    the output is engine-portable (the struct's end is last_ts + gap,
    which a SQL oracle would have to special-case).
    """
    gap = f"{gap_minutes} minutes"
    return (
        df.withColumn("_ts_us", _us(ts_col))
        .groupBy(user_col, F.session_window(ts_col, gap))
        .agg(
            F.min("_ts_us").alias("session_start_us"),
            F.count("*").alias("n_events"),
            (F.max("_ts_us") - F.min("_ts_us")).alias("duration_us"),
            F.countDistinct(type_col).alias("n_types"),
        )
        .select(
            user_col, "session_start_us", "n_events", "duration_us", "n_types"
        )
    )


def sessionize_sql(
    table: str = "events", gap_minutes: int = 30
) -> str:
    """DuckDB replica of ``sessionize`` (lag + running sum)."""
    gap_us = gap_minutes * US_PER_MIN
    return f"""
    SELECT event_id, user_id,
           (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING))::BIGINT
             AS session_seq
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
                  THEN 1 ELSE 0 END AS is_new
      FROM {table}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    """


def session_stats_sql(
    table: str = "events", gap_minutes: int = 30
) -> str:
    """DuckDB replica of ``session_stats`` — built from the lag/cumsum
    labeling, so a pass here pins ``F.session_window``'s gap-merge
    semantics against the classic SQL formulation."""
    gap_us = gap_minutes * US_PER_MIN
    return f"""
    SELECT user_id,
           min(epoch_us(ts))::BIGINT AS session_start_us,
           count(*) AS n_events,
           (max(epoch_us(ts)) - min(epoch_us(ts)))::BIGINT AS duration_us,
           count(DISTINCT event_type) AS n_types
    FROM (
      SELECT user_id, ts, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
                    THEN 1 ELSE 0 END AS is_new
        FROM {table}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
    GROUP BY user_id, session_seq
    """

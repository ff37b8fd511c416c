"""Tumbling and sliding time-window aggregation over the event stream.

The reference has no time-windowed analytics (its only clock is the
politeness tick, HostCrawler.scala:65); these are the standard
fixed-window rollups a crawl/ingest pipeline reports on — fetch rates per
minute, error counts per window — expressed with Spark's NATIVE
``F.window`` generator so the same code runs batch here and under
Structured Streaming with a watermark (streaming/ingest.py consumes the
same sinks).

Scale shape: ``F.window`` is a per-row projection (tumbling) or a bounded
explode of width/slide replicas (sliding) followed by ONE combine-heavy
groupBy on (window, keys) — the shuffle carries partially-aggregated
window rows, never raw events. No global sort; output order is imposed
only by the caller.

Determinism contract: window boundaries are integer microsecond
arithmetic on naive timestamps (``sessions._us`` — DuckDB ``epoch_us``
semantics), emitted as ``win_start_us`` BIGINT so no timezone ever
touches the compared values. Value sums use the repo's exact
decimal(18,6) pattern. The DuckDB oracles recompute the same windows
closed-form: tumbling ``(e // W) * W``; sliding via ``generate_series``
over ``i in [(e - W) // S + 1, e // S]`` — exactly the window set Spark's
generator assigns (start multiples of S with start <= e < start + W).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.analysis.sessions import _us

US = 1_000_000


def tumbling_stats(
    events: DataFrame,
    width_s: int,
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(win_start_us, key..., n_events, value_sum): fixed non-overlapping
    windows of ``width_s`` seconds via the native ``F.window`` generator
    (one projection, one combine-heavy groupBy)."""
    win = F.window(F.col(ts_col), f"{width_s} seconds")
    kcols = [F.col(c) for c in key_cols]
    return (
        events.groupBy(win.alias("_w"), *kcols)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            _us("_w.start").cast("long").alias("win_start_us"),
            *kcols,
            "n_events",
            "value_sum",
        )
    )


def sliding_stats(
    events: DataFrame,
    width_s: int,
    slide_s: int,
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(win_start_us, key..., n_events, value_sum): overlapping windows
    (width ``width_s``, hop ``slide_s``) — each event lands in
    width/slide windows; Spark's generator expands the replicas before
    the single combine-heavy groupBy."""
    # non-divisor hops are allowed: membership counts go uneven but the
    # semantics stay exact (no validation needed)
    win = F.window(F.col(ts_col), f"{width_s} seconds", f"{slide_s} seconds")
    kcols = [F.col(c) for c in key_cols]
    return (
        events.groupBy(win.alias("_w"), *kcols)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            _us("_w.start").cast("long").alias("win_start_us"),
            *kcols,
            "n_events",
            "value_sum",
        )
    )


def tumbling_sql(
    table: str,
    width_s: int,
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB replica: win_start_us = (epoch_us(ts) // W) * W."""
    w_us = width_s * US
    keys = "".join(f", {c}" for c in key_cols)  # '' when un-keyed
    return f"""
      SELECT ((epoch_us({ts_col}) // {w_us}) * {w_us})::BIGINT AS win_start_us
             {keys},
             count(*)::BIGINT AS n_events,
             CAST(round(sum(CAST({value_col} AS DECIMAL(18,6))), 2)
                  AS DOUBLE) AS value_sum
        FROM {table}
       GROUP BY win_start_us{keys}
    """


def sliding_sql(
    table: str,
    width_s: int,
    slide_s: int,
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB replica: per event, window starts i*S for
    i in [(e - W) // S + 1, e // S] (integer floor division; epoch_us is
    nonnegative for the fixture's 2024 timestamps so floor == //).
    DuckDB's generate_series can't take lateral column bounds, so the
    replicas come from a STATIC 0..ceil(W/S) series: win_start =
    (e // S - k) * S, kept while the window still covers the event."""
    w_us = width_s * US
    s_us = slide_s * US
    max_k = w_us // s_us  # k ranges 0..max_k; filter trims the extra one
    keys = "".join(f", {c}" for c in key_cols)  # '' when un-keyed
    return f"""
      WITH expanded AS (
        SELECT ((epoch_us({ts_col}) // {s_us} - g.i) * {s_us})::BIGINT
                 AS win_start_us
               {keys}, {value_col}
          FROM {table}, range(0, {max_k + 1}) AS g(i)
         WHERE epoch_us({ts_col})
               < ((epoch_us({ts_col}) // {s_us} - g.i) * {s_us}) + {w_us}
      )
      SELECT win_start_us{keys},
             count(*)::BIGINT AS n_events,
             CAST(round(sum(CAST({value_col} AS DECIMAL(18,6))), 2)
                  AS DOUBLE) AS value_sum
        FROM expanded
       GROUP BY win_start_us{keys}
    """

"""Stateful streaming operators: watermarked session windows and custom
``transformWithStateInPandas`` accumulators.

Two classes of state the built-in file-source topology in ingest.py
doesn't cover:

  - ``streaming_session_stats``: the SAME gap-session aggregation as
    analysis/sessions.session_stats, but on an unbounded stream — a
    watermark bounds how late events may arrive, and a session is
    emitted (append mode) once the watermark passes its close. State
    per in-flight session only, so state size tracks concurrent users,
    not history.
  - ``running_host_totals``: a custom stateful operator — cumulative
    per-host fetch counts across micro-batches (the live analogue of
    the batch R6 visit counting). Arrow-batched: one ValueState counter
    per host; each micro-batch adds its Arrow chunk sizes. This is the
    template for any custom crawl state the built-ins can't express
    (token-bucket politeness, per-host error EWMA, ...).

Both run identically under ``Trigger.AvailableNow`` for deterministic
catch-up (how the tests pin them to their batch equivalents).

API: the custom operators are written against Spark 4's
``transformWithStateInPandas`` (StatefulProcessor + typed state
variables — the successor of the legacy ``applyInPandasWithState``
GroupState surface, migrated per the round-3 note at the old
stateful.py:24-27). The new API's state-server protocol needs a
``google.protobuf`` runtime at query runtime; when the real package is
absent, :mod:`spider_spark.protoshim` provides a vendored pure-Python
mini-runtime — calling ``protoshim.install()`` BEFORE the first
SparkSession makes the TWS path fully executable (the test suite does
this in conftest; scripts/tws_validate.py is the standalone job). The
dispatchers still probe (``TWS_AVAILABLE``) and fall back to a
behavior-identical GroupState implementation when neither runtime is
importable — the StatefulProcessor classes themselves are exercised
directly by unit tests either way, and the streaming≡batch equality
tests pin whichever path runs.
transformWithState also requires the RocksDB state store provider;
``rocksdb_conf()`` returns the one setting a session needs before
starting such a query.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from spider_spark.analysis.sessions import _us


def _tws_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


#: transformWithStateInPandas runnable on this interpreter (its state
#: server speaks protobuf; absent -> the legacy GroupState fallback)
TWS_AVAILABLE = _tws_available()


def rocksdb_conf() -> dict[str, str]:
    """Session conf required by transformWithState queries: the HDFS-
    backed default state store does not implement the new API's typed
    state variables; RocksDB (bundled with Spark) does."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    }


def streaming_session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Watermarked gap-session aggregation; schema-identical to the
    batch analysis/sessions.session_stats. In append mode a session row
    lands once the watermark (max event time seen, minus the allowed
    lateness) passes the session's close — i.e. only finalized sessions
    are ever emitted, which is exactly the semantics a training-data
    consumer wants (no retractions)."""
    gap = f"{gap_minutes} minutes"
    # Watermarks only accept TIMESTAMP (not NTZ): keep the portable
    # microsecond clock derived from the NTZ wall time, and cast a
    # separate column for the watermark/session grouping. The cast is a
    # constant offset (session tz), so session grouping is unchanged —
    # unless the session timezone has DST folds; run streams under UTC.
    return (
        events.withColumn("_ts_us", _us(ts_col))
        .withColumn("_ts_wm", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts_wm", watermark)
        .groupBy(user_col, F.session_window("_ts_wm", gap))
        .agg(
            F.min("_ts_us").alias("session_start_us"),
            F.count("*").alias("n_events"),
            (F.max("_ts_us") - F.min("_ts_us")).alias("duration_us"),
            # countDistinct is not supported in streaming aggregations;
            # size(collect_set) is the exact equivalent with state
            # bounded by type cardinality
            F.size(F.collect_set(type_col)).cast("long").alias("n_types"),
        )
        .select(
            user_col, "session_start_us", "n_events", "duration_us", "n_types"
        )
    )


class _GroupStateValueShim:
    """Adapts a legacy GroupState handle to the ValueState get/update
    surface, so ONE StatefulProcessor implementation serves both the
    transformWithState path and the protobuf-less fallback."""

    def __init__(self, state):
        self._state = state

    def get(self):
        return tuple(self._state.get) if self._state.exists else None

    def update(self, v) -> None:
        self._state.update(tuple(v))


class _HostTotalsProcessor(StatefulProcessor):
    """Cumulative per-host count: ONE int64 ValueState per host."""

    def __init__(self, host_col: str):
        self._host_col = host_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._total = handle.getValueState("total", "n_total long")

    def handleInputRows(
        self, key, rows, timer_values
    ) -> Iterator[pd.DataFrame]:
        prev = self._total.get()
        total = prev[0] if prev is not None else 0
        batch = sum(len(pdf) for pdf in rows)
        total += batch
        self._total.update((total,))
        yield pd.DataFrame(
            {self._host_col: [key[0]], "n_total": [total], "n_batch": [batch]}
        )

    def close(self) -> None:
        pass


def running_host_totals(
    order: DataFrame, host_col: str = "host", api: str = "auto"
) -> DataFrame:
    """Cumulative per-host fetch counts across micro-batches (update
    mode: one row per host per micro-batch that touched it, carrying
    the running total). State is a single int64 per host — bounded by
    host cardinality, not crawl length.

    ``api``: "tws" forces transformWithStateInPandas (requires protobuf
    + ``rocksdb_conf()``), "legacy" forces applyInPandasWithState,
    "auto" picks tws when runnable."""
    out_schema = f"{host_col} string, n_total long, n_batch long"
    if api == "tws" or (api == "auto" and TWS_AVAILABLE):
        return order.groupBy(host_col).transformWithStateInPandas(
            statefulProcessor=_HostTotalsProcessor(host_col),
            outputStructType=out_schema,
            outputMode="update",
            timeMode="none",
        )
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    proc = _HostTotalsProcessor(host_col)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # fallback delegates to the SAME processor logic through a
        # GroupState-backed ValueState shim — one implementation of the
        # accumulator math, two wire protocols
        proc._total = _GroupStateValueShim(state)
        yield from proc.handleInputRows(key, pdfs, None)

    return order.groupBy(host_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="n_total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_tumbling_stats(
    events: DataFrame,
    width_s: int,
    watermark: str = "0 seconds",
    key_cols: tuple = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked fixed-window rollup; schema-identical to the batch
    analysis/windows.tumbling_stats (win_start_us, key..., n_events,
    value_sum), which doubles as its equality oracle. Append mode emits
    a window only after the watermark passes its end — finalized rows
    only, no retractions.

    Unlike the session variant (whose gap grouping is offset-invariant,
    so a plain tz cast suffices), fixed-window FLOORS are offset-
    sensitive: F.window over a tz-cast timestamp aligns to UTC epoch,
    which disagrees with the batch oracle's NTZ wall-time floor whenever
    the session tz offset is not a multiple of width_s. The watermark
    column here is therefore built as ``timestamp_micros(wall_us)`` — a
    TIMESTAMP whose UTC instant equals the NTZ wall microseconds — so
    window boundaries floor on wall time in ANY session timezone and
    ``win_start_us`` (via unix_micros) is bit-equal to the batch
    tumbling_stats output."""
    kcols = [F.col(c) for c in key_cols]
    return (
        events.withColumn("_ts_wm", F.timestamp_micros(_us(ts_col)))
        .withWatermark("_ts_wm", watermark)
        .groupBy(
            F.window("_ts_wm", f"{width_s} seconds").alias("_w"),
            *kcols,
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.unix_micros(F.col("_w.start")).cast("long").alias("win_start_us"),
            *kcols,
            "n_events",
            "value_sum",
        )
    )


class _TokenBucketProcessor(StatefulProcessor):
    """Per-host token bucket: ONE int64 ValueState per host."""

    def __init__(self, rate, capacity, host_col, url_col, seq_col):
        self._rate = int(rate)
        self._capacity = int(capacity)
        self._host_col = host_col
        self._url_col = url_col
        self._seq_col = seq_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._tokens = handle.getValueState("tokens", "tokens long")

    def handleInputRows(
        self, key, rows, timer_values
    ) -> Iterator[pd.DataFrame]:
        prev = self._tokens.get()
        tokens = prev[0] if prev is not None else self._capacity
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(self._seq_col, kind="mergesort").reset_index(
            drop=True
        )
        take = min(int(tokens), len(pdf))
        out = pdf.iloc[:take].copy()
        out["batch_pos"] = range(1, take + 1)
        # spend, then refill for the NEXT batch (deferred rows are
        # dropped here — a production stream re-queues them upstream;
        # the bounded state is the point of this template)
        tokens = min(self._capacity, tokens - take + self._rate)
        self._tokens.update((int(tokens),))
        yield out[[self._host_col, self._url_col, self._seq_col, "batch_pos"]]

    def close(self) -> None:
        pass


def token_bucket_schedule(
    frontier: DataFrame,
    rate: int,
    capacity: int,
    host_col: str = "host",
    url_col: str = "url",
    seq_col: str = "seq",
    api: str = "auto",
) -> DataFrame:
    """Streaming politeness: per-host token bucket over micro-batches —
    the custom stateful operator the built-in streaming aggregations
    can't express (state must both gate AND mutate per batch).

    Each micro-batch a host schedules at most ``tokens`` of its frontier
    rows in seq (FIFO) order, spends them, then refills by ``rate``
    capped at ``capacity``; buckets start full. This is the streaming
    twin of the batch engine's R8 budget (operators/politeness.py): with
    rate == capacity == scrape_parallelism and one micro-batch per tick
    the schedules coincide; the bucket generalizes it to bursty
    frontiers (unused budget accumulates up to ``capacity``).

    State per host is ONE int64 — bounded by host cardinality. Arrow-
    batched; update mode. ``api`` as in :func:`running_host_totals`
    (tws requires protobuf + ``rocksdb_conf()``)."""
    out_schema = (
        f"{host_col} string, {url_col} string, {seq_col} long, "
        "batch_pos long"
    )
    proc = _TokenBucketProcessor(rate, capacity, host_col, url_col, seq_col)
    if api == "tws" or (api == "auto" and TWS_AVAILABLE):
        return frontier.groupBy(host_col).transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=out_schema,
            outputMode="update",
            timeMode="none",
        )
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # fallback delegates to the SAME processor logic through a
        # GroupState-backed ValueState shim — one implementation of the
        # bucket math, two wire protocols
        proc._tokens = _GroupStateValueShim(state)
        yield from proc.handleInputRows(key, pdfs, None)

    return frontier.groupBy(host_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="tokens long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Watermarked session windows and applyInPandasWithState accumulators:
streaming results must equal their batch equivalents, with state carried
across forced multi-file micro-batches."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from spider_spark.analysis.sessions import session_stats
from spider_spark.streaming.ingest import run_available_now
from spider_spark.streaming.stateful import (
    running_host_totals,
    streaming_session_stats,
)

BASE = dt.datetime(2024, 1, 1)


def _ev(eid, uid, minutes, typ="a"):
    return (eid, uid, BASE + dt.timedelta(minutes=minutes), typ)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Three files (forces three micro-batches at maxFilesPerTrigger=1);
    the last file holds one far-future 'closer' event per user so the
    watermark passes every real session's close before the stream ends."""
    tmp = str(tmp_path_factory.mktemp("stream_events"))
    schema = "event_id long, user_id long, ts timestamp_ntz, event_type string"
    files = [
        [_ev(1, 1, 0), _ev(2, 1, 10, "b"), _ev(3, 2, 5)],
        [_ev(4, 1, 120), _ev(5, 2, 6, "b"), _ev(6, 2, 200)],
        [_ev(90 + u, u, 60 * 24 * 10) for u in (1, 2)],  # closers
    ]
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(tmp, f"part{i}"), mode="overwrite"
        )
    return tmp


def _read_stream(spark, events_dir):
    schema = "event_id long, user_id long, ts timestamp_ntz, event_type string"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(events_dir, "part*"))
    )


def test_streaming_sessions_equal_batch_finalized(spark, events_dir, tmp_path):
    run_available_now(
        streaming_session_stats(_read_stream(spark, events_dir)),
        "t_sessions",
        str(tmp_path / "ck_sess"),
        output_mode="append",
    )
    got = sorted(tuple(r) for r in spark.table("t_sessions").collect())
    batch_all = session_stats(
        spark.read.parquet(os.path.join(events_dir, "part*"))
    )
    closer_us = 10 * 24 * 3600 * 1_000_000 + 1_704_067_200_000_000
    want = sorted(
        tuple(r)
        for r in batch_all.where(
            F.col("session_start_us") < closer_us
        ).collect()
    )
    assert got == want and len(got) == 4  # u1: 2 sessions, u2: 2 sessions


def test_running_host_totals_state_carries(spark, events_dir, tmp_path):
    stream = _read_stream(spark, events_dir).select(
        F.concat(F.lit("h"), F.col("user_id").cast("string")).alias("host")
    )
    run_available_now(
        running_host_totals(stream),
        "t_totals",
        str(tmp_path / "ck_tot"),
        output_mode="update",
    )
    rows = spark.table("t_totals").collect()
    finals = {}
    batches = {}
    for r in rows:
        finals[r["host"]] = max(finals.get(r["host"], 0), r["n_total"])
        batches.setdefault(r["host"], []).append(r["n_batch"])
    batch_counts = {
        r["host"]: r["n"]
        for r in spark.read.parquet(os.path.join(events_dir, "part*"))
        .select(
            F.concat(F.lit("h"), F.col("user_id").cast("string")).alias("host")
        )
        .groupBy("host")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert finals == batch_counts
    # state genuinely accumulated across micro-batches: every host was
    # touched by more than one batch, and per-batch increments sum to
    # the final total
    for host, incs in batches.items():
        assert len(incs) > 1
        assert sum(incs) == finals[host]


def test_streaming_tumbling_equals_batch_finalized(spark, events_dir, tmp_path):
    """Watermarked tumbling windows (append mode) over forced
    micro-batches equal the batch windows.tumbling_stats for every
    window the watermark closed — batch is the oracle, same schema."""
    from spider_spark.analysis.windows import tumbling_stats
    from spider_spark.streaming.stateful import streaming_tumbling_stats

    stream = _read_stream(spark, events_dir).withColumn(
        "value", F.col("event_id").cast("double")
    )
    run_available_now(
        streaming_tumbling_stats(stream, width_s=3600),
        "t_tumbling",
        str(tmp_path / "ck_tw"),
        output_mode="append",
    )
    got = sorted(tuple(r) for r in spark.table("t_tumbling").collect())
    batch = tumbling_stats(
        spark.read.parquet(os.path.join(events_dir, "part*")).withColumn(
            "value", F.col("event_id").cast("double")
        ),
        width_s=3600,
    )
    closer_us = 10 * 24 * 3600 * 1_000_000 + 1_704_067_200_000_000
    want = sorted(
        tuple(r)
        for r in batch.where(F.col("win_start_us") < closer_us).collect()
    )
    assert got == want
    assert len(got) >= 3  # events span hours 0, 2, 3+ before the closers

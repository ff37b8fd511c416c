"""Watermarked session windows and transformWithStateInPandas
accumulators: streaming results must equal their batch equivalents, with
state carried across forced multi-file micro-batches."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from spider_spark.analysis.sessions import session_stats
from spider_spark.streaming.ingest import run_available_now
from spider_spark.streaming.stateful import (
    rocksdb_conf,
    running_host_totals,
    streaming_session_stats,
)


@pytest.fixture(autouse=True, scope="module")
def _rocksdb_state_store(spark):
    """transformWithState requires the RocksDB state store provider;
    scoped to this module and restored after, so the other streaming
    tests keep the default provider. When protobuf is absent the
    operators fall back to GroupState and the default provider is kept
    (TWS_AVAILABLE gate)."""
    from spider_spark.streaming.stateful import TWS_AVAILABLE

    if not TWS_AVAILABLE:
        yield
        return
    old = {}
    for k, v in rocksdb_conf().items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)

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


def test_token_bucket_schedule_across_batches(spark, tmp_path):
    """Per-host token bucket over forced micro-batches ≡ a pure-Python
    simulation of the same (batch, host, seq) stream: buckets start
    full, spend per scheduled row, refill by rate up to capacity."""
    from spider_spark.streaming.stateful import token_bucket_schedule

    tmp = str(tmp_path / "tb_frontier")
    schema = "host string, url string, seq long"
    files = [
        # batch 0: h1 bursts 5 urls (capacity 3 -> schedule 3)
        [("h1", f"https://h1/{i}", i) for i in range(5)]
        + [("h2", "https://h2/0", 0)],
        # batch 1: h1 adds 2 more (tokens 0+2=2 -> schedule 2)
        [("h1", f"https://h1/{i}", i) for i in range(5, 7)],
        # batch 2: nothing for h1; h2 one more
        [("h2", "https://h2/1", 1)],
    ]
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(tmp, f"part{i}"), mode="overwrite"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(tmp, "part*"))
    )
    run_available_now(
        token_bucket_schedule(stream, rate=2, capacity=3),
        "t_bucket",
        str(tmp_path / "ck_tb"),
        output_mode="update",
    )
    got = {
        (r["host"], r["url"]): r["batch_pos"]
        for r in spark.table("t_bucket").collect()
    }
    # python simulation of the same bucket discipline
    tokens = {}
    want = {}
    for rows in files:
        by_host = {}
        for h, u, s in rows:
            by_host.setdefault(h, []).append((s, u))
        for h, items in by_host.items():
            t = tokens.get(h, 3)
            items.sort()
            take = min(t, len(items))
            for pos, (_s, u) in enumerate(items[:take], 1):
                want[(h, u)] = pos
            tokens[h] = min(3, t - take + 2)
    assert got == want
    # the burst actually deferred: urls 3,4 of h1's first batch dropped
    assert ("h1", "https://h1/3") not in got
    assert ("h1", "https://h1/5") in got  # scheduled in batch 1


# ------------------------- StatefulProcessor unit coverage (new API)
#
# transformWithStateInPandas needs a google.protobuf runtime at query
# time; conftest installs the vendored spider_spark.protoshim before the
# JVM starts, so in this suite the api="auto" tests above execute the
# REAL TransformWithStateInPandas path (state server + RocksDB). The
# StatefulProcessor classes are also driven directly against a fake
# ValueState here: identical math, no wire protocol.


class _FakeValueState:
    def __init__(self):
        self.v = None

    def get(self):
        return self.v

    def update(self, v):
        self.v = tuple(v)

    def exists(self):
        return self.v is not None

    def clear(self):
        self.v = None


def test_host_totals_processor_accumulates():
    import pandas as pd

    from spider_spark.streaming.stateful import _HostTotalsProcessor

    proc = _HostTotalsProcessor("host")
    proc._total = _FakeValueState()
    out1 = list(
        proc.handleInputRows(("h1",), iter([pd.DataFrame({"x": [1, 2]})]), None)
    )[0]
    out2 = list(
        proc.handleInputRows(
            ("h1",), iter([pd.DataFrame({"x": [3]}), pd.DataFrame({"x": [4]})]), None
        )
    )[0]
    assert out1.iloc[0].to_dict() == {"host": "h1", "n_total": 2, "n_batch": 2}
    assert out2.iloc[0].to_dict() == {"host": "h1", "n_total": 4, "n_batch": 2}
    assert proc._total.get() == (4,)


def test_token_bucket_processor_spend_and_refill():
    import pandas as pd

    from spider_spark.streaming.stateful import _TokenBucketProcessor

    proc = _TokenBucketProcessor(2, 3, "host", "url", "seq")
    proc._tokens = _FakeValueState()

    def batch(n, start=0):
        return iter(
            [
                pd.DataFrame(
                    {
                        "host": ["h"] * n,
                        "url": [f"u{start + i}" for i in range(n)],
                        "seq": list(range(start, start + n)),
                    }
                )
            ]
        )

    # bucket starts full (3): takes 3 of 5, refills to 0-3+2=2
    out1 = list(proc.handleInputRows(("h",), batch(5), None))[0]
    assert list(out1["url"]) == ["u0", "u1", "u2"]
    assert list(out1["batch_pos"]) == [1, 2, 3]
    assert proc._tokens.get() == (2,)
    # second batch: takes 2, refills to 0+2=2
    out2 = list(proc.handleInputRows(("h",), batch(4, start=10), None))[0]
    assert list(out2["url"]) == ["u10", "u11"]
    assert proc._tokens.get() == (2,)
    # empty-ish batch: takes 1 of 1, refills to capped 3
    out3 = list(proc.handleInputRows(("h",), batch(1, start=20), None))[0]
    assert len(out3) == 1
    assert proc._tokens.get() == (3,)


def test_tws_api_flag_consistency(spark):
    """api='tws' must build a transformWithStateInPandas plan; api=
    'legacy' an applyInPandasWithState one (plan-level pin that the
    dispatch actually switches APIs)."""
    from spider_spark.streaming.stateful import (
        TWS_AVAILABLE,
        running_host_totals,
    )

    assert isinstance(TWS_AVAILABLE, bool)
    if not TWS_AVAILABLE:
        pytest.skip("no protobuf runtime: cannot build the TWS plan")
    df = spark.createDataFrame(
        [("h", "u", 1)], "host string, url string, seq long"
    )
    tws_plan = (
        running_host_totals(df, api="tws")
        ._jdf.queryExecution()
        .logical()
        .toString()
    )
    legacy_plan = (
        running_host_totals(df, api="legacy")
        ._jdf.queryExecution()
        .logical()
        .toString()
    )
    # Spark 4.1 names the logical node TransformWithStateInPySpark
    assert "TransformWithStateIn" in tws_plan
    assert "TransformWithStateIn" not in legacy_plan
    assert "FlatMapGroupsInPandasWithState" in legacy_plan


def test_tws_and_legacy_token_buckets_agree(spark, tmp_path):
    """The SAME frontier through BOTH wire protocols: the real
    transformWithStateInPandas state server (vendored protobuf shim)
    and the GroupState fallback must schedule identical rows — the
    strongest available pin that the shim's wire encoding is correct
    end-to-end (the JVM state server parses every request it sends)."""
    from spider_spark.streaming.stateful import (
        TWS_AVAILABLE,
        token_bucket_schedule,
    )

    if not TWS_AVAILABLE:
        pytest.skip("no protobuf runtime; TWS path not executable")
    tmp = str(tmp_path / "tb2_frontier")
    schema = "host string, url string, seq long"
    files = [
        [("h1", f"https://h1/{i}", i) for i in range(5)]
        + [("h2", "https://h2/0", 0)],
        [("h1", f"https://h1/{i}", i) for i in range(5, 7)],
        [("h2", "https://h2/1", 1)],
    ]
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(tmp, f"part{i}"), mode="overwrite"
        )
    results = {}
    for api in ("tws", "legacy"):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(tmp, "part*"))
        )
        run_available_now(
            token_bucket_schedule(stream, rate=2, capacity=3, api=api),
            f"t_tb2_{api}",
            str(tmp_path / f"ck_tb2_{api}"),
            output_mode="update",
        )
        results[api] = {
            (r["host"], r["url"], r["seq"], r["batch_pos"])
            for r in spark.table(f"t_tb2_{api}").collect()
        }
    assert results["tws"] == results["legacy"]
    # h1: 3 in batch 0 (urls 3,4 deferred) + 2 in batch 1; h2: 1 + 1
    assert len(results["tws"]) == 7
    assert ("h1", "https://h1/3", 3, 4) not in results["tws"]

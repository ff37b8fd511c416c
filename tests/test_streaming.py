"""Structured-Streaming consumption of the engine's per-round sinks:
streaming results must equal the batch computation over the same files
(Trigger.AvailableNow drains deterministically)."""

import os

import pytest

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.fixtures import synth_web, write_web
from spider_spark.streaming.ingest import (
    crawl_order_stats,
    host_budget_alert,
    read_sink_stream,
    run_available_now,
    streaming_seen_dedup,
)


@pytest.fixture(scope="module")
def crawl_dirs(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream_crawl")
    web = synth_web(n_hosts=3, pages_per_host=40, links_per_page=5)
    input_dir = write_web(web, str(tmp / "web"))
    work_dir = str(tmp / "work")
    eng = CrawlEngine(
        spark, input_dir, work_dir, CrawlConfig(scrape_parallelism=20)
    )
    eng.run()
    yield work_dir, eng
    eng.close()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_order_stats_equal_batch(spark, crawl_dirs, tmp_path):
    work_dir, eng = crawl_dirs
    stream = read_sink_stream(spark, work_dir, "order")
    run_available_now(
        crawl_order_stats(stream),
        "t_order_stats",
        str(tmp_path / "ck1"),
        output_mode="complete",
    )
    got = _rows(spark.table("t_order_stats"))
    want = _rows(crawl_order_stats(eng.order_df()))
    assert got == want and len(got) > 0


def test_streaming_seen_dedup_equal_batch_distinct(spark, crawl_dirs, tmp_path):
    work_dir, eng = crawl_dirs
    stream = read_sink_stream(spark, work_dir, "seen")
    run_available_now(
        streaming_seen_dedup(stream),
        "t_seen_dedup",
        str(tmp_path / "ck2"),
        output_mode="append",
    )
    got = {r["url"] for r in spark.table("t_seen_dedup").collect()}
    want = {r["url"] for r in eng.seen_df().select("url").distinct().collect()}
    assert got == want and len(got) > 0
    # stateful dedup: exactly one row per url even though retries/rounds
    # append the same url multiple times to the sink
    assert spark.table("t_seen_dedup").count() == len(got)


def test_streaming_budget_alert(spark, crawl_dirs, tmp_path):
    work_dir, eng = crawl_dirs
    stream = read_sink_stream(spark, work_dir, "order")
    run_available_now(
        host_budget_alert(stream, budget=20),
        "t_alerts",
        str(tmp_path / "ck3"),
        output_mode="complete",
    )
    got = _rows(spark.table("t_alerts"))
    want = _rows(host_budget_alert(eng.order_df(), budget=20))
    assert got == want
    # the synthetic web saturates at least one host's budget in some round
    assert len(got) > 0


def test_incremental_micro_batches(spark, crawl_dirs, tmp_path):
    # maxFilesPerTrigger=1 forces many micro-batches; the drained result
    # must be identical to the single-batch drain (state carries over)
    work_dir, eng = crawl_dirs
    stream = read_sink_stream(spark, work_dir, "seen", max_files=1)
    run_available_now(
        streaming_seen_dedup(stream),
        "t_seen_inc",
        str(tmp_path / "ck4"),
        output_mode="append",
    )
    got = {r["url"] for r in spark.table("t_seen_inc").collect()}
    want = {r["url"] for r in eng.seen_df().select("url").distinct().collect()}
    assert got == want

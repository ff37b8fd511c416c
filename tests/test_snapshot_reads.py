"""Snapshot (as-of) state reads: urls/seen/order as of round r equal the
state captured right after round r — including after compact_state
merges the per-round dirs (the round column, not the path layout, is
the snapshot boundary)."""

from __future__ import annotations

import pytest

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.fixtures import synth_web, write_web


def test_as_of_snapshot_reads(spark, tmp_path):
    web = synth_web(n_hosts=2, pages_per_host=30, links_per_page=4, seed=17)
    cfg = CrawlConfig(scrape_parallelism=6, max_retries=1)
    input_dir = write_web(web, str(tmp_path / "web_asof"))
    eng = CrawlEngine(spark, input_dir, str(tmp_path / "work_asof"), cfg)
    eng.initialize()
    eng.run_round()
    eng.run_round()
    seen2 = {tuple(r) for r in eng.seen_df().collect()}
    urls2 = {tuple(r) for r in eng.urls_df().collect()}
    order2 = {tuple(r) for r in eng.order_df().collect()}
    frontier2 = {tuple(r) for r in eng.frontier_df().collect()}

    eng.run()  # crawl to completion
    assert eng.round > 2
    assert {tuple(r) for r in eng.seen_df(as_of=2).collect()} == seen2
    assert {tuple(r) for r in eng.urls_df(as_of=2).collect()} == urls2
    assert {tuple(r) for r in eng.order_df(as_of=2).collect()} == order2
    assert {tuple(r) for r in eng.frontier_df(as_of=2).collect()} == frontier2
    # the snapshot is a strict prefix of the final state
    assert seen2 < {tuple(r) for r in eng.seen_df().collect()}

    # after compaction the per-round dirs are merged — the as_of filter
    # still reconstructs the exact round-2 state from the round column
    eng.compact_state()
    assert {tuple(r) for r in eng.seen_df(as_of=2).collect()} == seen2
    assert {tuple(r) for r in eng.urls_df(as_of=2).collect()} == urls2
    assert {tuple(r) for r in eng.order_df(as_of=2).collect()} == order2

    with pytest.raises(FileNotFoundError):
        eng.frontier_df(as_of=9999)

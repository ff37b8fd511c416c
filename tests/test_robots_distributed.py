"""Distributed robots dimension — the rules table + per-round slice path.

The north-rule web has O(10^6+) hosts, so robots bodies are parsed by a
Spark job into a rules table (functions/robots.make_parse_rules_udf) and
only bounded active-host slices ever reach the driver/broadcast
(engine._rules_slice). These tests pin:

  - rules-table rows reconstruct the exact driver-parse semantics
  - slice mode (robots_broadcast_hosts=0) is engine-vs-oracle exact on
    crawl order / seen set / indexed urls, including Crawl-delay budgets
  - a >100k-host robots table flips the engine to slice mode under the
    DEFAULT config with no full-table collect, and the crawl still
    matches the oracle exactly
"""

import pytest

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.fixtures import demo_web, write_web
from spider_spark.functions.robots import (
    RULES_ROW_SCHEMA,
    RobotsTable,
    make_parse_rules_udf,
    parse_robots,
    rules_from_row,
    rules_to_row,
)
from spider_spark.oracle import crawl as oracle_crawl

from tests.test_engine_vs_oracle import assert_match, engine_run


def _slice_cfg(**kw):
    kw.setdefault("robots_broadcast_hosts", 0)  # force per-round slices
    kw.setdefault("scrape_parallelism", 3)
    kw.setdefault("max_rounds", 200)
    return CrawlConfig(**kw)


def test_rules_table_matches_driver_parse(spark, tmp_path):
    """The Spark-parsed rules table reconstructs rules that decide every
    URL exactly as the direct driver parse does."""
    web = demo_web()
    input_dir = write_web(web, str(tmp_path / "web"))
    import os

    rules_df = spark.read.parquet(
        os.path.join(input_dir, "robots.parquet")
    ).mapInPandas(make_parse_rules_udf("SpiderSparkBot"), RULES_ROW_SCHEMA)
    got = RobotsTable.from_rule_rows(rules_df.collect())
    urls = [
        f"https://{h}/{p}"
        for h in web.robots
        for p in ("", "private/x", "private/ok", "a/b.html", "q?x=1")
    ]
    for host, body in web.robots.items():
        want = parse_robots(body, "SpiderSparkBot")
        have = got.rules_for(host)
        for u in urls:
            assert want.is_allowed(u) == have.is_allowed(u), (host, u)
        assert want.sitemaps == have.sitemaps
        assert want.crawl_delay == have.crawl_delay


def test_row_roundtrip_preserves_rule_order():
    body = (
        "User-agent: *\nDisallow: /a\nAllow: /a/b*\nDisallow: /a/b/c$\n"
        "Crawl-delay: 1.5\nSitemap: https://h/s.xml\n"
    )
    rr = parse_robots(body, "bot")
    row = rules_to_row("h", rr)
    rr2 = rules_from_row(
        row["mode"], row["rules"], row["sitemaps"], row["crawl_delay"]
    )
    for u in ("https://h/a", "https://h/a/bx", "https://h/a/b/c", "https://h/z"):
        assert rr.is_allowed(u) == rr2.is_allowed(u), u


def test_slice_mode_matches_oracle(spark, tmp_path):
    web = demo_web()
    cfg = _slice_cfg(max_retries=1)
    oracle_res = oracle_crawl(web, cfg)
    eng, summary = engine_run(spark, web, cfg, tmp_path, "slice")
    assert eng.robots is None and eng._robots_bc is None, (
        "slice mode must not build a global robots broadcast"
    )
    assert_match(eng, oracle_res)
    assert summary.rounds == oracle_res.rounds
    assert eng._round_bcs == [], "round slice broadcasts must be released"


def test_slice_mode_crawl_delay_budgets(spark, tmp_path):
    web = demo_web()
    hosts = sorted(web.robots)
    web.robots[hosts[0]] = (
        (web.robots.get(hosts[0]) or "") + "\nUser-agent: *\nCrawl-delay: 1\n"
    )
    cfg = _slice_cfg(respect_crawl_delay=True)
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "slice_delay")
    assert eng.robots is None
    assert_match(eng, oracle_res)


def test_legacy_seeding_in_slice_mode(spark, tmp_path):
    """The driver-side legacy seeding path still works in slice mode via
    the explicit full-collect fallback (oracle-parity cost class)."""
    web = demo_web()
    cfg = _slice_cfg(spark_seeding=False)
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "slice_legacy")
    assert_match(eng, oracle_res)


def test_100k_host_rules_table(spark, tmp_path):
    """>100k robots hosts under the DEFAULT threshold: the engine must
    flip to slice mode (no full collect, no global broadcast) and still
    match the oracle exactly — the crawl only ever touches the few
    namespace hosts, so every slice stays namespace-bounded."""
    web = demo_web()
    n_bulk = 100_001 - len(web.robots)
    for i in range(n_bulk):
        # restricting bodies on purpose: the allow-all filter must not be
        # what keeps the table small
        web.robots[f"bulk{i}.example.org"] = (
            f"User-agent: *\nDisallow: /x{i % 7}/\n"
        )
    cfg = CrawlConfig(scrape_parallelism=3, max_retries=0, max_rounds=200)
    assert cfg.robots_broadcast_hosts < len(web.robots)
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "bulk100k")
    assert eng.robots is None and eng._robots_bc is None
    assert_match(eng, oracle_res)

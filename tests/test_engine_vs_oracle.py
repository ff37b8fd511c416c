"""Engine-vs-oracle equivalence — the north_rule correctness gate:
per-host crawl order, URL-seen set (with attempt counts), and indexed-URL
set must match the reference-semantics simulator exactly, plus the span
invariant on fetched docs."""

import collections

import pytest

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.fixtures import demo_web, synth_web, write_web
from spider_spark.oracle import crawl as oracle_crawl


def engine_run(spark, web, cfg, tmp_path, tag):
    input_dir = write_web(web, str(tmp_path / f"web_{tag}"))
    eng = CrawlEngine(spark, input_dir, str(tmp_path / f"work_{tag}"), cfg)
    summary = eng.run()
    return eng, summary


def engine_order(eng):
    rows = eng.order_df().collect()
    order = collections.defaultdict(list)
    for r in sorted(rows, key=lambda x: (x["host"], x["round"], x["rn"])):
        order[r["host"]].append(r["url"])
    return dict(order)


def engine_seen(eng):
    rows = eng.seen_df().collect()
    seen = collections.Counter()
    for r in rows:
        seen[r["url"]] += 1
    return dict(seen)


def engine_urls(eng):
    return {r["url"]: r["source_id"] for r in eng.urls_df().collect()}


def assert_match(eng, oracle_res, namespace_sources=None):
    assert engine_order(eng) == {
        h: o for h, o in oracle_res.order.items() if o
    }, "per-host crawl order mismatch"
    assert engine_seen(eng) == oracle_res.seen, "seen-set mismatch"
    assert engine_urls(eng) == {
        u: sid for u, (sid, _r) in oracle_res.urls.items()
    }, "indexed urls mismatch"


@pytest.mark.parametrize("budget,max_retries", [(3, 1), (100, 0), (1, 2)])
def test_demo_web_matches_oracle(spark, tmp_path, budget, max_retries):
    web = demo_web()
    cfg = CrawlConfig(
        scrape_parallelism=budget, max_retries=max_retries, max_rounds=200
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, summary = engine_run(
        spark, web, cfg, tmp_path, f"demo_{budget}_{max_retries}"
    )
    assert_match(eng, oracle_res)
    assert summary.rounds == oracle_res.rounds


def test_synth_web_matches_oracle(spark, tmp_path):
    web = synth_web(n_hosts=3, pages_per_host=40, links_per_page=5, seed=7)
    cfg = CrawlConfig(scrape_parallelism=10, max_retries=1, max_rounds=200)
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "synth")
    assert_match(eng, oracle_res)


def test_span_invariant(spark, tmp_path):
    """Every fetched doc's span sequence (kind, text, media_ref,
    offset-order) equals the fixture exactly (input_hint invariant)."""
    web = demo_web()
    cfg = CrawlConfig(scrape_parallelism=100, max_retries=0)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "spans")
    for row in eng.fetched_df().collect():
        fix = web.documents[row["doc_id"]]
        got = [
            (s["kind"], s["text"], s["media_ref"])
            for s in sorted(row["spans"], key=lambda s: s["offset"])
        ]
        want = [
            (s["kind"], s["text"], s["media_ref"])
            for s in sorted(fix.spans, key=lambda s: s["offset"])
        ]
        assert got == want, f"span mismatch for {row['doc_id']}"


def test_bloom_path_equivalent(spark, tmp_path):
    """R4 with bloom sidecar pre-filter must be result-identical."""
    web = synth_web(n_hosts=2, pages_per_host=30, links_per_page=4, seed=9)
    cfg_plain = CrawlConfig(scrape_parallelism=8, max_retries=0)
    cfg_bloom = CrawlConfig(
        scrape_parallelism=8, max_retries=0, bloom_enabled=True, num_seen_buckets=8
    )
    eng_a, _ = engine_run(spark, web, cfg_plain, tmp_path, "nobloom")
    eng_b, _ = engine_run(spark, web, cfg_bloom, tmp_path, "bloom")
    assert engine_seen(eng_a) == engine_seen(eng_b)
    assert engine_order(eng_a) == engine_order(eng_b)
    assert engine_urls(eng_a) == engine_urls(eng_b)


def test_salted_topk_equivalent(spark, tmp_path):
    """Hot-host salted two-phase politeness must be order-identical."""
    web = synth_web(n_hosts=2, pages_per_host=30, links_per_page=4, seed=11)
    eng_a, _ = engine_run(
        spark, web, CrawlConfig(scrape_parallelism=5), tmp_path, "nosalt"
    )
    eng_b, _ = engine_run(
        spark,
        web,
        CrawlConfig(scrape_parallelism=5, hot_host_salt=4),
        tmp_path,
        "salt",
    )
    assert engine_order(eng_a) == engine_order(eng_b)


def test_resume_mid_crawl(spark, tmp_path):
    """Checkpoint/resume: stop after 2 rounds, resume, final state equals
    an uninterrupted run (north_rule: exact resume mid-crawl)."""
    web = synth_web(n_hosts=2, pages_per_host=30, links_per_page=4, seed=13)
    cfg = CrawlConfig(scrape_parallelism=6, max_retries=1)
    input_dir = write_web(web, str(tmp_path / "web_resume"))

    full = CrawlEngine(spark, input_dir, str(tmp_path / "work_full"), cfg)
    full.run()

    part = CrawlEngine(spark, input_dir, str(tmp_path / "work_part"), cfg)
    part.initialize()
    part.run_round()
    part.run_round()
    resumed = CrawlEngine.resume(
        spark, input_dir, str(tmp_path / "work_part"), cfg
    )
    assert resumed.round == 2
    resumed.run()

    assert engine_seen(full) == engine_seen(resumed)
    assert engine_order(full) == engine_order(resumed)
    assert engine_urls(full) == engine_urls(resumed)


def test_resume_rejects_rebucketed_seen_filter(spark, tmp_path):
    """A resumed run whose cfg changes num_seen_buckets must refuse the
    old seen-filter checkpoint: probes would re-bucket into buckets with
    no filter row, come back definitely-unseen, and bypass the exact
    anti-join (R4 false negatives). The n_buckets column in the sidecar
    schema pins the partitioning geometry."""
    web = synth_web(n_hosts=2, pages_per_host=30, links_per_page=4, seed=9)
    input_dir = write_web(web, str(tmp_path / "web_rebucket"))
    cfg = CrawlConfig(
        scrape_parallelism=8, max_retries=0, bloom_enabled=True,
        num_seen_buckets=8,
    )
    eng = CrawlEngine(spark, input_dir, str(tmp_path / "work_rb"), cfg)
    eng.initialize()
    eng.run_round()
    eng.run_round()

    rebucketed = CrawlConfig(
        scrape_parallelism=8, max_retries=0, bloom_enabled=True,
        num_seen_buckets=16,
    )
    resumed = CrawlEngine.resume(
        spark, input_dir, str(tmp_path / "work_rb"), rebucketed
    )
    with pytest.raises(Exception, match="geometry"):
        resumed.run()


@pytest.mark.parametrize("webf", ["demo", "synth_sm"])
def test_spark_seeding_equals_legacy(spark, tmp_path, webf):
    """R21: the distributed sitemap-expansion seeding writes the exact
    round-0 frontier (url, host, seq, sm) and seen tables that the
    driver-side seed_state path writes."""
    web = (
        demo_web()
        if webf == "demo"
        else synth_web(n_hosts=3, pages_per_host=40, sitemap_frac=0.3, seed=9)
    )
    input_dir = write_web(web, str(tmp_path / f"web_{webf}"))
    legacy = CrawlEngine(
        spark, input_dir, str(tmp_path / "w_legacy"),
        CrawlConfig(spark_seeding=False),
    )
    legacy.initialize()
    sparkside = CrawlEngine(
        spark, input_dir, str(tmp_path / "w_spark"),
        CrawlConfig(spark_seeding=True),
    )
    sparkside.initialize()

    def rows(eng, kind):
        return sorted(
            tuple(r) for r in eng.spark.read.parquet(
                eng._p(kind, 0)
            ).collect()
        )

    assert rows(legacy, "frontier") == rows(sparkside, "frontier")
    assert rows(legacy, "seen") == rows(sparkside, "seen")
    assert legacy.namespace == sparkside.namespace


def test_priority_frontier_matches_oracle(spark, tmp_path):
    """priority_mode='short_url': shorter URLs first per host, FIFO ties —
    engine window order (length(url), seq) ≡ oracle stable sort by len."""
    web = synth_web(n_hosts=3, pages_per_host=40, links_per_page=5, seed=11)
    cfg = CrawlConfig(
        scrape_parallelism=4,
        max_retries=1,
        max_rounds=200,
        priority_mode="short_url",
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "prio")
    assert_match(eng, oracle_res)
    # sanity: priority actually changed the order vs FIFO somewhere
    fifo_res = oracle_crawl(web, CrawlConfig(
        scrape_parallelism=4, max_retries=1, max_rounds=200))
    assert oracle_res.order != fifo_res.order


def test_indegree_priority_matches_oracle(spark, tmp_path):
    """priority_mode='indegree': most-referenced frontier URLs first, FIFO
    ties — engine schedule-time join vs its inlinks sidecar ≡ oracle
    stable sort by -accumulated reference count, with identical count
    timing (references tallied pre-seen-check, visible from the NEXT
    round's scheduling on both sides)."""
    web = synth_web(n_hosts=3, pages_per_host=40, links_per_page=6, seed=17)
    cfg = CrawlConfig(
        scrape_parallelism=3,
        max_retries=1,
        max_rounds=200,
        priority_mode="indegree",
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "indeg")
    assert_match(eng, oracle_res)
    # sanity: backlink priority actually reordered fetches vs FIFO
    fifo_res = oracle_crawl(
        web,
        CrawlConfig(scrape_parallelism=3, max_retries=1, max_rounds=200),
    )
    assert oracle_res.order != fifo_res.order
    # and the crawl is still complete: same url set either way
    assert set(oracle_res.urls) == set(fifo_res.urls)


def test_error_backoff_matches_oracle(spark, tmp_path):
    """error_backoff: a host's round-r budget is halved per round-(r-1)
    fetch error, floored at 1, recovering the full budget after one clean
    round — engine broadcast join vs its herr sidecar ≡ oracle per-host
    error tally with the same one-round memory."""
    web = synth_web(
        n_hosts=3,
        pages_per_host=40,
        links_per_page=6,
        error_frac=0.15,
        seed=23,
    )
    cfg = CrawlConfig(
        scrape_parallelism=4,
        max_retries=2,
        max_rounds=200,
        error_backoff=True,
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "backoff")
    assert_match(eng, oracle_res)
    # sanity: the backoff actually shrank some round's schedule vs plain
    plain = oracle_crawl(
        web,
        CrawlConfig(scrape_parallelism=4, max_retries=2, max_rounds=200),
    )
    assert [m["scheduled"] for m in oracle_res.metrics] != [
        m["scheduled"] for m in plain.metrics
    ]
    # and the crawl still completes: same url set either way
    assert set(oracle_res.urls) == set(plain.urls)


def test_combined_modes_match_oracle(spark, tmp_path):
    """All opt-in scheduling extensions at once — indegree priority ×
    Crawl-delay budgets × error backoff × bloom seen-prefilter — the
    interaction pin: backoff shifts compose with delay budgets, the
    inlinks tap sits before the bloom/anti-join split, and exactness
    survives the sidecar prefilter."""
    web = synth_web(
        n_hosts=3,
        pages_per_host=35,
        links_per_page=6,
        error_frac=0.12,
        seed=31,
    )
    hosts = [f"host{i}.example.com" for i in range(3)]
    web.robots[hosts[1]] = (
        (web.robots.get(hosts[1]) or "")
        + "\nUser-agent: *\nCrawl-delay: 0.5\n"
    )
    cfg = CrawlConfig(
        scrape_parallelism=4,
        max_retries=2,
        max_rounds=300,
        priority_mode="indegree",
        respect_crawl_delay=True,
        error_backoff=True,
        bloom_enabled=True,
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "combo")
    assert_match(eng, oracle_res)


def test_crawl_delay_budgets_match_oracle(spark, tmp_path):
    """respect_crawl_delay: per-host budget from robots Crawl-delay —
    engine broadcast budget join ≡ oracle per-host slice."""
    web = synth_web(n_hosts=3, pages_per_host=30, links_per_page=4, seed=13)
    # inject restricting delays for two of the hosts
    hosts = [f"host{i}.example.com" for i in range(3)]
    web.robots[hosts[0]] = (web.robots.get(hosts[0]) or "") + "\nUser-agent: *\nCrawl-delay: 1\n"
    web.robots[hosts[1]] = (web.robots.get(hosts[1]) or "") + "\nUser-agent: *\nCrawl-delay: 0.5\n"
    cfg = CrawlConfig(
        scrape_parallelism=6,
        max_retries=1,
        max_rounds=300,
        respect_crawl_delay=True,
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "delay")
    assert_match(eng, oracle_res)
    # the delayed hosts really were throttled: per-round batch <= budget
    rows = eng.order_df().collect()
    per = {}
    for r in rows:
        per.setdefault((r["host"], r["round"]), 0)
        per[(r["host"], r["round"])] += 1
    assert max(n for (h, _), n in per.items() if h == hosts[0]) == 1
    assert max(n for (h, _), n in per.items() if h == hosts[1]) == 2
    assert any(n > 2 for (h, _), n in per.items() if h == hosts[2])


def test_crawl_delay_skip_matches_oracle(spark, tmp_path):
    """crawl_delay_skip: a host whose Crawl-delay spans k > 1 ticks is
    scheduled only every k-th round (period = ceil(delay/tick)); the
    deferred queue keeps FIFO seq across skipped rounds. Engine
    schedule-time period column ≡ oracle host_budget early-zero."""
    web = synth_web(n_hosts=3, pages_per_host=30, links_per_page=4, seed=17)
    hosts = [f"host{i}.example.com" for i in range(3)]
    web.robots[hosts[0]] = (
        (web.robots.get(hosts[0]) or "") + "\nUser-agent: *\nCrawl-delay: 3\n"
    )
    web.robots[hosts[1]] = (
        (web.robots.get(hosts[1]) or "") + "\nUser-agent: *\nCrawl-delay: 0.5\n"
    )
    cfg = CrawlConfig(
        scrape_parallelism=5,
        max_retries=1,
        max_rounds=300,
        respect_crawl_delay=True,
        crawl_delay_skip=True,
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "delay_skip")
    assert_match(eng, oracle_res)
    # host0 (delay 3, period 3) fetched only on rounds ≡ 1 (mod 3), one
    # URL per active round; host1 (delay 0.5) fetched every round
    rows = eng.order_df().collect()
    h0_rounds = sorted({r["round"] for r in rows if r["host"] == hosts[0]})
    assert h0_rounds, "host0 never scheduled"
    assert all((r - 1) % 3 == 0 for r in h0_rounds), h0_rounds
    per0 = {}
    for r in rows:
        if r["host"] == hosts[0]:
            per0[r["round"]] = per0.get(r["round"], 0) + 1
    assert max(per0.values()) == 1
    h1_rounds = {r["round"] for r in rows if r["host"] == hosts[1]}
    assert len(h1_rounds) > 1


def test_crawl_delay_skip_requires_respect(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        oracle_crawl(demo_web(), CrawlConfig(crawl_delay_skip=True))


def test_pagerank_priority_matches_oracle(spark, tmp_path):
    """priority_mode='pagerank': highest integer PageRank over the
    accumulated intra-namespace link graph first, FIFO ties — engine
    ledges sidecar + analysis/graph.pagerank_int join ≡ oracle's
    bit-identical pure-Python integer-PageRank replica, with the same
    edge-tap timing (pre-seen-check, ranks visible from the NEXT round)."""
    web = synth_web(n_hosts=3, pages_per_host=40, links_per_page=6, seed=23)
    cfg = CrawlConfig(
        scrape_parallelism=3,
        max_retries=1,
        max_rounds=200,
        priority_mode="pagerank",
        pagerank_iters=3,
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "pr")
    assert_match(eng, oracle_res)
    # sanity: pagerank ordering actually reordered fetches vs FIFO...
    fifo_res = oracle_crawl(
        web,
        CrawlConfig(scrape_parallelism=3, max_retries=1, max_rounds=200),
    )
    assert oracle_res.order != fifo_res.order
    # ...and vs plain indegree (iterated rank != 1-hop count)
    indeg_res = oracle_crawl(
        web,
        CrawlConfig(
            scrape_parallelism=3,
            max_retries=1,
            max_rounds=200,
            priority_mode="indegree",
        ),
    )
    assert oracle_res.order != indeg_res.order
    # crawl completeness is mode-independent
    assert set(oracle_res.urls) == set(fifo_res.urls)


def test_combined_modes_pagerank_match_oracle(spark, tmp_path):
    """pagerank priority × Crawl-delay budgets × error backoff × cuckoo
    seen-prefilter: the edge tap sits before the sidecar/anti-join
    split, integer ranks compose with shifted per-host budgets, and
    exactness survives the cuckoo prefilter."""
    web = synth_web(
        n_hosts=3,
        pages_per_host=35,
        links_per_page=6,
        error_frac=0.12,
        seed=37,
    )
    hosts = [f"host{i}.example.com" for i in range(3)]
    web.robots[hosts[2]] = (
        (web.robots.get(hosts[2]) or "")
        + "\nUser-agent: *\nCrawl-delay: 0.5\n"
    )
    cfg = CrawlConfig(
        scrape_parallelism=4,
        max_retries=2,
        max_rounds=300,
        priority_mode="pagerank",
        pagerank_iters=2,
        respect_crawl_delay=True,
        error_backoff=True,
        bloom_enabled=True,
        seen_filter="cuckoo",
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "combo_pr")
    assert_match(eng, oracle_res)


def test_seeding_depth_cap_parity(spark, tmp_path):
    """A sitemap-index chain deeper than cfg.sitemap_max_depth truncates
    at the SAME level on both seeding paths (the Spark BFS and the
    driver-side seed_state BFS) — pages hanging below the cap are dropped
    identically, not just by one path."""
    from spider_spark.fixtures import Web, page_doc

    host = "deep.org"
    depth_chain = 8
    sitemaps = {}
    for i in range(depth_chain):
        sm = f"https://{host}/sm{i}.xml"
        nxt = f"https://{host}/sm{i + 1}.xml"
        leaf = f"https://{host}/leaf{i}.xml"
        sitemaps[sm] = ("index", [nxt, leaf])
        sitemaps[leaf] = ("urlset", [f"https://{host}/p{i}.html"])
    sitemaps[f"https://{host}/sm{depth_chain}.xml"] = (
        "urlset", [f"https://{host}/bottom.html"]
    )
    sitemaps[f"https://{host}/sitemap.xml"] = (
        "index", [f"https://{host}/sm0.xml"]
    )
    docs = {f"https://{host}/": page_doc([])}
    web = Web(docs, [("s1", "deep", f"https://{host}/")], {}, sitemaps)
    input_dir = write_web(web, str(tmp_path / "web_deep"))

    cap = 4
    legacy = CrawlEngine(
        spark, input_dir, str(tmp_path / "wd_legacy"),
        CrawlConfig(spark_seeding=False, sitemap_max_depth=cap),
    )
    legacy.initialize()
    sparkside = CrawlEngine(
        spark, input_dir, str(tmp_path / "wd_spark"),
        CrawlConfig(spark_seeding=True, sitemap_max_depth=cap),
    )
    sparkside.initialize()

    def urls(eng):
        return sorted(
            r["url"] for r in eng.spark.read.parquet(
                eng._p("frontier", 0)
            ).collect()
        )

    got_l, got_s = urls(legacy), urls(sparkside)
    assert got_l == got_s
    # sitemap.xml (depth 0) -> sm0 (1) -> {sm1, leaf0} (2) -> ... each
    # leaf_i sits at index depth i+2, so the cap keeps p0..p(cap-2) only
    keep = {f"https://{host}/p{i}.html" for i in range(cap - 1)}
    assert keep < set(got_l)
    assert not any(u.startswith(f"https://{host}/p{cap - 1}") for u in got_l)
    assert f"https://{host}/bottom.html" not in got_l


def test_yield_budget_matches_oracle(spark, tmp_path):
    """yield_budget_total: each round splits a GLOBAL fetch budget across
    hosts by largest-remainder allocation over the previous round's
    new-URLs-per-fetch yield (engine hyld sidecar + broadcast budgets ≡
    oracle per-host stats + yield_budgets_py — the same integer math,
    shared verbatim)."""
    web = synth_web(
        n_hosts=3,
        pages_per_host=40,
        links_per_page=6,
        error_frac=0.1,
        seed=47,
    )
    cfg = CrawlConfig(
        scrape_parallelism=6,
        max_retries=1,
        max_rounds=200,
        yield_budget_total=12,
        yield_budget_min=1,
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "yield")
    assert_match(eng, oracle_res)
    # the allocation actually changed scheduling vs the uniform budget
    plain = oracle_crawl(
        web,
        CrawlConfig(scrape_parallelism=6, max_retries=1, max_rounds=200),
    )
    assert [m["scheduled"] for m in oracle_res.metrics] != [
        m["scheduled"] for m in plain.metrics
    ]
    # and converges to the same discovered url set
    assert set(oracle_res.urls) == set(plain.urls)


def test_yield_budget_composes_with_backoff(spark, tmp_path):
    """yield allocation composes with error backoff (the halving applies
    to the allocated share, as in the engine's budget_col chain)."""
    web = synth_web(
        n_hosts=3,
        pages_per_host=30,
        links_per_page=5,
        error_frac=0.15,
        seed=53,
    )
    cfg = CrawlConfig(
        scrape_parallelism=5,
        max_retries=2,
        max_rounds=200,
        yield_budget_total=10,
        error_backoff=True,
    )
    oracle_res = oracle_crawl(web, cfg)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "yield_backoff")
    assert_match(eng, oracle_res)

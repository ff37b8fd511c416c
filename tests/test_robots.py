"""robots.txt parser/matcher tests (REP semantics mirroring the
crawler-commons behavior the reference relies on:
RobotsTxtInspector.scala:18-32, HostCrawler.scala:77-91,135,146)."""

import pandas as pd

from spider_spark.functions.robots import (
    ALLOW_ALL,
    RobotsRules,
    RobotsTable,
    parse_robots,
)

UA = "SpiderSparkBot"


def test_fail_open_on_missing():
    r = parse_robots(None, UA)
    assert r.is_allowed("https://h.de/anything")
    t = RobotsTable.from_rows([], UA)
    assert t.is_allowed("unknown.host", "https://unknown.host/x")


def test_basic_disallow():
    r = parse_robots("User-agent: *\nDisallow: /private/\n", UA)
    assert not r.is_allowed("https://h.de/private/x.html")
    assert r.is_allowed("https://h.de/public/x.html")
    assert r.is_allowed("https://h.de/")


def test_longest_match_allow_wins():
    body = "User-agent: *\nDisallow: /a/\nAllow: /a/b/\n"
    r = parse_robots(body, UA)
    assert not r.is_allowed("https://h.de/a/x")
    assert r.is_allowed("https://h.de/a/b/x")


def test_allow_wins_tie():
    body = "User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"
    r = parse_robots(body, UA)
    assert r.is_allowed("https://h.de/dir/x")


def test_wildcard_and_anchor():
    body = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*\n"
    r = parse_robots(body, UA)
    assert not r.is_allowed("https://h.de/docs/file.pdf")
    assert r.is_allowed("https://h.de/docs/file.pdf?x=1")  # $ anchored
    assert not r.is_allowed("https://h.de/tmpfiles/a")
    assert r.is_allowed("https://h.de/other")


def test_specific_group_overrides_wildcard():
    body = (
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: spidersparkbot\nDisallow: /private/\n"
    )
    r = parse_robots(body, UA)
    assert r.is_allowed("https://h.de/open")
    assert not r.is_allowed("https://h.de/private/x")


def test_empty_disallow_allows_all():
    r = parse_robots("User-agent: *\nDisallow:\n", UA)
    assert r.is_allowed("https://h.de/any")
    assert r.mode == "allow_all"


def test_sitemaps_and_crawl_delay():
    body = (
        "Sitemap: https://h.de/sm1.xml\n"
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x/\n"
        "Sitemap: https://h.de/sm2.xml\n"
    )
    r = parse_robots(body, UA)
    assert r.sitemaps == ["https://h.de/sm1.xml", "https://h.de/sm2.xml"]
    assert r.crawl_delay == 2.0


def test_query_part_is_matched():
    r = parse_robots("User-agent: *\nDisallow: /*?show=image\n", UA)
    assert not r.is_allowed("https://h.de/page?show=image")
    assert r.is_allowed("https://h.de/page")


def test_vectorized_matches_scalar():
    body = "User-agent: *\nDisallow: /a/\nAllow: /a/b/\nDisallow: /*.gif$\n"
    r = parse_robots(body, UA)
    urls = pd.Series(
        [
            "https://h.de/a/x",
            "https://h.de/a/b/x",
            "https://h.de/img.gif",
            "https://h.de/ok",
            "https://h.de/",
        ]
    )
    vec = r.allowed_series(urls)
    assert list(vec) == [r.is_allowed(u) for u in urls]


def test_table_batch_groups_by_host():
    t = RobotsTable.from_rows(
        [
            ("a.de", "User-agent: *\nDisallow: /secret/\n"),
            ("b.de", "User-agent: *\nDisallow: /\n"),
        ],
        UA,
    )
    urls = pd.Series(
        [
            "https://a.de/secret/x",
            "https://a.de/open",
            "https://b.de/anything",
            "https://c.de/whatever",
        ]
    )
    hosts = pd.Series(["a.de", "a.de", "b.de", "c.de"])
    assert list(t.allowed_batch(urls, hosts)) == [False, True, False, True]


def test_rules_of_fetching_host_apply_to_foreign_links():
    # ContentFilter.scala:75 — the page's host rules gate links whatever
    # host they point at (path-only matching)
    t = RobotsTable.from_rows([("a.de", "User-agent: *\nDisallow: /x/\n")], UA)
    urls = pd.Series(["https://b.de/x/page.html"])
    hosts = pd.Series(["a.de"])  # rules host = fetching page's host
    assert list(t.allowed_batch(urls, hosts)) == [False]


def test_allow_all_constant():
    assert ALLOW_ALL.is_allowed("https://any/url")


def test_matched_empty_specific_group_shadows_wildcard():
    # REP: a MATCHED specific group governs entirely, even when its only
    # directive is an empty Disallow (= allow everything) — it must not
    # fall back to the * group's rules or crawl-delay
    body = (
        "User-agent: spiderbot\nDisallow:\n\n"
        "User-agent: *\nCrawl-delay: 9\nDisallow: /\n"
    )
    r = parse_robots(body, "spiderbot")
    assert r.mode == "allow_all" and not r.rules
    assert r.crawl_delay is None
    assert r.is_allowed("https://h/x") is True
    # and a specific group carrying ONLY a crawl-delay keeps that delay
    # (not the wildcard's) while inheriting no wildcard rules
    body2 = (
        "User-agent: spiderbot\nCrawl-delay: 2\n\n"
        "User-agent: *\nCrawl-delay: 9\nDisallow: /\n"
    )
    r2 = parse_robots(body2, "spiderbot")
    assert r2.crawl_delay == 2.0 and r2.is_allowed("https://h/x") is True
    # unmatched UA still uses the wildcard group
    r3 = parse_robots(body, "otherbot")
    assert r3.is_allowed("https://h/x") is False


def test_allowed_series_disallow_all_matches_scalar():
    import pandas as pd

    r = RobotsRules(mode="disallow_all")
    urls = pd.Series(["https://h/a", "https://h/b"])
    got = list(r.allowed_series(urls))
    assert got == [False, False]
    assert got == [r.is_allowed(u) for u in urls]

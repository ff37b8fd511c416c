"""RSS/Atom feed-entry extraction (sources/feeds.py): dialect
detection, per-field contract (CDATA titles, RSS text links vs Atom
href links, NULL for missing), document order, non-feed gating, and
the closed-form fixture equality the driver row replays."""

from __future__ import annotations

from spider_spark.sources import feeds as FD

RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
<title>chan</title>
<item><title>A</title><link>http://x.example/a</link>
<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate><guid>g1</guid></item>
<item><title><![CDATA[B & stuff]]></title><link>http://x.example/b</link></item>
<item><link>http://x.example/c</link></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
<title>feed</title>
<entry><title>E1</title><link href="http://y.example/1"/>
<updated>2024-02-02T00:00:00Z</updated><id>urn:1</id></entry>
<entry><title>E2</title><link rel="alternate" href="http://y.example/2"/></entry>
</feed>"""


def _rows(spark, pairs):
    df = spark.createDataFrame(pairs, "ref string, xml string")
    return FD.feed_entries(df).collect()


def test_rss_fields_and_order(spark):
    rows = sorted(_rows(spark, [("r", RSS)]), key=lambda r: r.entry_idx)
    assert [r.kind for r in rows] == ["rss"] * 3
    assert [r.title for r in rows] == ["A", "B & stuff", None]
    assert [r.link for r in rows] == [
        "http://x.example/a", "http://x.example/b", "http://x.example/c",
    ]
    assert rows[0].published == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert rows[0].guid == "g1"
    assert rows[1].published is None and rows[1].guid is None


def test_atom_fields(spark):
    rows = sorted(_rows(spark, [("a", ATOM)]), key=lambda r: r.entry_idx)
    assert [r.kind for r in rows] == ["atom"] * 2
    assert [r.title for r in rows] == ["E1", "E2"]
    assert [r.link for r in rows] == [
        "http://y.example/1", "http://y.example/2",
    ]
    assert rows[0].published == "2024-02-02T00:00:00Z"
    assert rows[0].guid == "urn:1"


def test_non_feed_and_hostile_yield_zero_rows(spark):
    assert (
        _rows(
            spark,
            [("h", "<html><body>nope</body></html>"), ("n", None),
             ("e", ""), ("g", "\x00garbage")],
        )
        == []
    )


def test_fixture_matches_closed_form(spark):
    ids = spark.range(0, 40).selectExpr("id as event_id")
    rows = FD.feed_entries(FD.synth_feeds(ids)).collect()
    got = {(r.ref, r.entry_idx): r for r in rows}
    total = 0
    for i in range(40):
        n = 1 + i % 4
        kind = "atom" if i % 2 == 0 else "rss"
        for k in range(n):
            r = got[(f"feed://{i}", k)]
            assert r.kind == kind, (i, k)
            assert r.title == f"Post {i}.{k}"
            path = "a" if kind == "atom" else "r"
            assert r.link == f"http://f{i % 7}.example.org/{path}/{i}/{k}"
            assert r.guid == f"urn:e:{i}:{k}"
            d = 1 + (i + k) % 28
            exp_date = (
                f"2024-01-{d:02d}T00:00:00Z"
                if kind == "atom"
                else f"Mon, {d:02d} Jan 2024 00:00:00 GMT"
            )
            assert r.published == exp_date
            total += 1
    assert len(rows) == total


def test_discover_feed_links_known_values(spark):
    pages = [
        (1, '<link rel="alternate" type="application/rss+xml" '
            'href="http://x/rss">'),
        (2, '<link rel="alternate" href="http://x/atom" '
            'type="application/atom+xml">'),  # href-first
        (3, '<link rel="stylesheet" href="http://x/css">'),  # not a feed
        (4, None),
        (5, '<LINK TYPE="application/rss+xml" HREF="http://x/RSS">'
            '<link type="application/atom+xml" href="http://x/a">'),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = sorted(
        (r.doc_id, r.feed_kind, r.feed_url)
        for r in FD.discover_feed_links(df).collect()
    )
    assert got == [
        (1, "rss", "http://x/rss"),
        (2, "atom", "http://x/atom"),
        (5, "atom", "http://x/a"),
        (5, "rss", "http://x/RSS"),
    ]


def test_discover_fixture_matches_closed_form(spark):
    import pyspark.sql.functions as F

    ids = spark.range(0, 60).selectExpr("id as doc_id")
    d = ids.withColumn("html", F.expr(FD.feedlink_page_expr()))
    got = sorted(
        (r.doc_id, r.feed_kind, r.feed_url)
        for r in FD.discover_feed_links(d).collect()
    )
    exp = []
    for i in range(60):
        if i % 3 == 0:
            exp.append((i, "rss", f"http://f{i % 7}.example.org/rss/{i}"))
        if i % 3 == 1 or i % 15 == 0:
            exp.append(
                (i, "atom", f"http://f{i % 7}.example.org/atom/{i}")
            )
    assert got == sorted(exp)
    # the both-feeds branch fired
    assert (0, "rss", "http://f0.example.org/rss/0") in got
    assert (0, "atom", "http://f0.example.org/atom/0") in got

"""RSS / Atom feed-entry extraction — the discovery channel next to
sitemaps.

The reference's discovery surface is sitemap expansion
(SiteMapParser.scala feeding the Supervisor's seed set); real crawls
also poll feeds, which announce NEW urls far cheaper than a recrawl.
This module is the feed-side counterpart of operators/expand.py: feed
XML in, one row per entry out, ready to union into the frontier.

Scope (pinned in tests/test_feeds.py): RSS 2.0 ``<item>`` and Atom
``<entry>`` blocks; per-entry title / link / published / guid. RSS
links are element text (``<link>url</link>``), Atom links are the
``href`` attribute (``<link href="url"/>``) — the two dialects' one
structural disagreement. Field regexes are first-match, RE2-safe, and
the whole pipeline is JVM expressions (``regexp_extract_all`` for the
blocks, ``posexplode`` to one row per entry, ``regexp_extract`` per
field) — no UDF, no Python, one scan + one generator, no shuffle.

CDATA titles are unwrapped; a missing field is NULL (never ''). A
payload that is neither RSS nor Atom produces zero rows (kind gate),
never a task failure.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ITEM = r"(?i)<item[\s>][\s\S]*?</item>"
_ENTRY = r"(?i)<entry[\s>][\s\S]*?</entry>"
_TITLE = r"(?i)<title[^>]*>(?:<!\[CDATA\[)?([\s\S]*?)(?:\]\]>)?</title>"
_RSS_LINK = r"(?i)<link[^>]*>([^<]+)</link>"
_ATOM_LINK = r'(?i)<link[^>]*href="([^"]*)"'
_RSS_DATE = r"(?i)<pubDate[^>]*>([^<]+)</pubDate>"
_ATOM_DATE = r"(?i)<updated[^>]*>([^<]+)</updated>"
_RSS_GUID = r"(?i)<guid[^>]*>([^<]+)</guid>"
_ATOM_ID = r"(?i)<id[^>]*>([^<]+)</id>"


def _sq(pattern: str) -> str:
    """Spark SQL single-quoted string literal of a regex (double the
    backslashes the literal parser would otherwise eat)."""
    return "'" + pattern.replace("\\", "\\\\").replace("'", "\\'") + "'"


def feed_entries(
    df: DataFrame, xml_col: str = "xml", ref_col: str = "ref"
) -> DataFrame:
    """(ref, xml) → (ref, kind, entry_idx, title, link, published,
    guid) — one row per RSS item / Atom entry, in document order."""
    x = f"coalesce({xml_col}, '')"
    kind = (
        f"CASE WHEN {x} rlike '(?i)<feed[\\\\s>]' THEN 'atom' "
        f"WHEN {x} rlike '(?i)<(rss|channel)[\\\\s>]' THEN 'rss' END"
    )
    blocks = (
        f"CASE kind WHEN 'atom' THEN "
        f"regexp_extract_all({x}, {_sq(_ENTRY)}, 0) "
        f"WHEN 'rss' THEN regexp_extract_all({x}, {_sq(_ITEM)}, 0) "
        f"ELSE array() END"
    )

    def first(pattern: str) -> str:
        return f"nullif(regexp_extract(block, {_sq(pattern)}, 1), '')"

    def dialect(rss_pat: str, atom_pat: str) -> str:
        return (
            f"CASE kind WHEN 'rss' THEN {first(rss_pat)} "
            f"ELSE {first(atom_pat)} END"
        )

    return (
        df.select(
            F.col(ref_col).alias("ref"), F.expr(kind).alias("kind"),
            F.col(xml_col).alias(xml_col),
        )
        .where(F.col("kind").isNotNull())
        .select(
            "ref",
            "kind",
            F.posexplode(F.expr(blocks)).alias("entry_idx", "block"),
        )
        .select(
            "ref",
            "kind",
            F.col("entry_idx").cast("int").alias("entry_idx"),
            F.expr(f"trim({first(_TITLE)})").alias("title"),
            F.expr(dialect(_RSS_LINK, _ATOM_LINK)).alias("link"),
            F.expr(dialect(_RSS_DATE, _ATOM_DATE)).alias("published"),
            F.expr(dialect(_RSS_GUID, _ATOM_ID)).alias("guid"),
        )
    )


_RSS_ALT = (
    r'(?i)<link[^>]*type="application/rss\+xml"[^>]*href="([^"]*)"'
)
_RSS_ALT_REV = (
    r'(?i)<link[^>]*href="([^"]*)"[^>]*type="application/rss\+xml"'
)
_ATOM_ALT = (
    r'(?i)<link[^>]*type="application/atom\+xml"[^>]*href="([^"]*)"'
)
_ATOM_ALT_REV = (
    r'(?i)<link[^>]*href="([^"]*)"[^>]*type="application/atom\+xml"'
)


def discover_feed_links(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, feed_kind, feed_url) — the ``<link rel=alternate>``
    feed advertisements in a page's head, the hook that connects the
    page scan to the feed frontier (a crawl that sees a page once can
    poll its feed forever after). Attribute order handled like
    metadata.py's meta patterns (type-first and href-first, unioned);
    all JVM expressions, one scan + one generator per dialect."""
    x = f"coalesce({html_col}, '')"

    def found(p1: str, p2: str, kind: str) -> DataFrame:
        arr = (
            f"array_union(regexp_extract_all({x}, {_sq(p1)}, 1), "
            f"regexp_extract_all({x}, {_sq(p2)}, 1))"
        )
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.lit(kind).alias("feed_kind"),
            F.explode(F.expr(arr)).alias("feed_url"),
        )

    return found(_RSS_ALT, _RSS_ALT_REV, "rss").unionByName(
        found(_ATOM_ALT, _ATOM_ALT_REV, "atom")
    )


def feedlink_page_expr(id_col: str = "doc_id") -> str:
    """Spark-SQL synth page: ids %3==0 advertise an RSS feed
    (type-first), %3==1 an Atom feed (href-FIRST — the reversed
    attribute order), %3==2 none; ids %15==0 advertise BOTH."""
    return f"""
    concat(
      '<html><head><title>t</title>',
      CASE WHEN {id_col} % 3 = 0 THEN concat(
        '<link rel="alternate" type="application/rss+xml" href="',
        'http://f', cast({id_col} % 7 as string),
        '.example.org/rss/', cast({id_col} as string), '">')
      ELSE '' END,
      CASE WHEN {id_col} % 3 = 1 OR {id_col} % 15 = 0 THEN concat(
        '<link rel="alternate" href="http://f',
        cast({id_col} % 7 as string), '.example.org/atom/',
        cast({id_col} as string), '" type="application/atom+xml">')
      ELSE '' END,
      '</head><body><p>page</p></body></html>')
    """


def feedlink_page_duckdb(id_col: str = "doc_id") -> str:
    """DuckDB replica of :func:`feedlink_page_expr` (unused by the
    driver oracle, which rebuilds the OUTPUT closed-form; kept for
    parity tests that want the page itself)."""
    return f"""
      '<html><head><title>t</title>'
      || CASE WHEN {id_col} % 3 = 0 THEN
           '<link rel="alternate" type="application/rss+xml" href="'
           || 'http://f' || CAST({id_col} % 7 AS VARCHAR)
           || '.example.org/rss/' || CAST({id_col} AS VARCHAR) || '">'
         ELSE '' END
      || CASE WHEN {id_col} % 3 = 1 OR {id_col} % 15 = 0 THEN
           '<link rel="alternate" href="http://f'
           || CAST({id_col} % 7 AS VARCHAR) || '.example.org/atom/'
           || CAST({id_col} AS VARCHAR)
           || '" type="application/atom+xml">'
         ELSE '' END
      || '</head><body><p>page</p></body></html>'
    """


# -------------------------------------------------------------- fixture


def feed_fix_xml(i: int) -> str:
    """Closed-form feed for id ``i``: Atom when i%2==0 else RSS 2.0,
    with ``1 + i%4`` entries; entry k's fields are all closed-form in
    (i, k). Every third feed's first title is CDATA-wrapped."""
    n = 1 + i % 4
    cd = i % 3 == 0

    def title(k: int) -> str:
        t = f"Post {i}.{k}"
        return f"<![CDATA[{t}]]>" if (cd and k == 0) else t

    if i % 2 == 0:
        entries = "".join(
            f"<entry><title>{title(k)}</title>"
            f'<link href="http://f{i % 7}.example.org/a/{i}/{k}"/>'
            f"<updated>2024-01-{1 + (i + k) % 28:02d}T00:00:00Z</updated>"
            f"<id>urn:e:{i}:{k}</id></entry>"
            for k in range(n)
        )
        return (
            '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
            f"<title>Feed {i}</title>{entries}</feed>"
        )
    entries = "".join(
        f"<item><title>{title(k)}</title>"
        f"<link>http://f{i % 7}.example.org/r/{i}/{k}</link>"
        f"<pubDate>Mon, {1 + (i + k) % 28:02d} Jan 2024 00:00:00 GMT</pubDate>"
        f"<guid>urn:e:{i}:{k}</guid></item>"
        for k in range(n)
    )
    return (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        f"<title>Feed {i}</title>{entries}</channel></rss>"
    )


def synth_feeds(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """(id) → (ref='feed://id', xml): the closed-form fixture feeds,
    built as ONE JVM-free pandas batch map (fixture only — the operator
    itself is pure JVM)."""

    @F.pandas_udf("string")
    def xml(ids: pd.Series) -> pd.Series:
        return ids.astype("int64").map(lambda i: feed_fix_xml(int(i)))

    ids = df.select(F.col(id_col).cast("long").alias("fid")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    return ids.select(
        F.concat(F.lit("feed://"), F.col("fid").cast("string")).alias(
            "ref"
        ),
        xml("fid").alias("xml"),
    )

"""Golden tests ported from ContentFilterSpec.scala:33-199 against the
regex-scanner extraction pipeline (spans-based HTML)."""

import pandas as pd

from spider_spark.functions.extract import (
    canonical_link_from_head,
    extract_abs_links,
    extract_batch,
    extract_canonical_links_from_body,
    extract_hreflang,
    extract_raw,
    spans_to_html,
)

BASE = "https://example.com/cat0/index.html"

FULL_HTML = """<html>
<head>
    <!-- hreflang links -->
    <link rel="alternate" hreflang="en" href="https://example.com/page_en.html">
    <link rel="alternate" hreflang="es" href="https://example.com/page_es.html">

    <!-- canonical link -->
    <link rel="canonical" href="https://example.com/cat0/index.html">

    <!-- irrelevant link -->
    <link rel="canonical" href="https://example.com/canonical1">
</head>
<body
    <!-- regular links (-> absolute) -->
    <a href="https://example.com/abs.html">absolute level link</a>
    <a href="same_level.html">same level link</a>

    <!-- canonical links -->
    <link rel="canonical" href="https://example.com/page1.html">
    <link rel="canonical" href="https://example.com/page2.html">
</body>
</html>"""


def test_extract_content_information_full_page():
    # ContentFilterSpec.scala:33-77
    res = extract_batch(pd.Series([FULL_HTML]), pd.Series([BASE]))
    assert res["canonical_url"].iloc[0] == "https://example.com/cat0/index.html"
    assert set(res["links"].iloc[0]) == {
        "https://example.com/cat0/same_level.html",
        "https://example.com/page_es.html",
        "https://example.com/page_en.html",
        "https://example.com/abs.html",
        "https://example.com/page2.html",
        "https://example.com/page1.html",
    }


def test_extract_abs_links():
    # ContentFilterSpec.scala:79-100 — document order, invalid link dropped
    html = """<html>
<head></head>
<body
    <a href="https://example.com/abs.html">absolute level link</a>
    <a href="same_level.html">same level link</a>
    <a href="../upper_level.html">upper level link</a>
    <a href="sub/sub_page.html">sub level link</a>
    <a href="|| invalid link ||">invalid link</a>
</body>
</html>"""
    assert extract_abs_links(html, BASE) == [
        "https://example.com/abs.html",
        "https://example.com/cat0/same_level.html",
        "https://example.com/upper_level.html",
        "https://example.com/cat0/sub/sub_page.html",
    ]


def test_hreflang_links():
    # ContentFilterSpec.scala:102-119 — parsed WITHOUT base url
    html = """<html>
<head>
    <link rel="alternate" hreflang="en" href="https://example.com/page_en.html">
    <link rel="alternate" hreflang="es" href="https://example.com/page_es.html">
    <link rel="canonical" href="https://example.com/page.html">
</head>
<body
</body>
</html>"""
    assert extract_hreflang(html, "") == [
        "https://example.com/page_en.html",
        "https://example.com/page_es.html",
    ]


def test_canonical_from_head():
    # ContentFilterSpec.scala:121-138
    html = """<html>
<head>
    <link rel="canonical" href="https://example.com/page.html">
</head>
<body
    <link rel="canonical" href="https://example.com/page1.html">
</body>
</html>"""
    assert canonical_link_from_head(html, "") == "https://example.com/page.html"


def test_canonical_from_head_none_when_no_canonical():
    # ContentFilterSpec.scala:140-166
    assert (
        canonical_link_from_head(
            """<html>
<head>
    <link rel="stylesheet" href="https://example.com/page.css">
</head>
</html>""",
            "",
        )
        is None
    )
    assert canonical_link_from_head("<html>\n<head>\n</head>\n</html>", "") is None


def test_canonical_links_from_body():
    # ContentFilterSpec.scala:168-187
    html = """<html>
<head>
    <link rel="canonical" href="https://example.com/page.html">
</head>
<body
    <link rel="canonical" href="https://example.com/page1.html">
    <link rel="canonical" href="https://example.com/page2.html">
</body>
</html>"""
    assert extract_canonical_links_from_body(html, "") == [
        "https://example.com/page1.html",
        "https://example.com/page2.html",
    ]


def test_canonical_links_from_body_empty():
    # ContentFilterSpec.scala:189-199
    html = """<html>
<head>
 <link rel="canonical" href="https://example.com/page1.html">
</head>
</html>"""
    assert extract_canonical_links_from_body(html, "") == []


def test_raw_extraction_excludes_head_canonical():
    # ContentFilter.scala:66 — canonical excluded from out-links pre-clean
    canon, links = extract_raw(FULL_HTML, BASE)
    assert canon == "https://example.com/cat0/index.html"
    assert "https://example.com/cat0/index.html" not in links
    # head canonical1 not .html, not <a>, not hreflang -> fully dropped
    assert "https://example.com/canonical1" not in links


def test_extract_batch_robots_filter():
    htmls = pd.Series([FULL_HTML])
    bases = pd.Series([BASE])

    def deny_pages(urls: pd.Series, hosts: pd.Series) -> pd.Series:
        return ~urls.str.contains("/page", regex=False)

    res = extract_batch(htmls, bases, robots_allowed=deny_pages)
    assert set(res["links"].iloc[0]) == {
        "https://example.com/cat0/same_level.html",
        "https://example.com/abs.html",
    }
    # canonical not matched by the deny rule -> kept
    assert res["canonical_url"].iloc[0] == "https://example.com/cat0/index.html"

    def deny_index(urls: pd.Series, hosts: pd.Series) -> pd.Series:
        return ~urls.str.contains("index", regex=False)

    res2 = extract_batch(htmls, bases, robots_allowed=deny_index)
    # canonical itself robots-denied -> None (ContentFilter.scala:54-56,75)
    v = res2["canonical_url"].iloc[0]
    assert v is None or pd.isna(v)


def test_extract_batch_cleans_links():
    html = '<a href="https://h.de/x.html?nn=1&keep=2#frag">x</a>'
    res = extract_batch(pd.Series([html]), pd.Series(["https://h.de/"]))
    assert res["links"].iloc[0] == ["https://h.de/x.html?keep=2"]


def test_spans_to_html_order_and_media_skip():
    spans = [
        {"kind": "media", "text": None, "media_ref": "img://1", "offset": 1},
        {"kind": "text", "text": "<a href='https://h.de/b.html'>b</a>", "media_ref": None, "offset": 2},
        {"kind": "text", "text": "<html><head></head>", "media_ref": None, "offset": 0},
    ]
    html = spans_to_html(spans)
    assert html.startswith("<html><head></head>")
    assert "b.html" in html


def test_extract_anchors_goldens():
    from spider_spark.functions.extract import extract_anchors

    html = (
        '<!-- <a href="https://h.de/c">comment</a> -->'
        '<a href="https://h.de/a">one <i>two</i>\n three</a>'
        "<a href='/rel'><img src='x.png'/></a>"
        '<a href="http://localhost/nodots">invalid</a>'
        '<a name="no-href">text</a>'
        '<A HREF="https://h.de/up">CASE</A>'
        '<a href="https://h.de/open">unclosed'
    )
    got = extract_anchors(html, "https://h.de/base/")
    assert got == [
        ("https://h.de/a", "one two three"),
        ("https://h.de/rel", ""),       # image-only anchor -> empty text
        ("https://h.de/up", "CASE"),
    ]
    assert extract_anchors("", "https://h.de/") == []
    assert extract_anchors("<a href='https://h.de/x'>t</a>", "") == [
        ("https://h.de/x", "t")
    ]

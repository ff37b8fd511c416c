"""Boilerplate removal (analysis/boilerplate.py): known-value block
classification, context-pass semantics, hostile inputs, and full
Spark-vs-DuckDB replica equality over a generated HTML corpus."""

from __future__ import annotations

import duckdb

from spider_spark.analysis.boilerplate import (
    html_blocks,
    html_blocks_sql,
    main_content,
    main_content_sql,
)

PAGE = (
    '<head><title>T</title></head><body>'
    '<nav><a href="/x">xx</a> <a href="/y">yy</a></nav>'
    "<h2>two words</h2>"
    "<p>alpha beta gamma the and of to is the of</p>"
    "<p>tail bit</p>"
    '<footer><a href="/z">z</a></footer></body>'
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, html string")


def test_html_blocks_known_value(spark):
    got = {
        (r["block_id"], r["text"], r["n_chars"], r["link_chars"],
         r["n_words"], r["stop_hits"], r["cls"], r["final_cls"])
        for r in html_blocks(_docs(spark, [("d1", PAGE)])).collect()
    }
    assert got == {
        (2, "T", 1, 0, 1, 0, "short", "bad"),  # heading amid chrome drops
        (6, "xx yy", 5, 4, 2, 0, "bad", "bad"),  # link farm
        (8, "two words", 9, 0, 2, 0, "short", "good"),  # heading: next good
        (10, "alpha beta gamma the and of to is the of",
         40, 0, 10, 7, "good", "good"),
        (12, "tail bit", 8, 0, 2, 0, "short", "good"),  # prev good
        (14, "z", 1, 1, 1, 0, "bad", "bad"),
    }


def test_main_content_known_value(spark):
    rows = main_content(_docs(spark, [("d1", PAGE), ("d2", PAGE)])).collect()
    assert {
        (r["doc_id"], r["content"], r["n_blocks_kept"]) for r in rows
    } == {
        (d, "two words\nalpha beta gamma the and of to is the of\ntail bit", 3)
        for d in ("d1", "d2")
    }


def test_hostile_inputs(spark):
    rows = [
        ("empty", ""),
        ("null", None),
        ("notags", "plain the and of to is words here"),
        ("onlychrome", '<nav><a href="/a">b</a></nav>'),
        ("upper", "<P>THE AND OF TO IS loud</P>"),
        ("multiline", '<p><a\n href="/m">line\nbroken anchor</a></p>'),
        ("attr", '<p class="x" data-y=\'1\'>the and of to is body</p>'),
        ("selfclose", "text before<br/>the and of to is after"),
    ]
    out = html_blocks(_docs(spark, rows))
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert "empty" not in by_doc and "null" not in by_doc
    # no tags at all -> one block, classified normally
    (nt,) = by_doc["notags"]
    assert (nt["cls"], nt["stop_hits"], nt["n_words"]) == ("good", 5, 8)
    (oc,) = by_doc["onlychrome"]
    assert oc["cls"] == "bad" and oc["link_chars"] == oc["n_chars"] == 1
    (up,) = by_doc["upper"]  # (?i) split + lowercased stop matching
    assert (up["cls"], up["stop_hits"]) == ("good", 5)
    (ml,) = by_doc["multiline"]  # (?s) anchor spans a newline
    assert ml["link_chars"] == ml["n_chars"] == len("line broken anchor")
    (at,) = by_doc["attr"]
    assert (at["cls"], at["link_chars"]) == ("good", 0)
    sc = by_doc["selfclose"]  # <br/> is a block boundary
    assert [r["text"] for r in sorted(sc, key=lambda r: r["block_id"])] == [
        "text before",
        "the and of to is after",
    ]


def test_context_pass_isolated_short_drops(spark):
    # a short block whose non-short neighbours are both bad stays bad
    page = (
        '<nav><a href="/a">aa</a></nav><h2>lost heading</h2>'
        '<footer><a href="/b">bb</a></footer>'
    )
    rows = html_blocks(_docs(spark, [("d", page)])).collect()
    cls = {r["text"]: r["final_cls"] for r in rows}
    assert cls["lost heading"] == "bad"
    assert main_content(_docs(spark, [("d", page)])).count() == 0


def _gen_corpus(n=40):
    rows = []
    for i in range(n):
        words = " ".join(f"w{(i * 7 + j) % 29}" for j in range(i % 13))
        stops = " ".join(("the", "and", "of", "to", "is")[: i % 6])
        page = (
            f"<head><title>t{i}</title></head><body>"
            f'<nav><a href="/l{i}">m{i}</a> <a href="/k">menu</a></nav>'
            f"<h{1 + i % 6}>{words[:9]}</h{1 + i % 6}>"
            f"<p>{words} {stops} {words[:5]}</p>"
            f"<li>item {i % 3}</li>"
            f'<footer>© site <a href="/tos">terms</a></footer></body>'
        )
        rows.append((f"d{i}", page if i % 11 else None))
    return rows


def test_main_content_single_exchange(spark):
    # the scale contract: context-pass windows AND the reassembly
    # groupBy all reuse ONE doc_id hash partitioning
    import re

    plan = (
        main_content(_docs(spark, [("d", PAGE)]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_blocks_and_content_match_duckdb(spark):
    rows = _gen_corpus()
    sdf = _docs(spark, rows)
    con = duckdb.connect()
    con.register("docs", sdf.toPandas())
    got = {tuple(r) for r in html_blocks(sdf).collect()}
    want = {tuple(r) for r in con.sql(html_blocks_sql("docs", "html")).fetchall()}
    assert got == want and got  # non-degenerate
    got_c = {tuple(r) for r in main_content(sdf).collect()}
    want_c = {
        tuple(r) for r in con.sql(main_content_sql("docs", "html")).fetchall()
    }
    assert got_c == want_c


def test_script_style_bodies_dropped(spark):
    # stopword-rich JSON-LD / CSS / noscript bodies must never classify
    # 'good'; an UNCLOSED script degrades to ordinary classification of
    # its body instead of eating the rest of the document
    pages = [
        ("s1", '<p>alpha beta gamma the and of to is the of</p>'
               '<script type="application/ld+json">{"d": "the best of '
               'the city and where to stay is the thing"}</script>'),
        ("s2", '<style>.x { color: red; } /* the and of to is */</style>'
               '<p>alpha beta gamma the and of to is the of</p>'),
        ("s3", '<noscript>the and of to is enable scripts</noscript>'
               '<p>alpha beta gamma the and of to is the of</p>'),
        ("s4", '<SCRIPT>var x = "the and of to is";</SCRIPT>'
               '<p>alpha beta gamma the and of to is the of</p>'),
        ("s5", '<script>var broken = "the and of to is'
               '<p>alpha beta gamma the and of to is the of</p>'),
    ]
    out = main_content(_docs(spark, pages)).collect()
    got = {r["doc_id"]: r["content"] for r in out}
    para = "alpha beta gamma the and of to is the of"
    for d in ("s1", "s2", "s3", "s4"):
        assert got[d] == para, d
    # s5: no closing tag -> nothing matched; body classifies normally,
    # so the js prefix text survives inside the first block
    assert "broken" in got["s5"]
    # and the DuckDB replica agrees on every case
    con = duckdb.connect()
    con.register("docs", _docs(spark, pages).toPandas())
    want = {
        r[0]: r[1]
        for r in con.sql(main_content_sql("docs", "html")).fetchall()
    }
    assert got == want


def test_apostrophe_stopwords_escape(spark):
    # contraction stoplists (don't, l') must not break either dialect
    stops = ("don't", "l'", "the", "and", "of", "to", "is")
    pages = [("a1", "<p>alpha don't beta l' gamma the and of to is</p>")]
    sdf = _docs(spark, pages)
    rows = html_blocks(sdf, stops=stops).collect()
    assert rows and rows[0]["stop_hits"] == 7
    con = duckdb.connect()
    con.register("docs", sdf.toPandas())
    want = con.sql(html_blocks_sql("docs", "html", stops=stops)).fetchall()
    assert {tuple(r) for r in rows} == {tuple(r) for r in want}

"""Page-metadata extraction (analysis/metadata.py): known values,
contract edges (missing fields, quoting, case), and full Spark≡DuckDB
replica equality over the synth fixture."""

from __future__ import annotations

import duckdb

from spider_spark.analysis import metadata as MD

PAGES = [
    (
        1,
        '<html lang="en-US"><head><title> Hello  World </title>'
        '<meta name="description" content="a nice page">'
        '<meta property="og:title" content="Hello OG"></head>'
        "<body><h1>Big <b>News</b>\n Today</h1></body></html>",
    ),
    (2, "<title>only title</title>"),
    (3, "<TITLE>upper CASE</TITLE><H1>hi</H1>"),  # case-insensitive tags
    (4, "<meta name='description' content='single quotes'>"),  # -> NULL
    (5, None),
    (6, ""),
    (7, "<h1>  </h1><title></title>"),  # whitespace-only -> NULL
    (
        8,
        "<title>first</title><title>second</title><h1>one</h1><h1>two</h1>",
    ),
    (  # content-first attribute order (common in real HTML)
        9,
        '<meta content="rev desc" name="description">'
        '<meta content="rev og" property="og:title">',
    ),
]


def _df(spark, rows=PAGES):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_page_metadata_known_values(spark):
    got = {r["doc_id"]: r.asDict() for r in MD.page_metadata(_df(spark)).collect()}
    assert got[1] == {
        "doc_id": 1,
        "title": "Hello World",
        "description": "a nice page",
        "og_title": "Hello OG",
        "html_lang": "en-US",
        "h1": "Big News Today",
    }
    assert got[2]["title"] == "only title"
    assert got[2]["description"] is None and got[2]["h1"] is None
    assert got[3]["title"] == "upper CASE" and got[3]["h1"] == "hi"
    # single-quoted attributes are outside the pinned contract -> NULL
    assert got[4]["description"] is None
    for i in (5, 6):
        assert all(v is None for k, v in got[i].items() if k != "doc_id")
    assert got[7]["title"] is None and got[7]["h1"] is None
    # first occurrence wins
    assert got[8]["title"] == "first" and got[8]["h1"] == "one"
    # either attribute order matches
    assert got[9]["description"] == "rev desc"
    assert got[9]["og_title"] == "rev og"


def test_page_metadata_duckdb_equality(spark):
    got = {tuple(r) for r in MD.page_metadata(_df(spark)).collect()}
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE p (doc_id BIGINT, html VARCHAR)"
    )
    con.executemany("INSERT INTO p VALUES (?, ?)", PAGES)
    want = {
        tuple(r)
        for r in con.sql(MD.page_metadata_sql("p", "html")).fetchall()
    }
    assert got == want


def test_page_metadata_synth_fixture_equality(spark):
    # corpus-variety fixture: deterministic pages from word-soup text,
    # metadata presence varying by doc id (the driver-row configuration)
    from pyspark.sql import functions as F

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta w{i}")
        for i in range(30)
    ] + [(97, ""), (98, None), (99, "123 456")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        tuple(r)
        for r in MD.page_metadata(
            df.withColumn("html", F.expr(MD.metadata_page_expr()))
        ).collect()
    }
    con = duckdb.connect()
    con.sql("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = {
        tuple(r)
        for r in con.sql(
            MD.page_metadata_sql("d", MD.metadata_page_duckdb())
        ).fetchall()
    }
    assert got == want
    # branch coverage: og only on id%3==0, description only on even ids
    by_id = {t[0]: t for t in got}
    assert by_id[6][3] is not None and by_id[7][3] is None
    assert by_id[4][2] is not None and by_id[5][2] is None


# -------------------------------------------------------------- JSON-LD


JSONLD_PAGES = [
    (
        1,
        '<html><head><script type="application/ld+json">'
        '{"@context":"https://schema.org","@type":"Article",'
        '"name":"My Story","datePublished":"2024-03-01"}'
        "</script></head><body>x</body></html>",
    ),
    # first block wins
    (
        2,
        '<script type="application/ld+json">{"@type":"A","name":"one"}'
        '</script><script type="application/ld+json">'
        '{"@type":"B","name":"two"}</script>',
    ),
    (3, '<script type="application/ld+json">not json</script>'),  # NULLs
    (4, "<p>no structured data</p>"),
    (5, None),
    (  # multi-line block, partial fields
        6,
        '<script type="application/ld+json">\n{"@type": "Product",\n'
        ' "name": "Widget"}\n</script>',
    ),
]


def test_jsonld_known_values(spark):
    df = _df(spark, JSONLD_PAGES)
    got = {r.doc_id: r for r in MD.jsonld_extract(df).collect()}
    assert got[1].ld_type == "Article"
    assert got[1].ld_name == "My Story"
    assert got[1].ld_date == "2024-03-01"
    assert (got[2].ld_type, got[2].ld_name) == ("A", "one")
    assert got[3].ld_type is None and got[3].ld_name is None
    assert got[4].ld_type is None
    assert got[5].ld_type is None
    assert (got[6].ld_type, got[6].ld_name, got[6].ld_date) == (
        "Product", "Widget", None,
    )


def test_jsonld_duckdb_equality(spark):
    df = _df(spark, JSONLD_PAGES)
    a = (
        MD.jsonld_extract(df)
        .orderBy("doc_id")
        .toPandas()
        .fillna("_")
    )
    con = duckdb.connect()
    con.register("pages", df.toPandas())
    b = (
        con.sql(
            MD.jsonld_extract_sql("pages", "html") + " ORDER BY doc_id"
        )
        .df()
        .fillna("_")
    )
    assert a.values.tolist() == b.values.tolist()


def test_jsonld_synth_fixture_equality(spark):
    ids = spark.range(0, 50).selectExpr("id as doc_id", "'w' as text")
    import pyspark.sql.functions as F

    d = ids.withColumn("html", F.expr(MD.jsonld_page_expr()))
    a = MD.jsonld_extract(d).orderBy("doc_id").toPandas().fillna("_")
    con = duckdb.connect()
    con.register("docs", ids.toPandas())
    b = (
        con.sql(
            MD.jsonld_extract_sql("docs", MD.jsonld_page_duckdb())
            + " ORDER BY doc_id"
        )
        .df()
        .fillna("_")
    )
    assert a.values.tolist() == b.values.tolist()
    # every branch fired: absent (7s), malformed (11s), article, product
    byid = {int(r[0]): r[1] for r in a.values.tolist()}
    assert byid[7] == "_" and byid[11] == "_"
    assert byid[2] == "Article" and byid[1] == "Product"

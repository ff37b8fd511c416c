"""Unit coverage for operators/classify — the R11/R12/R15 expressions the
engine's round loop and the driver-contract rows share (reference
SiteScraper.scala:52-88)."""

from pyspark.sql import functions as F

from spider_spark.operators.classify import response_class, xrobots_noindex


def test_xrobots_noindex_branches(spark):
    rows = [
        (1, {"X-Robots-Tag": "noindex"}),          # plain hit
        (2, {"x-robots-tag": "NONE, nofollow"}),   # lower key, NONE value
        (3, {"X-ROBOTS-TAG": "all"}),              # header present, benign
        (4, {"Server": "x"}),                      # header absent
        (5, {}),                                   # empty map
        (6, {"X-Robots-Tag": "NOINDEX"}),          # upper value
        (7, {"x-robots-TAG": "index,follow"}),     # mixed key case, benign
    ]
    df = spark.createDataFrame(rows, "doc_id int, headers map<string,string>")
    got = {
        r["doc_id"]: r["noidx"]
        for r in df.select(
            "doc_id", xrobots_noindex("headers").alias("noidx")
        ).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: False, 6: True,
                   7: False}


def test_xrobots_substring_semantics(spark):
    # rlike is a SEARCH: any value containing noindex/none trips the flag,
    # matching the reference's contains-check on the directive list
    df = spark.createDataFrame(
        [(1, {"x-robots-tag": "foo, noindex"}), (2, {"x-robots-tag": "nofollow"})],
        "doc_id int, headers map<string,string>",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", xrobots_noindex("headers").alias("n")
        ).collect()
    }
    assert got == {1: True, 2: False}


def test_response_class_decision_tree(spark):
    rows = [
        # (id, status, content_type, noindex, join_doc, expected)
        (1, -1, "text/html", False, 1, "err"),       # transport error
        (2, 200, "text/html", False, None, "err"),   # no doc matched
        (3, 404, "text/html", False, 3, "bad"),
        (4, 301, "text/plain", False, 4, "bad"),
        (5, 200, "text/html", True, 5, "noidx"),     # R11 wins over R12
        (6, 200, "text/html; charset=utf-8", False, 6, "html"),
        (7, 200, "application/pdf", False, 7, "plain"),
        (8, 200, "text/plain", None, 8, "plain"),    # null noindex = False
        (9, 404, "text/html", True, 9, "bad"),       # bad beats noidx
    ]
    df = spark.createDataFrame(
        [(a, b, c, d, e) for a, b, c, d, e, _x in rows],
        "id int, status int, content_type string, noindex boolean, jd int",
    )
    got = {
        r["id"]: r["cls"]
        for r in df.select(
            "id",
            response_class(
                F.col("status"), F.col("content_type"),
                F.col("noindex"), F.col("jd"),
            ).alias("cls"),
        ).collect()
    }
    assert got == {i: exp for i, _s, _c, _n, _j, exp in rows}

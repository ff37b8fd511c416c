"""Corpus search (analysis/search.py): posting lists, conjunctive match,
integer tf·idf top-k — known-value fixtures plus DuckDB equality."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from spider_spark.analysis import oracles as O
from spider_spark.analysis import search as SR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def soup():
    words = ["w%d" % i for i in range(30)]
    rows = []
    for i in range(40):
        toks = [words[(i * 7 + j * 3) % 30] for j in range(5 + i % 9)]
        rows.append((i, " ".join(toks)))
    return rows


def _duck(rows):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return con


def test_inverted_postings_known(spark):
    docs = _docs(spark, [("d1", "x X y"), ("d2", "x z"), ("d3", "y z z"), ("d4", None)])
    got = {r["token"]: r for r in SR.inverted_postings(docs).collect()}
    assert got["x"]["doc_ids"] == ["d1", "d2"] and got["x"]["n_docs"] == 2
    assert got["y"]["doc_ids"] == ["d1", "d3"]
    assert got["z"]["doc_ids"] == ["d2", "d3"]  # per-doc dedupe: z once for d3
    assert len(got) == 3
    # df gates
    capped = {r["token"] for r in SR.inverted_postings(docs, min_df=3).collect()}
    assert capped == set()


def test_search_conjunctive_known(spark):
    docs = _docs(spark, [("d1", "x x y"), ("d2", "x z"), ("d3", "y z z")])
    assert {r["doc_id"] for r in SR.search_conjunctive(docs, ["X", "y"]).collect()} == {"d1"}
    assert {r["doc_id"] for r in SR.search_conjunctive(docs, ["z"]).collect()} == {"d2", "d3"}
    assert SR.search_conjunctive(docs, ["x", "y", "z"]).count() == 0


def test_search_topk_known(spark):
    docs = _docs(
        spark,
        [("d1", "x x y"), ("d2", "y q"), ("d3", "q"), ("d4", "q"), ("d5", "q")],
    )
    # N=5: df_x=1 -> w=floor(log2 5)=2; df_y=2 -> 5 div 2=2 -> w=1
    top = SR.search_topk(docs, ["x", "y"], n_docs=5, k=10).collect()
    assert [(r["doc_id"], r["n_terms_hit"], r["score"]) for r in top] == [
        ("d1", 2, 5),  # 2*2 + 1*1
        ("d2", 1, 1),
    ]


def test_search_matches_duckdb(spark, soup):
    docs = spark.createDataFrame(soup, "doc_id long, text string")
    con = _duck(soup)

    got = (
        SR.inverted_postings(docs, min_df=2, max_df=30)
        .toPandas().sort_values("token").reset_index(drop=True)
    )
    want = (
        con.execute(O.inverted_postings_sql("documents", min_df=2, max_df=30))
        .df().sort_values("token").reset_index(drop=True)
    )
    assert len(want) > 0
    got["doc_ids"] = got["doc_ids"].apply(list)
    want["doc_ids"] = want["doc_ids"].apply(list)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    terms = ["w0", "w3", "w6"]
    got_c = sorted(
        r["doc_id"] for r in SR.search_conjunctive(docs, terms).collect()
    )
    want_c = sorted(
        r[0] for r in con.execute(
            O.search_conjunctive_sql("documents", terms)
        ).fetchall()
    )
    assert got_c == want_c and len(got_c) > 0

    n = docs.count()
    got_t = SR.search_topk(docs, terms, n_docs=n, k=7).toPandas()
    want_t = con.execute(O.search_topk_sql("documents", terms, k=7)).df()
    pd.testing.assert_frame_equal(
        got_t.reset_index(drop=True), want_t.reset_index(drop=True),
        check_dtype=False,
    )


def test_search_bm25_known_values(spark):
    # corpus of 4 docs; query term 'q'. avgdl_m = 1000*(2+4+8+2)//4 = 4000
    docs = _docs(
        spark,
        [
            ("short", "q a"),             # dl=2, tf=1
            ("mid", "q q a b"),           # dl=4, tf=2
            ("long", "q a b c d e f g"),  # dl=8, tf=1
            ("none", "a b"),
        ],
    )
    # n_docs=100 keeps w(q) positive (at n_docs=4, floor(log2(4//3)) = 0)
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score_milli"])
        for r in SR.search_bm25(docs, ["q"], n_docs=100, k=10).collect()
    }
    # w = floor(log2(100//3)) = floor(log2(33)) = 5
    # short: norm=1000-750+750*2*1000//4000=625; denom=1000+1200*625//1000=1750
    #        part=(1*2200*1000)//1750=1257 ; score=5*1257=6285
    # mid:   norm=1000-750+750*4*1000//4000=1000; denom=2000+1200=3200
    #        part=(2*2200*1000)//3200=1375 ; score=6875
    # long:  norm=1000-750+750*8*1000//4000=1750; denom=1000+2100=3100
    #        part=2200000//3100=709 ; score=3545
    assert got == {
        "short": (1, 6285),
        "mid": (1, 6875),
        "long": (1, 3545),
    }


def test_search_bm25_length_norm_and_saturation(spark):
    # same tf, shorter doc wins (length normalization); 10x tf does not
    # give 10x score (saturation)
    rows = [("s", "q " + "f " * 4), ("l", "q " + "f " * 40),
            ("rep", "q " * 10 + "f " * 31)]
    docs = _docs(spark, rows)
    got = {
        r["doc_id"]: r["score_milli"]
        for r in SR.search_bm25(docs, ["q"], n_docs=64, k=10).collect()
    }
    assert got["s"] > got["l"]
    assert got["rep"] < 10 * got["l"]
    assert all(v > 0 for v in got.values())


def test_search_bm25_matches_duckdb(spark, soup):
    terms = ["w0", "w7", "w21"]
    got = (
        SR.search_bm25(
            _docs_long(spark, soup), terms, n_docs=len(soup), k=15
        )
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        _duck(soup)
        .execute(O.search_bm25_sql("documents", terms, k=15))
        .df()
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _docs_long(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")

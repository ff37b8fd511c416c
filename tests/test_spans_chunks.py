"""Duplicate-substring spans (analysis/dedup.duplicate_gram_spans /
dup_span_stats), token-window chunking (analysis/packing.chunk_tokens),
and quantized ANN (analysis/similarity.ann_topk_quantized) — known-value
fixtures plus Spark-vs-DuckDB oracle equality."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.analysis import dedup as D
from spider_spark.analysis import oracles as O
from spider_spark.analysis import packing as PK
from spider_spark.analysis import similarity as S


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def soup():
    # deterministic word-soup corpus: doc i's tokens are the step-3
    # progression starting at 7i mod 30, so docs i and i+30 share full
    # token runs (cross-doc duplicated grams are guaranteed)
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


# ---------------------------------------------- duplicate-gram spans


def test_dup_spans_known_values(spark):
    docs = _docs(spark, [("d1", "a b c d e f"), ("d2", "x y a b c q")])
    got = {
        (r["doc_id"], r["span_start"]): r
        for r in D.duplicate_gram_spans(docs, k=2).collect()
    }
    # shared bigrams "a b" and "b c" -> one merged span per doc
    assert got[("d1", 0)]["span_end"] == 2
    assert got[("d1", 0)]["span_len"] == 3
    assert got[("d1", 0)]["n_grams"] == 2
    assert got[("d2", 2)]["span_end"] == 4
    assert len(got) == 2


def test_dup_spans_island_split(spark):
    # "a b" at positions 0 and 3 of d3: gap 3 > k=2 -> two separate spans
    docs = _docs(spark, [("d3", "a b z a b"), ("d4", "a b")])
    spans = D.duplicate_gram_spans(docs, k=2).collect()
    d3 = sorted(
        (r["span_start"], r["span_end"]) for r in spans if r["doc_id"] == "d3"
    )
    assert d3 == [(0, 1), (3, 4)]


def test_dup_spans_adjacent_merge(spark):
    # b1's duplicated grams sit at positions 0 ("p q") and 2 ("r p"):
    # 2 <= 0 + k -> intervals [0,1] and [2,3] merge into one span [0,3]
    docs = _docs(
        spark, [("b1", "p q r p x"), ("b2", "p q z z"), ("b3", "w r p w")]
    )
    spans = {r["doc_id"]: r for r in D.duplicate_gram_spans(docs, k=2).collect()}
    assert (spans["b1"]["span_start"], spans["b1"]["span_end"]) == (0, 3)
    assert spans["b1"]["span_len"] == 4 and spans["b1"]["n_grams"] == 2
    assert (spans["b2"]["span_start"], spans["b2"]["span_end"]) == (0, 1)
    assert (spans["b3"]["span_start"], spans["b3"]["span_end"]) == (1, 2)


def test_dup_span_stats(spark):
    docs = _docs(
        spark,
        [
            ("b1", "p q r p x"),
            ("b2", "p q z z"),
            ("b3", "w r p w"),
            ("b4", "all unique tokens here"),
            ("b5", None),
        ],
    )
    got = {r["doc_id"]: r for r in D.dup_span_stats(docs, k=2).collect()}
    assert got["b1"]["n_tokens"] == 5 and got["b1"]["dup_tokens"] == 4
    assert got["b1"]["dup_frac_milli"] == 800
    assert got["b4"]["dup_tokens"] == 0 and got["b4"]["dup_frac_milli"] == 0
    assert got["b5"]["n_tokens"] == 0 and got["b5"]["dup_frac_milli"] == 0
    assert len(got) == 5


def test_dup_spans_match_duckdb(spark, soup):
    docs = spark.createDataFrame(soup, "doc_id long, text string")
    got = (
        D.duplicate_gram_spans(docs, k=3)
        .toPandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    want = (
        _duck(soup)
        .execute(O.dup_spans_sql("documents", k=3))
        .df()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dup_span_stats_match_duckdb(spark, soup):
    docs = spark.createDataFrame(soup, "doc_id long, text string")
    got = (
        D.dup_span_stats(docs, k=3)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _duck(soup)
        .execute(O.dup_span_stats_sql("documents", k=3))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert int(want["dup_tokens"].sum()) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -------------------------------------------------------- chunking


def test_chunk_tokens_known_values(spark):
    docs = _docs(
        spark,
        [
            ("c1", "t0 t1 t2 t3 t4 t5 t6"),
            ("c2", "a b c"),
            ("c3", "a b c d"),
            ("c4", ""),
            ("c5", None),
        ],
    )
    by = {}
    for r in PK.chunk_tokens(docs, chunk=3, stride=2).collect():
        by.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by["c1"], key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in c1] == ["t0 t1 t2", "t2 t3 t4", "t4 t5 t6"]
    assert [r["n_chunk_tokens"] for r in c1] == [3, 3, 3]
    c3 = sorted(by["c3"], key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in c3] == ["a b c", "c d"]
    assert [r["n_chunk_tokens"] for r in c3] == [3, 2]
    assert len(by["c2"]) == 1 and by["c2"][0]["chunk_text"] == "a b c"
    assert "c4" not in by and "c5" not in by


def test_chunk_tokens_match_duckdb(spark, soup):
    docs = spark.createDataFrame(soup, "doc_id long, text string")
    got = (
        PK.chunk_tokens(docs, chunk=4, stride=3)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    want = (
        _duck(soup)
        .execute(O.chunk_tokens_sql("documents", chunk=4, stride=3))
        .df()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert (want["chunk_id"] > 0).any()  # multi-chunk docs exist
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------------- quantized ANN


@pytest.fixture(scope="module")
def qrows():
    rng = np.random.RandomState(11)
    base = rng.standard_normal((30, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    rows.append((100, [float(x) for x in base[0]]))  # exact copy of 0
    return rows


def test_with_quantized_known_values(spark):
    df = spark.createDataFrame(
        [(0, [0.5, -0.25, 1.0, 0.3, -0.3])], "vec_id long, embedding array<float>"
    )
    q = S.with_quantized(df, frac_bits=8).collect()[0]["qvec"]
    # float32(0.3)*256 = 76.80000305... -> floor 76 / -77
    assert q == [128, -64, 256, 76, -77]


def test_ann_topk_quantized_copy_ties(spark, qrows):
    df = spark.createDataFrame(qrows, "vec_id long, embedding array<float>")
    q = [float(x) for x in df.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    top = S.ann_topk_quantized(df, q, k=31).collect()
    scores = {r["vec_id"]: r["qscore"] for r in top}
    assert scores[0] == scores[100]  # identical vectors tie exactly
    order = [r["vec_id"] for r in top]
    assert order.index(0) + 1 == order.index(100)  # tie breaks by id


def test_ann_topk_quantized_matches_duckdb(spark, qrows):
    df = spark.createDataFrame(qrows, "vec_id long, embedding array<float>")
    q = [float(x) for x in df.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    got = S.ann_topk_quantized(df, q, k=10).toPandas().reset_index(drop=True)
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": [r[0] for r in qrows], "embedding": [r[1] for r in qrows]}
        ),
    )
    want = con.execute(O.ann_topk_quantized_sql(k=10)).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

"""BPE tokenizer-training primitives (analysis/tokenizer.py) and DSIR
importance scoring (analysis/importance.py), including Spark-vs-DuckDB
oracle equality on a deterministic corpus."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.analysis import oracles as O
from spider_spark.analysis.importance import (
    bucket_counts,
    doc_feature_buckets,
    importance_score,
)
from spider_spark.analysis.tokenizer import (
    bpe_pair_counts,
    bpe_train,
    bpe_train_py,
    word_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture()
def synth_corpus():
    # deterministic word-soup corpus: overlapping vocab, skewed word
    # frequencies, one empty and one null doc
    words = ["low", "lower", "newest", "widest", "new", "west", "w%d" % 7]
    rows = []
    for i in range(40):
        toks = [words[(i * 5 + j * 3) % len(words)] for j in range(4 + i % 7)]
        rows.append((i, " ".join(toks)))
    rows.append((100, ""))
    rows.append((101, None))
    return rows


def _duck(rows):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return con


# ------------------------------------------------------------- BPE


def test_word_counts(spark):
    docs = _docs(spark, [("a", "Low low lower"), ("b", "low  newest")])
    got = {r["w"]: r["c"] for r in word_counts(docs).collect()}
    assert got == {"low": 3, "lower": 1, "newest": 1}


def test_bpe_pair_counts_known_values(spark):
    # 'abab' x3 + 'ab' x2: pairs 'a b' = 3*2 + 2 = 8, 'b a' = 3
    docs = _docs(spark, [("d1", "abab abab ab"), ("d2", "abab ab")])
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(docs, k=10).collect()}
    assert got == {"a b": 8, "b a": 3}


def test_bpe_pair_counts_tie_break_total_order(spark):
    # 'xy' and 'xz' both occur twice: top-1 must be 'x y' (pair asc)
    docs = _docs(spark, [("d", "xy xy xz xz")])
    top = bpe_pair_counts(docs, k=1).collect()
    assert (top[0]["pair"], top[0]["cnt"]) == ("x y", 2)


def test_bpe_pair_counts_eow_marker(spark):
    docs = _docs(spark, [("d", "ab ab")])
    got = {
        r["pair"]: r["cnt"]
        for r in bpe_pair_counts(docs, k=10, eow="</w>").collect()
    }
    assert got == {"a b</w>": 2}


def test_bpe_pair_counts_matches_duckdb_oracle(spark, synth_corpus):
    docs = spark.createDataFrame(synth_corpus, "doc_id long, text string")
    got = (
        bpe_pair_counts(docs, k=25)
        .toPandas()
        .sort_values(["cnt", "pair"], ascending=[False, True])
        .reset_index(drop=True)
    )
    want = (
        _duck(synth_corpus)
        .execute(O.bpe_pair_counts_sql("documents", k=25))
        .df()
        .sort_values(["cnt", "pair"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bpe_train_matches_python_reference(spark, synth_corpus):
    texts = [t for _, t in synth_corpus]
    docs = spark.createDataFrame(synth_corpus, "doc_id long, text string")
    want = bpe_train_py(texts, n_merges=8)
    got = bpe_train(docs, n_merges=8)
    assert got == want
    # merges must actually compound (some merged symbol longer than 2)
    assert any(len(a + b) > 2 for a, b, _ in got)


def test_bpe_train_py_sennrich_example():
    # the worked example from Sennrich et al. 2016 (section 3.2 corpus):
    # low x5, lower x2, newest x6, widest x3 — first merges are
    # ('e','s'), ('es','t') [with </w>: ('est','</w>')], then 'lo'...
    texts = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (
        ["widest"] * 3
    )
    merges = bpe_train_py(texts, n_merges=4, eow="</w>")
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t</w>", 9)
    assert merges[2][2] >= merges[3][2] or merges[2][0] < merges[3][0]
    assert ("l", "o") in [(a, b) for a, b, _ in merges]


def test_bpe_train_early_stop_on_fully_merged(spark):
    # single 2-char word: after one merge no pairs remain
    docs = _docs(spark, [("d", "ab ab ab")])
    merges = bpe_train(docs, n_merges=5)
    assert merges == [("a", "b", 3)]


# ------------------------------------------------------- DSIR importance


def test_doc_feature_buckets_counts_occurrences(spark):
    # 'a a b': unigrams a,a,b + bigrams 'a a','a b' = 5 features
    docs = _docs(spark, [("d", "a a b"), ("e", ""), ("f", None)])
    feats = doc_feature_buckets(docs)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in feats.filter(F.col("bucket").isNotNull())
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_doc == {"d": 5}
    total = bucket_counts(feats).agg(F.sum("c")).collect()[0][0]
    assert total == 5


def test_importance_score_prefers_target_like_docs(spark):
    # target is pure 'alpha beta' language; the raw corpus is dominated
    # by repeated boilerplate (the realistic DSIR setting: frequent-in-
    # raw, absent-in-target features get the most negative scores)
    raw_rows = [("t%d" % i, "alpha beta alpha beta") for i in range(3)] + [
        ("j%d" % i, "click here subscribe now cookie policy")
        for i in range(12)
    ]
    docs = _docs(spark, raw_rows)
    target = _docs(spark, [("q", "alpha beta alpha beta alpha")])
    got = {r["doc_id"]: r for r in importance_score(docs, target).collect()}
    t_scores = [got["t%d" % i]["mean_weight_milli"] for i in range(3)]
    j_scores = [got["j%d" % i]["mean_weight_milli"] for i in range(12)]
    assert min(t_scores) > max(j_scores)


def test_importance_score_empty_doc_zero(spark):
    docs = _docs(spark, [("d", "some words here"), ("e", "")])
    target = _docs(spark, [("q", "some words")])
    got = {r["doc_id"]: r for r in importance_score(docs, target).collect()}
    assert got["e"]["n_feats"] == 0
    assert got["e"]["log2_weight"] == 0
    assert got["e"]["mean_weight_milli"] == 0


def test_importance_score_matches_duckdb_oracle(spark, synth_corpus):
    from spider_spark.functions.hashing import md5_u32_sql

    docs = spark.createDataFrame(synth_corpus, "doc_id long, text string")
    target = docs.filter(
        F.expr(md5_u32_sql("cast(doc_id as string)")) % 4 == 0
    )
    got = (
        importance_score(docs, target)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _duck(synth_corpus)
        .execute(
            O.importance_score_sql("documents", target_residue_mod=4)
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # the residue class must be non-trivial for the test to mean anything
    assert int((want["log2_weight"] != 0).sum()) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_importance_score_self_target_nonnegative(spark, synth_corpus):
    # target == raw corpus: c_tgt == c_raw and N_tgt == N_raw, so every
    # bucket score is exactly 0
    docs = spark.createDataFrame(synth_corpus, "doc_id long, text string")
    got = importance_score(docs, docs).collect()
    assert all(r["log2_weight"] == 0 for r in got)

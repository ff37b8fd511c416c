"""Decontamination + surprisal score (analysis/decontam.py), including
Spark-vs-DuckDB oracle equality on a deterministic corpus."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.analysis import oracles as O
from spider_spark.analysis.decontam import (
    bigram_counts,
    bigram_lm_score,
    decontaminate,
    gram_hash_sets,
    surprisal_score,
    unigram_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_gram_hash_sets_counts(spark):
    rows = [
        ("a", "one two three four"),   # 2 distinct 3-grams
        ("b", "x y"),                  # shorter than n -> none
        ("c", "w w w w"),              # repeated gram dedups to 1
        ("d", None),
    ]
    got = {r["doc_id"]: r for r in gram_hash_sets(_docs(spark, rows)).collect()}
    assert got["a"]["n_grams"] == 2
    assert got["b"]["n_grams"] == 0
    assert got["c"]["n_grams"] == 1
    assert got["d"]["n_grams"] == 0


def test_decontaminate_flags_overlap(spark):
    docs = _docs(
        spark,
        [
            ("train1", "alpha beta gamma delta"),      # shares 'alpha beta gamma'
            ("train2", "epsilon zeta eta theta"),      # clean
            ("train3", "beta gamma delta epsilon"),    # shares 'beta gamma delta'
            ("tiny", "only two"),                      # no grams
        ],
    )
    bench = _docs(spark, [("eval1", "alpha beta gamma delta extra")])
    got = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert got["train1"]["contaminated"] is True
    assert got["train1"]["n_hit_grams"] == 2
    assert got["train2"]["contaminated"] is False
    assert got["train3"]["contaminated"] is True
    assert got["train3"]["n_hit_grams"] == 1
    assert got["tiny"]["n_grams"] == 0 and got["tiny"]["contaminated"] is False


def test_decontaminate_case_and_ws_insensitive(spark):
    docs = _docs(spark, [("t", "Alpha  BETA gamma")])
    bench = _docs(spark, [("e", "alpha beta gamma")])
    row = decontaminate(docs, bench, n=3).collect()[0]
    assert row["contaminated"] is True


def test_surprisal_known_values(spark):
    # corpus: 8 occurrences total; 'a' x4, 'b' x2, 'c' x1, 'd' x1
    docs = _docs(spark, [("d1", "a a b c"), ("d2", "a a b d"), ("empty", "")])
    got = {r["doc_id"]: r for r in surprisal_score(docs).collect()}
    # s(a) = floor(log2(8 DIV 4)) = 1, s(b) = floor(log2(4)) = 2,
    # s(c) = s(d) = floor(log2(8)) = 3
    assert got["d1"]["sum_surprisal"] == 1 + 1 + 2 + 3
    assert got["d2"]["sum_surprisal"] == 1 + 1 + 2 + 3
    assert got["d1"]["n_tokens"] == 4
    assert got["d1"]["mean_surprisal_milli"] == 1000 * 7 // 4
    assert got["empty"]["n_tokens"] == 0
    assert got["empty"]["sum_surprisal"] == 0
    assert got["empty"]["mean_surprisal_milli"] == 0


def test_unigram_counts(spark):
    docs = _docs(spark, [("d1", "a a b"), ("d2", "b c")])
    got = {r["token"]: r["c"] for r in unigram_counts(docs).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


@pytest.fixture()
def synth_corpus():
    # deterministic word-soup corpus with planted overlaps
    words = ["w%d" % i for i in range(30)]
    rows = []
    for i in range(40):
        toks = [words[(i * 7 + j * 3) % 30] for j in range(5 + i % 9)]
        rows.append((i, " ".join(toks)))
    return rows


def _duck(rows):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    return con


def test_decontaminate_matches_duckdb_oracle(spark, synth_corpus):
    from spider_spark.functions.hashing import md5_u32_sql

    docs = spark.createDataFrame(synth_corpus, "doc_id long, text string")
    bench = docs.filter(
        F.expr(md5_u32_sql("cast(doc_id as string)")) % 5 == 0
    )
    got = (
        decontaminate(docs, bench, n=3)
        .withColumn("contaminated", F.col("contaminated").cast("int"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _duck(synth_corpus)
        .execute(O.decontaminate_sql("documents", n=3, bench_residue_mod=5))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # some benchmark docs must exist and flag themselves
    assert int(want["contaminated"].sum()) > 0
    pd.testing.assert_frame_equal(
        got.astype({"contaminated": "int64"}),
        want.astype({"contaminated": "int64"}),
        check_dtype=False,
    )


def test_surprisal_matches_duckdb_oracle(spark, synth_corpus):
    docs = spark.createDataFrame(synth_corpus, "doc_id long, text string")
    got = (
        surprisal_score(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _duck(synth_corpus)
        .execute(O.surprisal_score_sql("documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_self_decontamination_flags_everything(spark, synth_corpus):
    # decontaminating a corpus against itself: every doc with >= n words
    # is contaminated (its own grams are in the blocklist), and every hit
    # count equals its gram count
    docs = spark.createDataFrame(synth_corpus, "doc_id long, text string")
    got = decontaminate(docs, docs, n=3).collect()
    for r in got:
        if r["n_grams"] > 0:
            assert r["contaminated"] is True
            assert r["n_hit_grams"] == r["n_grams"]
        else:
            assert r["contaminated"] is False


def test_blocklist_monotonicity(spark, synth_corpus):
    # growing the benchmark set can only increase per-doc hit counts
    docs = spark.createDataFrame(synth_corpus, "doc_id long, text string")
    small = docs.filter(F.col("doc_id") % 10 == 0)
    large = docs.filter(F.col("doc_id") % 5 == 0)
    h_small = {
        r["doc_id"]: r["n_hit_grams"]
        for r in decontaminate(docs, small, n=3).collect()
    }
    h_large = {
        r["doc_id"]: r["n_hit_grams"]
        for r in decontaminate(docs, large, n=3).collect()
    }
    assert all(h_large[k] >= v for k, v in h_small.items())


def test_bigram_counts(spark):
    docs = _docs(spark, [("d1", "a b a b"), ("d2", "b a"), ("one", "x"), ("e", "")])
    got = {(r["w1"], r["w2"]): r["c12"] for r in bigram_counts(docs).collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 2}


def test_bigram_lm_known_values(spark):
    # training corpus == scoring corpus:
    #   bigrams: (a,b) x2, (b,a) x1, (b,c) x1
    #   prefixes: c1(a)=2, c1(b)=2 ; V = 2
    docs = _docs(spark, [("d1", "a b a b c"), ("tiny", "z"), ("e", None)])
    got = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    # d1 occurrences: (a,b): floor(log2((2+2)//(2+1)))=0  [x2]
    #                 (b,a): floor(log2((2+2)//(1+1)))=1
    #                 (b,c): floor(log2((2+2)//(1+1)))=1
    assert got["d1"]["n_bigrams"] == 4
    assert got["d1"]["sum_surprisal"] == 0 + 0 + 1 + 1
    assert got["d1"]["mean_surprisal_milli"] == 1000 * 2 // 4
    assert got["tiny"]["n_bigrams"] == 0
    assert got["tiny"]["sum_surprisal"] == 0
    assert got["e"]["mean_surprisal_milli"] == 0


def test_bigram_lm_unseen_fallbacks(spark):
    # train on ref, score a disjoint doc: unseen prefix pays floor(log2(V))
    ref = _docs(spark, [("r1", "a b"), ("r2", "b c"), ("r3", "c a")])
    # ref bigrams: (a,b), (b,c), (c,a); prefixes a,b,c each c1=1; V=3
    docs = _docs(spark, [("q1", "a c"), ("q2", "zz qq")])
    got = {r["doc_id"]: r for r in bigram_lm_score(docs, ref=ref).collect()}
    # (a,c): seen prefix a (c1=1), unseen bigram -> floor(log2((1+3)//1)) = 2
    assert got["q1"]["sum_surprisal"] == 2
    # (zz,qq): unseen prefix -> floor(log2((0+3)//1)) = 1
    assert got["q2"]["sum_surprisal"] == 1


def test_bigram_lm_repetitive_scores_lower(spark):
    # a repetitive doc must look less surprising than a one-off doc
    rows = [("rep", "p q " * 20)] + [
        (f"odd{i}", f"m{i} n{i} o{i}") for i in range(4)
    ]
    docs = _docs(spark, rows)
    got = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert all(r["sum_surprisal"] >= 0 for r in got.values())
    assert (
        got["rep"]["mean_surprisal_milli"]
        < got["odd0"]["mean_surprisal_milli"]
    )


def test_bigram_lm_matches_duckdb_oracle(spark, synth_corpus):
    docs = spark.createDataFrame(synth_corpus, "doc_id long, text string")
    got = (
        bigram_lm_score(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _duck(synth_corpus)
        .execute(O.bigram_lm_score_sql("documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_surprisal_rare_tokens_score_higher(spark):
    # a doc of corpus-unique tokens must outscore a doc of the filler
    # token, and every surprisal is non-negative
    rows = [("common", "x x x x x x x x")] + [
        (f"rare{i}", f"u{i}a u{i}b u{i}c") for i in range(4)
    ]
    docs = _docs(spark, rows)
    got = {r["doc_id"]: r for r in surprisal_score(docs).collect()}
    assert all(r["sum_surprisal"] >= 0 for r in got.values())
    assert (
        got["rare0"]["mean_surprisal_milli"]
        > got["common"]["mean_surprisal_milli"]
    )

"""Sessionization, stratified sampling, length stats, clean-corpus
pipeline — hand-computable fixtures plus the session_window ≡ lag/cumsum
equivalence that the driver oracle relies on."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spider_spark.analysis import pipeline as P
from spider_spark.analysis import sampling as SA
from spider_spark.analysis import sessions as SS


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


@pytest.fixture()
def events(spark):
    rows = [
        # user 1: gap of exactly 30min MERGES (session_window ranges
        # touch); one microsecond past the gap starts a new session
        (1, 1, _ts(0), "a"),
        (2, 1, _ts(10), "b"),
        (3, 1, _ts(40), "a"),             # exactly 30min after #2: merges
        (7, 1, _ts(10, 0, 1) + dt.timedelta(hours=1), "b"),  # > gap: new
        # user 2: one session, gap just under threshold
        (4, 2, _ts(0), "a"),
        (5, 2, _ts(29, 59, 999999), "a"),
        # user 3: singleton
        (6, 3, _ts(5), "c"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )


def test_sessionize_gap_rule(spark, events):
    out = {
        r["event_id"]: r["session_seq"]
        for r in SS.sessionize(events, gap_minutes=30).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 7: 2, 4: 1, 5: 1, 6: 1}


def test_session_stats_matches_cumsum_labels(spark, events):
    """F.session_window groups must be exactly the lag/cumsum sessions:
    same (user, n_events) multiset, same starts and durations."""
    stats = {
        (r["user_id"], r["session_start_us"]): r
        for r in SS.session_stats(events, gap_minutes=30).collect()
    }
    base = 1_704_067_200_000_000  # 2024-01-01T00:00:00 naive epoch us
    assert len(stats) == 4
    s10 = stats[(1, base)]
    assert s10["n_events"] == 3  # exact-gap event merged in
    assert s10["duration_us"] == 40 * 60_000_000
    assert s10["n_types"] == 2
    s12 = stats[(1, base + 70 * 60_000_000 + 1)]  # _ts micro=1
    assert s12["n_events"] == 1 and s12["duration_us"] == 0
    s2 = stats[(2, base)]
    assert s2["n_events"] == 2
    assert s2["duration_us"] == 30 * 60_000_000 - 1  # 29:59.999999


def test_session_window_equiv_on_random_events(spark):
    """Property: built-in session_window sessions == cumsum labeling on a
    deterministic pseudo-random event set (hash-derived timestamps)."""
    ev = spark.range(400).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_micros(
            (F.xxhash64(F.col("id")) % 86_400_000_000)
            + F.lit(1_700_000_000_000_000)
        ).cast("timestamp_ntz").alias("ts"),
        F.lit("t").alias("event_type"),
    )
    lab = SS.sessionize(ev, gap_minutes=30)
    manual = (
        lab.groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    builtin = (
        SS.session_stats(ev, gap_minutes=30)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    a = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in manual.collect()}
    b = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in builtin.collect()}
    assert a == b


def test_sample_stratified_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "web") for i in range(50)],
        "doc_id long, lang string, source string",
    )
    s1 = SA.sample_stratified(docs, n_per_stratum=3)
    rows1 = sorted((r["lang"], r["doc_id"], r["sample_rank"]) for r in s1.collect())
    rows2 = sorted(
        (r["lang"], r["doc_id"], r["sample_rank"])
        for r in SA.sample_stratified(docs, n_per_stratum=3).collect()
    )
    assert rows1 == rows2  # same sample every run
    per = {}
    for lang, _, rk in rows1:
        per.setdefault(lang, []).append(rk)
    assert all(sorted(v) == [1, 2, 3] for v in per.values())


def test_length_stats_exact_percentiles(spark):
    docs = spark.createDataFrame(
        [(i, "en", i * 10) for i in range(1, 12)],  # 10..110
        "doc_id long, lang string, n_chars long",
    )
    row = SA.length_stats(docs).collect()[0]
    assert row["n_docs"] == 11 and row["p50"] == 60.0
    assert row["p90"] == 100.0  # index 0.9*10 = 9 exactly
    assert row["p99"] == 109.0  # interpolated between 100 and 110


def test_clean_corpus_gates_and_dedup(spark):
    rows = [
        (1, "the cat and the dog is of the house to stay"),   # en, kept
        (2, "the cat and the dog is of the house to stay"),   # exact dup
        (3, "the cat and the dog is of the house to stay now"),  # near dup
        (4, "zzz qqq vvv www xxx yyy"),                       # unknown lang
        (5, "the and of !!! ??? ;;; ***"),                    # punct-heavy
        (6, "the of"),                                        # too short
        (7, "der hund und die katze ist nicht hier heute"),   # de, kept
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.clean_corpus(
        docs, num_hashes=16, bands=8, shingle_w=2).collect()}
    # doc 1 canonical for the {1,2,3} cluster; 7 its own; gates drop 4,5,6
    assert set(out) == {1, 7}
    assert out[1]["cluster_size"] == 3 and out[1]["lang_guess"] == "en"
    assert out[7]["cluster_size"] == 1 and out[7]["lang_guess"] == "de"


def test_split_assign_deterministic_and_growth_stable(spark):
    import duckdb
    import pandas as pd

    from spider_spark.analysis.sampling import split_assign, split_assign_sql

    rows = [("doc%03d" % i,) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id string")
    got = {r["doc_id"]: (r["bucket"], r["split"])
           for r in split_assign(docs, val_permille=100, test_permille=100).collect()}
    # thresholds respected and every split populated at these permilles
    splits = {s for _, s in got.values()}
    assert splits == {"train", "val", "test"}
    for b, s in got.values():
        assert 0 <= b < 1000
        assert s == ("test" if b < 100 else "val" if b < 200 else "train")

    # growth stability: a subset corpus assigns identically
    sub = spark.createDataFrame(rows[:50], "doc_id string")
    got_sub = {r["doc_id"]: (r["bucket"], r["split"])
               for r in split_assign(sub, val_permille=100, test_permille=100).collect()}
    assert got_sub == {k: v for k, v in got.items() if k in got_sub}

    # an independent salt draws a different split
    resalted = {r["doc_id"]: r["split"]
                for r in split_assign(docs, val_permille=100,
                                      test_permille=100, salt="v2").collect()}
    assert any(resalted[k] != got[k][1] for k in resalted)

    # DuckDB oracle equality
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id"]))
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        split_assign_sql("documents", val_permille=100, test_permille=100)
    ).fetchall()}
    assert want == got


# --------------------------------------------------------- corpus mixing


def test_mix_quotas_largest_remainder():
    from spider_spark.analysis.sampling import mix_quotas

    # 10 docs at 50/30/20: floors 5/3/2, no remainder
    assert mix_quotas({"en": 500000, "de": 300000, "zh": 200000}, 10) == {
        "en": 5, "de": 3, "zh": 2,
    }
    # 7 docs at 1/3 each: floors 2/2/2, one remainder -> equal
    # remainders, tie broken by group name ascending ('a' wins)
    assert mix_quotas({"a": 1, "b": 1, "c": 1}, 7) == {"a": 3, "b": 2, "c": 2}
    # degenerate inputs
    assert mix_quotas({"a": 0, "b": 0}, 5) == {"a": 0, "b": 0}
    assert mix_quotas({"a": 1}, 0) == {"a": 0}


def test_mix_sample_quota_and_shortfall(spark):
    from spider_spark.analysis.sampling import mix_sample

    docs = spark.createDataFrame(
        [(i, "en" if i < 40 else ("de" if i < 50 else "xx"))
         for i in range(60)],
        "doc_id long, lang string",
    )
    # quota de=8 exceeds... no: 40 en, 10 de available; ask 30 at 2:1
    got = mix_sample(docs, {"en": 2, "de": 1}, total_n=30).collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], []).append(r["sample_rank"])
    assert len(by["en"]) == 20            # full quota
    assert len(by["de"]) == 10            # shortfall: only 10 available
    assert "xx" not in by                 # untargeted group dropped
    # determinism: same rows again
    again = mix_sample(docs, {"en": 2, "de": 1}, total_n=30).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_mix_sample_matches_duckdb(spark):
    import duckdb

    from spider_spark.analysis.sampling import mix_sample, mix_sample_sql

    docs = spark.createDataFrame(
        [(i, ["en", "de", "es", "zh"][i % 4]) for i in range(200)],
        "doc_id long, lang string",
    )
    targets = {"en": 600000, "de": 250000, "es": 150000}
    got = sorted(
        map(tuple, mix_sample(docs, targets, total_n=77).collect())
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(
        map(
            tuple,
            con.sql(mix_sample_sql("documents", targets, 77)).fetchall(),
        )
    )
    assert got == want

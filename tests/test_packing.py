"""Sequence packing (analysis/packing.py) and winnowing fingerprints
(analysis/dedup.winnow_fingerprints) — known-value + invariant tests,
plus DuckDB-replica equality on a small corpus."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spider_spark.analysis import oracles as O
from spider_spark.analysis.dedup import winnow_fingerprints
from spider_spark.analysis.packing import pack_sequences, pack_stats
from spider_spark.functions.hashing import md5_u32_py

CORPUS = [
    ("d1", "the quick brown fox jumps over the lazy dog again and again"),
    ("d2", "the quick brown fox jumps over the lazy cat today"),
    ("d3", ""),
    ("d4", "one two"),
    ("d5", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ("d6", None),
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_winnow(text, k, w):
    toks = (text or "").lower().split()
    if not toks:
        return set()
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        grams = [" ".join(toks)]
    h = [md5_u32_py(g) for g in grams]
    if len(h) <= w:
        return {min(h)}
    return {min(h[j : j + w]) for j in range(len(h) - w + 1)}


def test_winnow_matches_python_reference(spark):
    got = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(_docs(spark), k=3, w=4).collect()
    }
    want = {
        (d, fp) for d, t in CORPUS for fp in _py_winnow(t, 3, 4)
    }
    assert got == want
    # the winnowing guarantee: d1/d2 share an 8-token prefix
    # (>= k + w - 1 = 6 tokens), so they must share a fingerprint
    d1 = {fp for d, fp in got if d == "d1"}
    d2 = {fp for d, fp in got if d == "d2"}
    assert d1 & d2
    # d5 shares no 3-gram with anyone
    d5 = {fp for d, fp in got if d == "d5"}
    assert not (d5 & (d1 | d2))


def test_winnow_short_and_empty_docs(spark):
    rows = [("a", "x"), ("b", "x y"), ("c", ""), ("d", None)]
    got = {
        r["doc_id"]: r["fp"]
        for r in winnow_fingerprints(_docs(spark, rows), k=3, w=4).collect()
    }
    # one fingerprint per short doc (whole-text gram), none for empty
    assert got["a"] == md5_u32_py("x")
    assert got["b"] == md5_u32_py("x y")
    assert "c" not in got and "d" not in got


def test_pack_sequences_known_assignment(spark):
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            _docs(spark), window=10, n_shards=2
        ).collect()
    }
    # shard = md5_u32(doc_id) % 2, deterministic; cumsum in doc_id order
    for doc_id, text in CORPUS:
        n = len((text or "").split())
        r = out[doc_id]
        assert r["shard"] == md5_u32_py(doc_id) % 2
        assert r["n_tokens"] == n
    # recompute the expected greedy assignment per shard
    by_shard: dict = {}
    for doc_id, text in sorted(CORPUS):
        s = md5_u32_py(doc_id) % 2
        cum = by_shard.get(s, 0)
        assert out[doc_id]["pack_id"] == cum // 10, doc_id
        by_shard[s] = cum + len((text or "").split())


def test_pack_invariants(spark):
    rows = [(f"doc{i:03d}", "w " * (i % 13)) for i in range(200)]
    packs = pack_sequences(_docs(spark, rows), window=16, n_shards=4).collect()
    by_shard: dict = {}
    for r in sorted(packs, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for s, docs in by_shard.items():
        # pack_id nondecreasing in doc order; every pack except possibly
        # the last reaches the window budget counting its straddling doc
        last_pack, cum = 0, 0
        for r in docs:
            assert r["pack_id"] >= last_pack
            assert r["pack_id"] == cum // 16
            last_pack, cum = r["pack_id"], cum + r["n_tokens"]
    stats = {
        (r["shard"], r["pack_id"]): r
        for r in pack_stats(_docs(spark, rows), window=16, n_shards=4).collect()
    }
    assert sum(r["n_docs"] for r in stats.values()) == 200


def test_packing_and_winnow_match_duckdb(spark):
    rows = [
        (f"u{i}", " ".join(f"tok{(i * 7 + j) % 23}" for j in range(i % 19)))
        for i in range(60)
    ]
    sdf = _docs(spark, rows)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"('{d}', '{t}')" for d, t in rows)
        + ") t(doc_id, text)"
    )
    got = {
        tuple(r)
        for r in pack_sequences(sdf, window=32, n_shards=4).collect()
    }
    want = {
        tuple(r)
        for r in con.execute(
            O.pack_sequences_sql("documents", window=32, n_shards=4)
        ).fetchall()
    }
    assert got == want
    got_w = {
        tuple(r) for r in winnow_fingerprints(sdf, k=3, w=4).collect()
    }
    want_w = {
        tuple(r)
        for r in con.execute(O.winnow_fps_sql("documents", k=3, w=4)).fetchall()
    }
    assert got_w == want_w


# --------------------------------------------------------- epoch shuffle


def test_epoch_shuffle_reproducible_and_distinct_per_epoch(spark):
    from spider_spark.analysis.packing import epoch_shuffle

    docs = spark.range(300).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, epoch_shuffle(docs, epoch=3, n_shards=8).collect()))
    b = sorted(map(tuple, epoch_shuffle(docs, epoch=3, n_shards=8).collect()))
    assert a == b  # same epoch -> same permutation
    c = sorted(map(tuple, epoch_shuffle(docs, epoch=4, n_shards=8).collect()))
    assert a != c  # different epoch -> different permutation
    # a real permutation: every doc exactly once, positions contiguous
    rows = epoch_shuffle(docs, epoch=3, n_shards=8).collect()
    assert len({r["doc_id"] for r in rows}) == 300
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_epoch_shuffle_matches_duckdb(spark):
    import duckdb

    from spider_spark.analysis.packing import epoch_shuffle, epoch_shuffle_sql

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    got = sorted(map(tuple, epoch_shuffle(docs, epoch=7, n_shards=16).collect()))
    con = duckdb.connect()
    con.register("t_docs", docs.toPandas())
    want = sorted(
        map(tuple, con.sql(epoch_shuffle_sql("t_docs", 7, 16)).fetchall())
    )
    assert got == want

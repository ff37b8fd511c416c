"""Sharded training-data export (analysis/export.py): deterministic
shard assignment, manifest known-values, DuckDB-replica equality, and a
write/read round-trip that re-derives the manifest from the files."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spider_spark.analysis.export import (
    export_text_shards,
    shard_assign,
    shard_manifest,
    shard_manifest_sql,
)
from spider_spark.functions.hashing import md5_u32_py

CORPUS = [
    ("d1", "the quick brown fox"),
    ("d2", "jumps over the lazy dog"),
    ("d3", ""),
    ("d4", None),
    ("d5", "alpha  beta\tgamma"),
    ("d6", "one"),
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_manifest(rows, n_shards):
    out = {}
    for d, t in rows:
        t = t or ""
        sh = md5_u32_py(f"sh:{d}") % n_shards
        m = out.setdefault(sh, [0, 0, 0, 0])
        m[0] += 1
        m[1] += len(t.lower().split())
        m[2] += len(t)
        m[3] += md5_u32_py(f"ck:{d}:{len(t)}")
    return {(sh, *v) for sh, v in out.items()}


def test_shard_assign_growth_stable(spark):
    small = shard_assign(_docs(spark), 16)
    grown = shard_assign(
        _docs(spark, CORPUS + [(f"x{i}", "pad") for i in range(40)]), 16
    )
    a = {(r["doc_id"], r["shard"]) for r in small.collect()}
    b = {(r["doc_id"], r["shard"]) for r in grown.collect()}
    assert a <= b  # original docs keep their shards as the corpus grows
    for d, sh in a:
        assert sh == md5_u32_py(f"sh:{d}") % 16


def test_shard_manifest_known_value(spark):
    got = {tuple(r) for r in shard_manifest(_docs(spark), 4).collect()}
    assert got == _py_manifest(CORPUS, 4)
    # totals are corpus-level invariants regardless of sharding
    assert sum(r[1] for r in got) == len(CORPUS)
    assert sum(r[2] for r in got) == sum(
        len((t or "").split()) for _, t in CORPUS
    )


def test_shard_manifest_matches_duckdb(spark):
    rows = [
        (f"u{i}", " ".join(f"tok{(i * 7 + j) % 23}" for j in range(i % 19)))
        for i in range(80)
    ] + CORPUS
    con = duckdb.connect()
    con.register("docs", _docs(spark, rows).toPandas())
    got = {tuple(r) for r in shard_manifest(_docs(spark, rows), 8).collect()}
    want = {
        tuple(r)
        for r in con.sql(shard_manifest_sql("docs", 8)).fetchall()
    }
    assert got == want


def test_export_round_trip(spark, tmp_path):
    path = str(tmp_path / "shards")
    manifest = export_text_shards(_docs(spark), path, n_shards=4)
    got = {tuple(r) for r in manifest.collect()}
    assert got == _py_manifest(CORPUS, 4)
    # shard dirs exist for every manifest row
    dirs = {p.name for p in (tmp_path / "shards").iterdir() if p.is_dir()}
    assert {f"shard={sh}" for sh, *_ in got} <= dirs
    back = spark.read.json(path)
    assert {
        (r["doc_id"], r["text"]) for r in back.collect()
    } == set(CORPUS)
    # loader-side validation: manifest re-derived from the files matches
    rederived = {
        tuple(r) for r in shard_manifest(back, n_shards=4).collect()
    }
    assert rederived == got
    # and the partition column agrees with the recomputed assignment
    mism = (
        shard_assign(back.withColumnRenamed("shard", "file_shard"), 4)
        .filter(F.col("file_shard") != F.col("shard"))
        .count()
    )
    assert mism == 0

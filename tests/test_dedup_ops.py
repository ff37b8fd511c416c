"""Bloom sidecar operator tests (R4 scale path): no false negatives,
OR-merge correctness, prefilter split."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.operators.dedup import (
    anti_join_seen,
    bloom_prefilter,
    build_bloom_delta,
    build_blooms,
    merge_blooms,
    with_bucket,
)

NB = 8
BITS = 1 << 12
HASHES = 5


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_bloom_delta_no_false_negatives(spark):
    seen = [f"https://h{i % 3}.example.com/p{i}" for i in range(500)]
    blooms = build_bloom_delta(_urls_df(spark, seen), NB, BITS, HASHES)
    probed = bloom_prefilter(_urls_df(spark, seen), blooms, NB)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # every member hits


def test_bloom_delta_filters_most_nonmembers(spark):
    seen = [f"https://h.example.com/p{i}" for i in range(500)]
    other = [f"https://h.example.com/q{i}" for i in range(500)]
    blooms = build_bloom_delta(_urls_df(spark, seen), NB, BITS, HASHES)
    probed = bloom_prefilter(_urls_df(spark, other), blooms, NB)
    fp = probed.filter(F.col("maybe_seen")).count()
    assert fp < 50  # <10% false positives at this sizing


def test_merge_blooms_is_union(spark):
    a = [f"https://a.example.com/{i}" for i in range(200)]
    b = [f"https://b.example.com/{i}" for i in range(200)]
    ba = build_bloom_delta(_urls_df(spark, a), NB, BITS, HASHES)
    bb = build_bloom_delta(_urls_df(spark, b), NB, BITS, HASHES)
    merged = merge_blooms(ba, bb).persist()
    probed = bloom_prefilter(_urls_df(spark, a + b), merged, NB)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_adaptive_build_no_false_negatives(spark):
    seen = [f"https://h.example.com/p{i}" for i in range(300)]
    blooms = build_blooms(
        with_bucket(_urls_df(spark, seen), NB), NB, fpp=0.01
    )
    probed = bloom_prefilter(_urls_df(spark, seen), blooms, NB)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_merge_blooms_geometry_mismatch_raises(spark):
    import pytest

    a = _urls_df(spark, ["https://a.example.com/1"])
    ba = build_bloom_delta(a, NB, BITS, HASHES)
    bb = build_bloom_delta(a, NB, BITS, HASHES + 1)  # same bits, wrong hashes
    with pytest.raises(Exception, match="geometry mismatch"):
        merge_blooms(ba, bb).collect()


def test_anti_join_seen_exact(spark):
    cand = _urls_df(spark, ["u1", "u2", "u3"])
    seen = _urls_df(spark, ["u2", "u2", "u4"])
    left = {r["url"] for r in anti_join_seen(cand, seen).collect()}
    assert left == {"u1", "u3"}

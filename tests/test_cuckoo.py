"""Cuckoo seen-filter sidecar tests: no false negatives (including under
table overflow into the stash), merge-as-union via the partial-key
involution, geometry guard, and engine result-equality vs the plain
anti-join path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.cuckoo import (
    _alt_bucket,
    _buckets,
    _fingerprints,
    build_cuckoo_delta,
    cuckoo_prefilter,
    merge_cuckoos,
)

NB = 8
N_CK = 1 << 8   # 256 buckets x 4 slots = 1024 capacity per partition bucket
SLOTS = 4
STASH_BITS = 1 << 12
STASH_HASHES = 5


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _build(spark, urls, n_ck=N_CK):
    return build_cuckoo_delta(
        _urls_df(spark, urls), NB, n_ck, SLOTS, STASH_BITS, STASH_HASHES
    )


def test_alt_bucket_is_involution():
    h1 = np.random.default_rng(7).integers(0, 2**63, 4096, dtype=np.int64).view(
        np.uint64
    )
    fp = _fingerprints(h1)
    b1, b2 = _buckets(h1, fp, N_CK)
    assert (_alt_bucket(b1, fp, N_CK) == b2).all()
    assert (_alt_bucket(b2, fp, N_CK) == b1).all()
    assert (fp != 0).all()


def test_cuckoo_delta_no_false_negatives(spark):
    seen = [f"https://h{i % 3}.example.com/p{i}" for i in range(500)]
    filters = _build(spark, seen)
    probed = cuckoo_prefilter(_urls_df(spark, seen), filters, NB)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_overflow_to_stash_no_false_negatives(spark):
    # 8 buckets x 4 slots = 32 slots per partition bucket for 2000 urls:
    # almost everything overflows into the stash; membership must hold
    seen = [f"https://h.example.com/p{i}" for i in range(2000)]
    filters = _build(spark, seen, n_ck=8)
    probed = cuckoo_prefilter(_urls_df(spark, seen), filters, NB)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_filters_most_nonmembers(spark):
    seen = [f"https://h.example.com/p{i}" for i in range(500)]
    other = [f"https://h.example.com/q{i}" for i in range(500)]
    filters = _build(spark, seen)
    probed = cuckoo_prefilter(_urls_df(spark, other), filters, NB)
    fp = probed.filter(F.col("maybe_seen")).count()
    assert fp < 50  # 16-bit fingerprints: ~0.5% expected, 10% bound


def test_merge_cuckoos_is_union(spark):
    a = [f"https://a.example.com/{i}" for i in range(200)]
    b = [f"https://b.example.com/{i}" for i in range(200)]
    fa = _build(spark, a)
    fb = _build(spark, b)
    merged = merge_cuckoos(fa, fb).persist()
    probed = cuckoo_prefilter(_urls_df(spark, a + b), merged, NB)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    merged.unpersist()


def test_merge_cuckoos_overflowing_merge_no_false_negatives(spark):
    # each side fits alone; the union overflows the table -> stash path
    # must absorb the re-inserted fingerprints that no longer fit
    a = [f"https://a.example.com/{i}" for i in range(120)]
    b = [f"https://b.example.com/{i}" for i in range(120)]
    fa = _build(spark, a, n_ck=8)
    fb = _build(spark, b, n_ck=8)
    merged = merge_cuckoos(fa, fb).persist()
    probed = cuckoo_prefilter(_urls_df(spark, a + b), merged, NB)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    merged.unpersist()


def test_merge_cuckoos_geometry_mismatch_raises(spark):
    a = _urls_df(spark, ["https://a.example.com/1"])
    fa = build_cuckoo_delta(a, NB, N_CK, SLOTS, STASH_BITS, STASH_HASHES)
    fb = build_cuckoo_delta(a, NB, N_CK, SLOTS + 1, STASH_BITS, STASH_HASHES)
    with pytest.raises(Exception, match="geometry mismatch"):
        merge_cuckoos(fa, fb).collect()


def test_cuckoo_engine_path_equivalent(spark, tmp_path):
    """Crawl with the cuckoo sidecar must be result-identical to the plain
    exact-anti-join crawl (same contract test as the bloom path)."""
    from spider_spark.config import CrawlConfig
    from spider_spark.fixtures import synth_web
    from tests.test_engine_vs_oracle import (
        engine_order,
        engine_run,
        engine_seen,
        engine_urls,
    )

    web = synth_web(n_hosts=2, pages_per_host=30, links_per_page=4, seed=9)
    cfg_plain = CrawlConfig(scrape_parallelism=8, max_retries=0)
    cfg_ck = CrawlConfig(
        scrape_parallelism=8,
        max_retries=0,
        bloom_enabled=True,
        seen_filter="cuckoo",
        num_seen_buckets=8,
        cuckoo_buckets=1 << 8,
        cuckoo_stash_bits=1 << 12,
    )
    eng_a, _ = engine_run(spark, web, cfg_plain, tmp_path, "nofilter")
    eng_b, _ = engine_run(spark, web, cfg_ck, tmp_path, "cuckoo")
    assert engine_seen(eng_a) == engine_seen(eng_b)
    assert engine_order(eng_a) == engine_order(eng_b)
    assert engine_urls(eng_a) == engine_urls(eng_b)

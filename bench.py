"""Benchmark runner (driver contract).

Runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus a synthetic-web
crawl throughput measurement, and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {"urls_fetched": n, "rounds": r, "urls_per_sec": x}}

Each query is forced end-to-end with a noop-format write (full
materialization, no driver collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_window_running_total",
    "r3_namespace_semijoin",
    "r4_seen_antijoin",
    "r8_politeness_topk",
    "r13_link_extract",
    "r22_url_clean",
    "r26_round_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_token_count",
    "text_lang_id",
    "ann_cosine_topk",
    # round-2 additions (new operators; r1 keys above unchanged so
    # per-query deltas vs BENCH_r01 stay comparable)
    "r7_fifo_rank",
    "dedup_minhash_pregroup",
    "dedup_ngram_jaccard",
    "dedup_embedding_lsh",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "multimodal_audio",   # real WAV decode via Arrow-batched mapInPandas
    "multimodal_frames",  # seekable frame-container stride sampling
    "events_sessionize",      # gap sessionization (lag/cumsum window)
    "pipeline_clean_corpus",  # composed gates + near-dup cluster dedup
    "text_repetition",        # Gopher repetition signals (dup-ngram, top-bigram)
    "text_c4_clean",          # C4 line-level cleaning over synthesized lines
    "text_vocab_topk",        # corpus vocabulary: count + distributed top-K
    "graph_pagerank",         # integer PageRank over the host transition graph
    "graph_anchor_texts",     # anchor-text link graph via the extraction UDF
    "text_decontaminate",     # benchmark n-gram overlap vs broadcast blocklist
    "text_surprisal",         # integer-exact IDF/surprisal quality score
    "text_bigram_lm",         # add-one bigram LM surprisal (CCNet-style)
    "search_bm25",            # fixed-point integer BM25 ranked retrieval
    "text_line_dedup",        # corpus-level boilerplate line dedup (CCNet)
    "text_pack_sequences",    # greedy contiguous training-sequence packing
    "dedup_winnow",           # winnowing substring fingerprints (SWA 2003)
    "text_importance",        # DSIR hashed-ngram importance scoring
    "tok_bpe_pairs",          # BPE merge-selection pair counts
    "dedup_substring_spans",  # Lee-et-al duplicated-gram span merge
    "text_chunk_tokens",      # sliding token-window chunking (zero shuffle)
    "ann_topk_quantized",     # fixed-point integer dot-product top-k
    "search_topk",            # integer tf-idf ranked retrieval
    "crawl_recrawl_topk",     # change-rate + staleness re-crawl priority
    "crawl_trap_hosts",       # spider-trap verdicts (distinct-URL host agg)
    "crawl_diff_stats",       # snapshot-diff churn (full-outer url join)
    "events_tumbling",        # native F.window fixed-window rollup
    "events_sliding",         # overlapping windows (width/slide replicas)
    "sketch_hll_users",       # integer-exact HyperLogLog distinct estimate
    "sketch_cms_topk",        # count-min heavy hitters
    "graph_hits",             # integer HITS hubs/authorities (4 iters)
    "text_binned_quantiles",  # histogram-resolution corpus quantiles
    "text_corpus_pivot",      # pinned-value pivot crosstab
    "q4_order_priority",      # TPC-H Q4 correlated-EXISTS semi-join shape
    "q17_small_quantity",     # TPC-H Q17 correlated scalar subquery shape
    "q5_local_supplier_volume",  # TPC-H Q5 snowflake join shape
    "q18_large_orders",       # TPC-H Q18 HAVING semi-join shape
    "text_main_content",      # jusText boilerplate removal (1-exchange)
    "export_manifest",        # sharded-export manifest (combine-heavy agg)
    "dedup_semantic",         # SemDeDup: cell-bounded pairs + label prop
    "multimodal_phash_dedup", # image phash dedup over real decode
    # continuation-session additions
    "lake_zorder_key",        # Morton bit-interleave clustering key
    "lake_compaction_plan",   # next-fit-decreasing bin-pack planning
    "skew_hot_keys",          # fair-share hot-key + salt-factor report
    "skew_partition_load",    # projected post-shuffle load histogram
    "r8_yield_budget",        # largest-remainder global budget split
    "text_page_metadata",     # title/description/og/lang/h1 extraction
    # round-3 additions
    "r8_delay_skip",          # cross-round Crawl-delay period scheduling
    # round-4 additions
    "multimodal_phash_jpeg_dedup",  # progressive+baseline JPEG phash dedup
    "dedup_clusters",         # star-edge cluster resolution (O(n)/bucket)
    # round-5 additions
    "multimodal_mp3_meta",    # MP3 frame-header walk (container parse)
    "multimodal_mp4_samples", # ISO-BMFF sample-table stride extraction
    "warc_cdx_index",         # WARC gzip-member walk -> CDX capture index
    "multimodal_audio_fp_dedup",  # scale-invariant audio fingerprint dedup
    "q21_sole_failing_supplier",  # TPC-H Q21 EXISTS/NOT-EXISTS shape
    "q13_customer_distribution",  # TPC-H Q13 outer-join histogram shape
    "warc_wet_extract",       # WET conversion: JVM tag-strip text extract
    "multimodal_pdf_text",    # PDF xref/page-tree walk + text operators
]


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    """(cold, warm) seconds per query. Cold = first end-to-end run in
    suite order (comparable to BENCH_r01/r02); warm = an immediate second
    run of the same query, which separates the operator's steady-state
    cost from JIT/codegen/first-touch effects — deep-suite queries print
    2-3x their warm cost cold, which cost a manual A/B to explain in
    round 2."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times, warm = {}, {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.time() - t0, 3)
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        warm[name] = round(time.time() - t0, 3)
    return times, warm


def bench_crawl(spark, cache_dir: str) -> dict:
    """Crawl throughput on a deterministic synthetic web: the engine's
    primary metric (URLs fetched+deduped per second)."""
    import shutil

    from spider_spark.config import CrawlConfig
    from spider_spark.engine import CrawlEngine
    from spider_spark.fixtures import synth_web, write_web

    n_hosts = int(os.environ.get("SPARK_GRAFT_CRAWL_HOSTS", "8"))
    pages = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "3000"))
    web_dir = os.path.join(cache_dir, f"benchweb2_{n_hosts}_{pages}")
    if not os.path.exists(os.path.join(web_dir, "documents.parquet")):
        web = synth_web(
            n_hosts=n_hosts,
            pages_per_host=pages,
            links_per_page=10,
            sitemap_frac=0.3,
            seed=42,
        )
        write_web(web, web_dir)
    work_dir = os.path.join(cache_dir, "benchwork")
    shutil.rmtree(work_dir, ignore_errors=True)
    cfg = CrawlConfig(
        scrape_parallelism=20000,
        max_retries=0,
        max_rounds=50,
        sanity_check=False,  # R28 audit is verification work, not crawl work
    )
    eng = CrawlEngine(spark, web_dir, work_dir, cfg)
    t0 = time.time()
    summary = eng.run()
    wall = time.time() - t0
    return {
        "urls_fetched": summary.urls_fetched,
        "rounds": summary.rounds,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(summary.urls_fetched / wall, 1),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    from spider_spark.session import get_spark

    spark = get_spark(
        app_name="spider_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache_dir, exist_ok=True)

    times, warm = bench_queries(spark, sf_dir)
    crawl = bench_crawl(spark, cache_dir)
    total = round(sum(times.values()) + crawl["wall_sec"], 3)
    out = {
        "metric": "headline suite + synthetic-web crawl wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_warm": warm,
        "value_warm": round(sum(warm.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": crawl,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Crawl configuration.

Mirrors the reference runtime config surface (Config.scala:16-45) with the
same defaults, re-interpreted for the batch-round model:

  - ``scrape_parallelism`` (SCRAPE_PARALLELISM, default 100): per-host fetch
    budget per round (reference: URLs taken per tick, HostCrawler.scala:171).
  - ``max_retries`` (MAX_RETRIES, default 0): a failed URL is re-scheduled
    while ``attempts <= max_retries`` (reference ``<=`` at
    Supervisor.scala:100, so default 0 still allows one retry).
  - ``max_rounds``: batch-model analogue of the reference's force-shutdown
    guard (Supervisor.scala:263-278).

Time-based knobs (scrape_interval / scrape_timeout / shutdown_timeout) have
no batch-model meaning: a round IS a tick, and fetch is a table join, so
they are kept only for documentation parity.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    scrape_parallelism: int = 100
    max_retries: int = 0
    max_rounds: int = 1000

    # scale knobs (engine-only; no reference equivalent)
    num_seen_buckets: int = 64          # hash buckets for the seen table
    shuffle_partitions: int = 32
    bloom_enabled: bool = False         # seen-filter sidecar pre-filter for R4
    seen_filter: str = "bloom"          # sidecar kind: "bloom" | "cuckoo"
    bloom_fpp: float = 0.01             # (one-shot adaptive build only)
    bloom_bits_per_bucket: int = 1 << 20  # fixed geometry for incremental OR-merge
    bloom_hashes: int = 7
    cuckoo_buckets: int = 1 << 14       # cuckoo slot-buckets per partition bucket
    cuckoo_slots: int = 4               # fingerprint slots per cuckoo bucket
    cuckoo_stash_bits: int = 1 << 17    # overflow bloom stash bitmap size
    cuckoo_stash_hashes: int = 5
    # compact_state() writes the merged seen table BUCKETED by url
    # (lake.write_bucketed): steady-state R4 anti-joins then read the
    # 10^10-row seen side with NO Exchange/Sort (SURVEY §1.2's
    # `bucket(N, url)` layout); per-round deltas since the compaction
    # stay plain parquet and anti-join as a second, delta-sized step
    seen_bucketed: bool = False
    seen_bucket_count: int = 32         # layout constant (4096 at 10^10)
    hot_host_salt: int = 1              # >1 enables salted repartition of hot hosts
    # measure the frontier's host skew each round (analysis/skew.hot_keys,
    # bounded: at most partitions-1 hot keys can exist) and raise the
    # politeness pre-prune salt to the measured salt_factor, capped below.
    # Salt is physical-only: rn and results are identical for any salt >= 1
    auto_salt: bool = False
    auto_salt_cap: int = 64
    # frontier ordering: "fifo" (reference semantics), "short_url"
    # (shorter URLs first per host, FIFO within equal length),
    # "indegree" (most-referenced first — backlink counts accumulated in
    # an inlinks sidecar) or "pagerank" (highest integer PageRank over
    # the accumulated intra-namespace link graph first — the full
    # Cho/Garcia-Molina 1998 PageRank crawl ordering, of which indegree
    # is the 1-iteration degenerate case; ranks recomputed each round
    # from a (src, dst, n) edge sidecar in exact int64 arithmetic so the
    # pure-Python oracle reproduces them bit-identically; the oracle
    # implements all named modes)
    priority_mode: str = "fifo"
    # fixed PageRank iterations per scheduling round (pagerank mode)
    pagerank_iters: int = 3
    # per-domain delay budgets: when on, a host's per-round budget becomes
    # min(scrape_parallelism, max(1, politeness_tick_s // its robots
    # Crawl-delay)) — the reference parses Crawl-delay but ignores it
    # (HostCrawler ticks at a fixed rate), so this is opt-in
    respect_crawl_delay: bool = False
    politeness_tick_s: float = 1.0
    # cross-round Crawl-delay scheduling (opt-in, requires
    # respect_crawl_delay): a host whose delay spans k > 1 ticks is
    # scheduled only every k-th round (period = ceil(delay / tick),
    # operators/politeness.delay_period) instead of being clamped to one
    # fetch EVERY round — the exact long-delay semantics a production
    # politeness layer needs. Off-round hosts defer their whole queue
    # with seq (FIFO) intact. Oracle-pinned like the other modes.
    crawl_delay_skip: bool = False
    # adaptive error backoff: when on, a host that produced fetch errors
    # (transport failures / missing docs — the R15 'err' class) in round
    # r-1 gets its round-r budget halved per error, floored at 1:
    # budget = max(1, base >> min(errors, error_backoff_cap)). Recovery is
    # immediate — only the PREVIOUS round's errors count, so one clean
    # round restores the full budget. The reference has no backoff (its
    # tick rate is fixed); opt-in, oracle-pinned like the other
    # scheduling extensions.
    error_backoff: bool = False
    error_backoff_cap: int = 6
    # yield-proportional GLOBAL budget (crawl-efficiency scheduling): when
    # > 0, each round splits this total across hosts by largest-remainder
    # allocation over the PREVIOUS round's new-URLs-per-fetch yield
    # (operators/politeness.yield_budgets; per-host floor
    # yield_budget_min), replacing the uniform scrape_parallelism. Round 1
    # (no history) runs at scrape_parallelism, as does any host absent
    # from the previous round's stats. The reference has no global budget
    # (its parallelism is strictly per host); opt-in, oracle-pinned, and
    # mutually exclusive with respect_crawl_delay (both redefine the base
    # budget). error_backoff composes on top (halves the allocated share).
    yield_budget_total: int = 0
    yield_budget_min: int = 1
    # robots dimension deployment: the rules table is always parsed by a
    # Spark job (never on the driver); when the number of RESTRICTING
    # hosts (non-allow-all rules / sitemaps / Crawl-delay) is at most this
    # threshold the parsed rules are collected once and broadcast globally
    # (zero per-round overhead — the autoBroadcastJoinThreshold trade);
    # above it the engine switches to per-round active-host slices
    # (semi-join + bounded collect + broadcast, the hyld/herr sidecar
    # pattern) so driver state never scales with the host universe
    robots_broadcast_hosts: int = 100_000
    # seed/namespace init threshold (the robots_broadcast_hosts pattern
    # applied to seeds): namespace/first-occurrence/roots are derived from
    # the sources TABLE with Spark — never a driver loop over the seed
    # list — and the host-level namespace dict is collected only when the
    # host count is at most this threshold (broadcast _ns joins, dict
    # lineage). Above it the namespace stays a distributed DataFrame and
    # the _ns joins drop the broadcast hint.
    seed_broadcast_hosts: int = 100_000
    store_fetched_per_round: bool = False  # span sink each round vs once at end
    sanity_check: bool = True           # R28 scrape-sanity anti-join per round
    spark_seeding: bool = True          # R21 distributed sitemap expansion
    # False: the parallel sinks race to fill the shared caches — safe and
    # strictly faster in one JVM (BlockManager locks dedupe per-partition
    # computation). On a multi-executor cluster set True: racing jobs may
    # compute an unlocated cache partition on two executors before either
    # stores it, so a single serial materialization is the safer trade.
    serial_materialize: bool = False
    sitemap_max_depth: int = 16         # index-recursion bound (cycle guard)
    # columnar cache batch rows for the persisted doc tables; 0 = leave the
    # session default. Small batches keep blob-column (html) cache-builder
    # allocations under G1's humongous threshold — see engine.__init__
    columnar_batch_rows: int = 2500
    user_agent: str = "SpiderSparkBot"  # matched against robots.txt groups

    # reference-parity documentation only (unused in batch model)
    scrape_interval_ms: int = 500
    scrape_timeout_ms: int = 20000
    shutdown_timeout_ms: int = 15000

    @staticmethod
    def from_env() -> "CrawlConfig":
        """Env-var driven construction, same variable names as the
        reference (Config.scala:28-45)."""
        e = os.environ
        return CrawlConfig(
            scrape_parallelism=int(e.get("SCRAPE_PARALLELISM", "100")),
            max_retries=int(e.get("MAX_RETRIES", "0")),
            max_rounds=int(e.get("MAX_ROUNDS", "1000")),
            num_seen_buckets=int(e.get("NUM_SEEN_BUCKETS", "64")),
            shuffle_partitions=int(e.get("SHUFFLE_PARTITIONS", "32")),
            bloom_enabled=e.get("BLOOM_ENABLED", "0") in ("1", "true"),
            seen_filter=e.get("SEEN_FILTER", "bloom"),
        )

"""Pure-Python reference simulator ("the oracle").

Re-enacts the reference crawler's semantics (Supervisor/HostCrawler/
SiteScraper/Indexer message flow, SURVEY.md §3) over a fixture Web, in the
deterministic synchronous-round model both this oracle and the Spark engine
share. Crawl-order equality vs the actor system is defined *per host*
(FIFO × tick × budget — the only order the reference itself makes
deterministic; its cross-host interleaving is scheduler noise), with
sorted-URL intra-page link order.

Round discipline (shared spec):
  round 0 (seeding, per source in list order; reference Main.scala:30):
    - per new host: parse robots (fail-open), expand sitemaps
      (probe <proto>://host/sitemap.xml + robots-declared, recursive,
      SitemapInspector.scala:22-58), set-dedup → SORTED → robots-filter →
      enqueue UNCLEANED, into inflight but NOT seen
      (Supervisor.scala SitemapFinished :75-76 adds only currentlyScraping)
    - seed: slash-stripped (NOT clean_url'd — Supervisor.scala:197), then
      scrape(): skip if inflight; skip if host ∉ namespace; else seen+=1,
      inflight+=, robots-gated enqueue (gate at HostCrawler.scala:146 —
      counting happens even when the enqueue is robots-dropped)
  round r ≥ 1:
    - per host (sorted): batch = first K of queue (HostCrawler.scala:171)
    - process results in global order (host sorted, batch position):
        * missing doc / status<0  → ScrapeFailure: inflight-=;
          attempts<=max_retries → scrape() again (appends to queue END,
          attempts+=1); unknown url (sitemap-seeded) → drop
          (Supervisor.scala:93-125)
        * status != 200           → NoIndex (SiteScraper.scala:101-103)
        * X-Robots-Tag noindex/none (any key case) → NoIndex
          (ResponseFilter.scala:14-36)
        * non-text/html           → Index, zero links
          (ContentFilter.scala:35-38)
        * html → extract+filter+clean links (R13/R14), index under
          coalesce(canonical, url) (Indexer.scala:52), then per link
          (sorted): slash-strip → skip if seen → skip if host ∉ namespace →
          scrape() (Supervisor.scala:127-166); finally inflight -= url
    - terminate when every queue is empty (R26)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from spider_spark.config import CrawlConfig
from spider_spark.fixtures import Web
from spider_spark.functions.extract import extract_batch, spans_to_html
from spider_spark.functions.robots import RobotsTable, parse_robots
from spider_spark.functions.urlnorm import strip_trailing_slash, url_host
from spider_spark.operators.politeness import (
    delay_budget,
    delay_period,
    yield_budgets_py,
)

# plain-Python twins of operators.politeness.priority_column — ascending
# sort keys; Python's stable sort preserves FIFO among equal priorities,
# matching the engine's (prio, seq) window order exactly. 'indegree' and
# 'pagerank' are stateful (None here): crawl() sorts by -accumulated
# in-link count / -integer PageRank, mirroring the engine's
# schedule-time sidecar joins
PRIORITY_KEYS = {
    "fifo": None,
    "short_url": len,
    "indegree": None,
    "pagerank": None,
}


def pagerank_int_py(
    edges: dict,
    iters: int,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> dict:
    """Exact replica of analysis/graph.pagerank_int over an
    {(src, dst): weight} dict — same int64 recurrence (per-edge
    ``(r*w) // out_w`` then sum, ``base + (d*sum) // 100``), so ranks are
    bit-identical to the engine's Spark computation."""
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    outw: dict = {}
    for (s, _d), w in edges.items():
        outw[s] = outw.get(s, 0) + w
    base = (100 - damping_pct) * scale // 100
    r = {n: scale for n in nodes}
    for _ in range(iters):
        recv: dict = {}
        for (s, d), w in edges.items():
            recv[d] = recv.get(d, 0) + (r[s] * w) // outw[s]
        r = {
            n: base + (damping_pct * recv.get(n, 0)) // 100 for n in nodes
        }
    return r


@dataclass
class CrawlResult:
    seen: dict  # url -> attempts (reference scrapeCounts)
    urls: dict  # indexed url -> (source_id, round)
    order: dict  # host -> [url, ...] in fetch order
    fetched: list  # [(round, host, pos, url)]
    rounds: int = 0
    metrics: list = field(default_factory=list)


def _noindex(headers: dict) -> bool:
    for k, v in (headers or {}).items():
        if k.lower() == "x-robots-tag":
            lv = (v or "").lower()
            return "noindex" in lv or "none" in lv
    return False


def seed_state(
    sources: list,
    robots: RobotsTable,
    sitemaps_fetch,
    sitemap_max_depth: int | None = None,
):
    """Round-0 seeding, shared verbatim by oracle and Spark engine so their
    initial state is identical by construction.

    sources: [(source_id, name, seed_url)] in reference Start order
    sitemaps_fetch: callable(sitemap_url) -> (kind, urls) | None

    Returns (queues: host -> [(url, is_sitemap_origin)], seen: url->attempts,
    inflight: set, namespace: host->source_id).
    """
    seen: dict[str, int] = {}
    inflight: set[str] = set()
    queues: dict[str, list[tuple[str, bool]]] = {}
    namespace: dict[str, str] = {}

    def expand(start_urls):
        # BFS with minimal-depth visit order and the SAME index-hop bound
        # as the Spark path (operators/expand.expand_reachable with
        # max_depth=cfg.sitemap_max_depth): both must truncate an
        # index-sitemap chain at the same level or the two seeding paths
        # diverge on hosts deeper than the cap
        out, visited, frontier = [], set(), []
        for sm in start_urls:
            if sm not in visited:
                visited.add(sm)
                frontier.append(sm)
        depth = 0
        while frontier:
            nxt = []
            for sm_url in frontier:
                entry = sitemaps_fetch(sm_url)
                if entry is None:
                    continue  # fetch failure (SitemapInspector.scala:29-35)
                kind, urls = entry
                if kind == "index":
                    if sitemap_max_depth is None or depth < sitemap_max_depth:
                        for child in urls:
                            if child not in visited:
                                visited.add(child)
                                nxt.append(child)
                else:
                    out.extend(urls)
            frontier = nxt
            depth += 1
        return out

    for source_id, _name, seed_url in sources:
        host = url_host(seed_url)
        if not host:
            continue
        new_host = host not in namespace
        namespace[host] = source_id
        if new_host:
            proto = seed_url.split("://", 1)[0]
            sm_start = [f"{proto}://{host}/sitemap.xml"] + robots.sitemaps_for(host)
            sm_urls = sorted(
                {u for u in expand(sm_start) if robots.is_allowed(host, u)}
            )
            for u in sm_urls:  # uncleaned, inflight only — NOT seen
                inflight.add(u)
                queues.setdefault(host, []).append((u, True))
        # Supervisor.scrape for the seed (slash-strip only, no clean_url)
        u = strip_trailing_slash(seed_url)
        if u in inflight:
            continue
        seen[u] = seen.get(u, 0) + 1
        inflight.add(u)
        if robots.is_allowed(host, u):
            queues.setdefault(host, []).append((u, False))
    return queues, seen, inflight, namespace


def crawl(web: Web, cfg: CrawlConfig | None = None) -> CrawlResult:
    cfg = cfg or CrawlConfig()
    # same admissibility rules as CrawlEngine.__init__ — the twins must
    # refuse the same configs, not silently pick a precedence
    if cfg.yield_budget_total and cfg.respect_crawl_delay:
        raise ValueError(
            "yield_budget_total and respect_crawl_delay both redefine "
            "the per-host base budget — enable at most one"
        )
    if cfg.yield_budget_total and cfg.yield_budget_min < 1:
        raise ValueError("yield_budget_min must be >= 1")
    if cfg.crawl_delay_skip and not cfg.respect_crawl_delay:
        raise ValueError(
            "crawl_delay_skip extends respect_crawl_delay — enable both"
        )
    robots = RobotsTable(
        {h: parse_robots(b, cfg.user_agent) for h, b in web.robots.items()}
    )

    urls_out: dict[str, tuple[str, int]] = {}
    order: dict[str, list[str]] = {}
    fetched_log: list[tuple[int, str, int, str]] = []
    metrics: list[dict] = []

    q0, seen, inflight, namespace = seed_state(
        web.sources, robots, web.sitemaps.get, cfg.sitemap_max_depth
    )
    queues: dict[str, list[str]] = {h: [u for u, _sm in q] for h, q in q0.items()}

    def scrape(url: str, rnd: int, count_new: bool = False):
        """Supervisor.scrape (Supervisor.scala:168-210). ``count_new``
        marks link-path (non-retry) enqueues for the yield sidecar —
        the engine counts additions where allowed & ~is_retry, per
        TARGET host, at the same point."""
        u = strip_trailing_slash(url)
        if u in inflight:
            return
        host = url_host(u)
        if not host or host not in namespace:
            return
        seen[u] = seen.get(u, 0) + 1
        inflight.add(u)
        if robots.is_allowed(host, u):  # HostCrawler.scala:146
            queues.setdefault(host, []).append(u)
            if count_new:
                cur_yield_new[host] = cur_yield_new.get(host, 0) + 1

    # ---- fetch rounds -----------------------------------------------------
    prio_key = PRIORITY_KEYS[cfg.priority_mode]
    track_inlinks = cfg.priority_mode == "indegree"
    inlink_counts: dict[str, int] = {}
    track_edges = cfg.priority_mode == "pagerank"
    edge_counts: dict[tuple, int] = {}  # (src page, dst url) -> n

    # error_backoff: per-host fetch-error counts from the PREVIOUS round
    # only (immediate recovery) — twins the engine's herr sidecar timing
    prev_errs: dict[str, int] = {}
    # yield_budget_total: (fetched, new-enqueued) per host from the
    # PREVIOUS round — twins the engine's hyld sidecar; budgets are the
    # same largest-remainder split (yield_budgets_py IS the shared math)
    prev_yield: dict[str, tuple[int, int]] = {}
    cur_yield_new: dict[str, int] = {}
    yield_budget_round: dict[str, int] = {}

    def host_budget(host: str) -> int:
        if cfg.yield_budget_total:
            # hosts absent from the previous round's stats (or round 1)
            # fall back to the uniform base, like the engine's left join
            base = yield_budget_round.get(host, cfg.scrape_parallelism)
        elif cfg.respect_crawl_delay:
            base = delay_budget(
                robots.rules_for(host).crawl_delay,
                cfg.scrape_parallelism,
                cfg.politeness_tick_s,
            )
        else:
            base = cfg.scrape_parallelism
        if cfg.error_backoff:
            e = min(prev_errs.get(host, 0), cfg.error_backoff_cap)
            base = max(1, base >> e)
        if cfg.respect_crawl_delay and cfg.crawl_delay_skip:
            # cross-round Crawl-delay: off-period rounds fetch nothing —
            # applied LAST (after the backoff floor), same order as the
            # engine's schedule-time column pipeline
            k = delay_period(
                robots.rules_for(host).crawl_delay, cfg.politeness_tick_s
            )
            if k > 1 and (rnd - 1) % k != 0:
                return 0
        return base

    rnd = 0
    while any(queues.values()) and rnd < cfg.max_rounds:
        rnd += 1
        if cfg.yield_budget_total:
            yield_budget_round = (
                yield_budgets_py(
                    prev_yield,
                    cfg.yield_budget_total,
                    cfg.yield_budget_min,
                )
                if prev_yield
                else {}
            )
        batches: list[tuple[str, list[str]]] = []
        # pagerank mode: rank the edge graph accumulated through the
        # PREVIOUS round, once per round before any host schedules —
        # the engine computes from its round-(r-1) ledges sidecar at the
        # same point. Unranked (never-linked) urls get 0, below every
        # ranked node's >= base floor.
        pr_ranks: dict = (
            pagerank_int_py(edge_counts, cfg.pagerank_iters)
            if track_edges and edge_counts
            else {}
        )
        for host in sorted(h for h, q in queues.items() if q):
            q = queues[host]
            if prio_key is not None:
                # stable sort: equal priorities keep insertion (seq) order,
                # and the sorted remainder re-sorts identically next round
                q = sorted(q, key=prio_key)
            if track_inlinks:
                # counts accumulated through the PREVIOUS round (this loop
                # increments during processing, scheduling happens first —
                # same timing as the engine's round r-1 sidecar). Unlike
                # the static prio_key modes, counts CHANGE between rounds,
                # so the deferred remainder must stay in insertion (seq)
                # order — storing it sorted would make future ties break on
                # the stale sorted order instead of seq, diverging from
                # the engine's orderBy(prio, seq).
                b = host_budget(host)
                idx = sorted(
                    range(len(q)), key=lambda i: -inlink_counts.get(q[i], 0)
                )
                batch = [q[i] for i in idx[:b]]
                queues[host] = [q[i] for i in sorted(idx[b:])]
                batches.append((host, batch))
                order.setdefault(host, []).extend(batch)
                for pos, u in enumerate(batch):
                    fetched_log.append((rnd, host, pos, u))
                continue
            if track_edges:
                # same stateful-mode discipline as indegree: schedule by
                # (-rank, seq) via a stable index sort, keep the deferred
                # remainder in insertion (seq) order
                b = host_budget(host)
                idx = sorted(
                    range(len(q)), key=lambda i: -pr_ranks.get(q[i], 0)
                )
                batch = [q[i] for i in idx[:b]]
                queues[host] = [q[i] for i in sorted(idx[b:])]
                batches.append((host, batch))
                order.setdefault(host, []).extend(batch)
                for pos, u in enumerate(batch):
                    fetched_log.append((rnd, host, pos, u))
                continue
            b = host_budget(host)
            batch, queues[host] = q[:b], q[b:]
            batches.append((host, batch))
            order.setdefault(host, []).extend(batch)
            for pos, u in enumerate(batch):
                fetched_log.append((rnd, host, pos, u))

        n_new = 0
        cur_errs: dict[str, int] = {}
        for host, batch in batches:
            for u in batch:
                doc = web.documents.get(u)
                if doc is None or doc.status < 0:
                    # ScrapeFailure path
                    cur_errs[host] = cur_errs.get(host, 0) + 1
                    inflight.discard(u)
                    attempts = seen.get(u)
                    if attempts is not None and attempts <= cfg.max_retries:
                        scrape(u, rnd)
                    continue
                if doc.status != 200 or _noindex(doc.headers):
                    inflight.discard(u)  # NoIndex
                    continue
                if not doc.content_type.startswith("text/html"):
                    canonical, links = None, []
                else:
                    html = spans_to_html(doc.spans)
                    res = extract_batch(
                        pd.Series([html]),
                        pd.Series([u]),
                        robots_allowed=robots.allowed_batch,
                    )
                    canonical = res["canonical_url"].iloc[0]
                    if canonical is not None and pd.isna(canonical):
                        canonical = None
                    links = list(res["links"].iloc[0])
                # Indexer.handleUrl: insert-if-absent (Indexer.scala:75-101)
                indexed = canonical if canonical else u
                if indexed not in urls_out:
                    urls_out[indexed] = (namespace.get(host, ""), rnd)
                # IndexFinished: schedule new links (sorted intra-page order)
                for link in links:
                    lu = strip_trailing_slash(link)
                    lh = url_host(lu)
                    if track_inlinks and lh in namespace:
                        # reference counted BEFORE the seen check — links
                        # to already-discovered pages keep accumulating
                        # (engine taps its stream pre-anti-join too)
                        inlink_counts[lu] = inlink_counts.get(lu, 0) + 1
                    if track_edges and lh in namespace:
                        # edge recorded at the same pre-seen-check tap,
                        # src = the fetched page url (the engine's purl)
                        edge_counts[(u, lu)] = (
                            edge_counts.get((u, lu), 0) + 1
                        )
                    if lu in seen:
                        continue
                    if lh not in namespace:
                        continue
                    before = len(seen)
                    scrape(link, rnd, count_new=True)
                    n_new += len(seen) - before
                inflight.discard(u)
        prev_errs = cur_errs
        if cfg.yield_budget_total:
            # engine hyld sidecar shape: stats rows exist only for hosts
            # that scheduled this round (f LEFT JOIN nw)
            prev_yield = {
                host: (len(batch), cur_yield_new.get(host, 0))
                for host, batch in batches
            }
            cur_yield_new = {}
        metrics.append(
            {
                "round": rnd,
                "scheduled": sum(len(b) for _h, b in batches),
                "new_urls": n_new,
            }
        )

    return CrawlResult(
        seen=seen,
        urls=urls_out,
        order=order,
        fetched=fetched_log,
        rounds=rnd,
        metrics=metrics,
    )

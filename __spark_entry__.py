"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship composite (politeness window top-K × retry
budget × namespace semi-join) over sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (reference IDs R1-R28 where SQL-expressible on the driver's
test tables) plus the training-data-pipeline operators (dedup families,
similarity search, text analysis, multimodal metadata). EVERY query has a
DuckDB oracle — including the MinHash/SimHash/ngram LSH family and the
SRP-bucketed embedding ops, whose hashing is md5-derived specifically so
both engines compute identical values (spider_spark/functions/hashing.py,
analysis/oracles.py generate the SQL from the same constants).

Column names and types are aligned pairwise (driver hashes values after
sorting columns by name): every aggregate/computed column is aliased
identically on both sides, counts/lengths cast to BIGINT, doubles rounded.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------- flagship


def entry(spark: SparkSession) -> DataFrame:
    """Politeness-style scheduling over the events stream at sf0.001:
    users within the retry budget (≤12 errors — the pinned contract
    value), first 5 events per user by time (per-host FIFO top-K
    analogue, reference R8/R16)."""
    sf_dir = "/root/testdata/sf0.001"
    events = _t(spark, sf_dir, "events")
    over_budget = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_err"))
        .filter(F.col("n_err") > 12)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.join(over_budget.select("user_id"), "user_id", "left_anti")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "user_id",
            "event_id",
            F.col("rn").cast("long").alias("rn"),
            "event_type",
        )
    )


# ----------------------------------------------------- synthetic URL column

# shared Spark/DuckDB recipe: coarse page URLs (collisions by design) so
# set-membership operators (R5/R18/R28) have non-trivial overlap
_PAGE_SQL = (
    "'https://h' || CAST(user_id % 5 AS VARCHAR) || '.example.com/page' || "
    "CAST(event_id % 97 AS VARCHAR)"
)


def _with_page(events: DataFrame) -> DataFrame:
    return events.withColumn(
        "url",
        F.concat(
            F.lit("https://h"),
            (F.col("user_id") % 5).cast("string"),
            F.lit(".example.com/page"),
            (F.col("event_id") % 97).cast("string"),
        ),
    )


# shared Spark/DuckDB recipe: structured page URLs with closed-form path
# segments (cyclic repeats on event_id % 3/4 residues) and query params
# (event_id % 2), so the spider-trap operators see healthy AND trappy
# shapes that both engines synthesize identically
def _trap_url(cast: str) -> str:
    c = lambda e, m: f"CAST({e} % {m} AS {cast})"  # noqa: E731
    return (
        f"'https://h' || {c('user_id', 5)} || '.example.com/s' || "
        f"{c('event_id', 7)}"
        f" || CASE WHEN event_id % 3 = 0 THEN '/s' || {c('event_id', 7)}"
        f" ELSE '/p' || {c('event_id', 11)} END"
        f" || CASE WHEN event_id % 4 = 0 THEN '/s' || {c('event_id', 7)}"
        f" ELSE '' END"
        f" || CASE WHEN event_id % 2 = 0 THEN '?sid=' || "
        f"{c('event_id', 500)} || '&page=' || {c('event_id', 17)}"
        f" ELSE '' END"
    )


# shared Spark/DuckDB recipe: two crawl snapshots keyed by a UNIQUE url
# (event_id is unique in events); membership (% 10 / % 7 residues) and
# fingerprints (% 4 / % 5) are closed-form in event_id, so added/removed/
# changed/unchanged all occur and both engines derive identical tables
def _snap_sql(cast: str, which: str) -> str:
    mod, fpmod = (10, 4) if which == "old" else (7, 5)
    return (
        f"SELECT 'https://h' || CAST(event_id % 7 AS {cast}) || '.x/p' || "
        f"CAST(event_id AS {cast}) AS url, "
        f"'f' || CAST(event_id % {fpmod} AS {cast}) AS fp "
        f"FROM events WHERE event_id % {mod} <> 0"
    )


def _snap_df(ev: DataFrame, which: str) -> DataFrame:
    mod, fpmod = (10, 4) if which == "old" else (7, 5)
    return ev.filter(f"event_id % {mod} != 0").selectExpr(
        "'https://h' || CAST(event_id % 7 AS STRING) || '.x/p' || "
        "CAST(event_id AS STRING) AS url",
        f"'f' || CAST(event_id % {fpmod} AS STRING) AS fp",
    )


# shared Spark/DuckDB recipe: deterministic URL-ish strings from events so
# the URL operators (R2/R22/R25) run on driver-provided tables
_URL_SQL = (
    "'https://h' || CAST(user_id % 5 AS VARCHAR) || '.example.com/p' || "
    "CAST(event_id AS VARCHAR) || "
    "CASE WHEN event_id % 7 = 0 THEN ';jsessionid=ABC123' ELSE '' END || "
    "CASE WHEN event_id % 3 = 0 THEN '?nn=1&v=' || CAST(user_id AS VARCHAR) "
    "     WHEN event_id % 3 = 1 THEN '?v=' || CAST(user_id AS VARCHAR) "
    "     ELSE '' END || "
    "CASE WHEN event_id % 11 = 0 THEN '#frag' ELSE '' END"
)


def _with_url(events: DataFrame) -> DataFrame:
    return events.withColumn(
        "url",
        F.concat(
            F.lit("https://h"),
            (F.col("user_id") % 5).cast("string"),
            F.lit(".example.com/p"),
            F.col("event_id").cast("string"),
            F.when(F.col("event_id") % 7 == 0, ";jsessionid=ABC123").otherwise(""),
            F.when(
                F.col("event_id") % 3 == 0,
                F.concat(F.lit("?nn=1&v="), F.col("user_id").cast("string")),
            )
            .when(
                F.col("event_id") % 3 == 1,
                F.concat(F.lit("?v="), F.col("user_id").cast("string")),
            )
            .otherwise(""),
            F.when(F.col("event_id") % 11 == 0, "#frag").otherwise(""),
        ),
    )


# --------------------------------------------------------------- queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spider_spark.analysis import cleaning as C
    from spider_spark.analysis import dedup as D
    from spider_spark.analysis import graph as G
    from spider_spark.analysis import multimodal as M
    from spider_spark.analysis import similarity as S
    from spider_spark.analysis import text as T
    from spider_spark.operators.expand import expand_reachable
    from spider_spark.operators.politeness import fifo_rank

    def r1_seed_scan(spark, sf):
        # R1 seed scan: tiny source-dim scan -> one Start row per source
        # (Main.scala:26-30); region is the driver's source-sized dim
        reg = _t(spark, sf, "region")
        return reg.select(
            F.col("r_regionkey").cast("long").alias("source_id"),
            F.col("r_name").alias("name"),
            F.concat(
                F.lit("https://"),
                F.lower(F.regexp_replace("r_name", " ", "-")),
                F.lit(".example.com"),
            ).alias("seed_url"),
        )

    def r5_inflight_dedup(spark, sf):
        # R5: candidates dropped when in-flight (click pages) and again
        # when already seen (purchase pages) — the two-stage dedup of
        # Supervisor.scala:173 + :212-213 on overlapping page urls
        ev = _with_page(_t(spark, sf, "events"))
        cand = ev.filter(F.col("event_type") == "view").select(
            "event_id", "url"
        )
        inflight = ev.filter(F.col("event_type") == "click").select("url")
        seen = ev.filter(F.col("event_type") == "purchase").select("url")
        return (
            cand.join(inflight, "url", "left_anti")
            .join(seen, "url", "left_anti")
            .select("event_id", "url")
        )

    def r7_fifo_rank(spark, sf):
        # R7: the engine's skew-proof exact FIFO rank (range-partition +
        # local rank + offsets) vs an independent single-window oracle
        ev = _t(spark, sf, "events").select(
            F.col("user_id").cast("string").alias("thost"), "ts", "event_id"
        )
        ranked = fifo_rank(
            ev,
            spark.sparkContext.defaultParallelism,
            host_col="thost",
            key_cols=("ts", "event_id"),
        )
        return ranked.select(
            F.col("thost").alias("user_id"),
            "event_id",
            F.col("rank").cast("long").alias("rk"),
        )

    def r14_link_pipeline(spark, sf):
        # R14: the full link filter+clean chain as ONE unit —
        # clean (R22) -> slash-strip (R23) -> validity (R24) -> wanted (R25)
        ev = _with_url(_t(spark, sf, "events"))
        url2 = (
            F.when(F.col("event_id") % 17 == 0, F.lit("not a url"))
            .when(F.col("event_id") % 13 == 0, F.concat("url", F.lit("/warenkorb")))
            .when(F.col("event_id") % 19 == 0, F.concat("url", F.lit("/")))
            .otherwise(F.col("url"))
        )
        cleaned = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(url2, "#.*$", ""), ";jsessionid=[^/?#]*", ""
            ),
            r"\?nn=1&",
            "?",
        )
        stripped = F.regexp_replace(cleaned, "/$", "")
        return (
            ev.select("event_id", stripped.alias("link"))
            .filter(
                F.col("link").rlike(
                    r"^(https?|ftp)://([A-Za-z0-9-]+\.)+[A-Za-z]{2,}(:[0-9]{1,5})?(/[^ ]*)?$"
                )
                & ~F.col("link").contains("!search?")
                & ~F.col("link").contains("/SiteGlobals/Forms/")
                & ~F.col("link").contains("?show=image")
                & ~F.col("link").rlike("/warenkorb|/addToCart")
            )
        )

    def r18_index_upsert(spark, sf):
        # R18: check-then-insert as first-wins dedup + anti-join vs the
        # existing urls table (Indexer.scala:75-101)
        ev = _with_page(_t(spark, sf, "events"))
        w = Window.partitionBy("url").orderBy("ts", "event_id")
        first = (
            ev.withColumn("_k", F.row_number().over(w))
            .filter(F.col("_k") == 1)
            .select("url", F.col("event_id").alias("first_event_id"))
        )
        existing = ev.filter(F.col("event_id") % 5 == 0).select("url")
        return first.join(existing, "url", "left_anti")

    def r19_robots_parse(spark, sf):
        # R19: the REAL REP parser (functions/robots.parse_robots — the
        # exact code the engine runs per crawled host,
        # RobotsTxtInspector.scala:18-32 semantics) over per-doc synthesized
        # robots.txt bodies: specific-UA-beats-*, allow/disallow longest
        # ties, disallow-all, empty-disallow, crawl-delay + sitemaps,
        # wildcard+anchor patterns, and no-directive fail-open. The oracle
        # is an independent DuckDB CASE replica of the expected parse.
        from spider_spark.functions.robots import parse_robots

        docs = _t(spark, sf, "documents")
        body = F.expr(
            "CASE doc_id % 6 "
            # specific group (token 'spid' ⊂ ua 'spider') shadows *
            "WHEN 0 THEN 'User-agent: spid\nDisallow: /s/' || (doc_id % 50) "
            "|| '\nAllow: /s/' || (doc_id % 50) || '/ok\n"
            "User-agent: *\nDisallow: /w' "
            # wildcard group, allow shorter than disallow
            "WHEN 1 THEN 'User-agent: *\nAllow: /a' || (doc_id % 50) "
            "|| '\nDisallow: /a' "
            # disallow-all
            "WHEN 2 THEN 'User-agent: *\nDisallow: /' "
            # empty disallow = allow everything
            "WHEN 3 THEN 'User-agent: *\nDisallow:' "
            # crawl-delay + sitemaps + wildcard/anchor rule
            "WHEN 4 THEN 'User-agent: *\nCrawl-delay: 1.5\n"
            "Sitemap: https://ex.org/s1.xml\nSitemap: https://ex.org/s2.xml\n"
            "Disallow: /x*y$' "
            # garbage, no directives → fail-open
            "ELSE '<html>not robots at all' END"
        )

        @F.pandas_udf(
            "mode string, n_rules long, top_rule string, "
            "crawl_delay double, n_sitemaps long"
        )
        def parse_udf(bodies: pd.Series) -> pd.DataFrame:
            rows = []
            for b in bodies:
                r = parse_robots(b, "spider")
                rows.append(
                    {
                        "mode": r.mode,
                        "n_rules": len(r.rules),
                        "top_rule": r.rules[0][3] if r.rules else None,
                        "crawl_delay": r.crawl_delay,
                        "n_sitemaps": len(r.sitemaps),
                    }
                )
            return pd.DataFrame(rows)

        return docs.select("doc_id", parse_udf(body).alias("p")).select(
            "doc_id",
            F.col("p.mode").alias("mode"),
            F.col("p.n_rules").alias("n_rules"),
            F.col("p.top_rule").alias("top_rule"),
            F.col("p.crawl_delay").alias("crawl_delay"),
            F.col("p.n_sitemaps").alias("n_sitemaps"),
        )

    def r20_robots_gate(spark, sf):
        # R20: the REAL enqueue gate (engine.make_robots_udf →
        # RobotsTable.allowed_batch, HostCrawler.scala:146) — driver-parsed
        # broadcast rules, vectorized longest-match-wins with wildcard,
        # $-anchor and allow-beats-disallow-on-tie cases, fail-open for an
        # unknown host, disallow-all for a closed host. The oracle encodes
        # the same fixed ruleset as an independent precedence CASE.
        from spider_spark.engine import make_robots_udf
        from spider_spark.functions.robots import RobotsTable, parse_robots

        docs = _t(spark, sf, "documents")
        host = F.expr(
            "CASE doc_id % 3 WHEN 0 THEN 'ex.org' "
            "WHEN 1 THEN 'closed.org' ELSE 'open.org' END"
        )
        path = F.expr(
            "CASE doc_id % 8 "
            "WHEN 0 THEN '/d/' || (doc_id % 50) "
            "WHEN 1 THEN '/d/ok/' || (doc_id % 50) "
            "WHEN 2 THEN '/d/ok/no/' || (doc_id % 50) "
            "WHEN 3 THEN '/w' || (doc_id % 50) || 'z' "
            "WHEN 4 THEN '/w' || (doc_id % 50) || 'za' "
            "WHEN 5 THEN '/exact' "
            "WHEN 6 THEN '/exact/' || (doc_id % 50) "
            "ELSE '/other/' || (doc_id % 50) END"
        )
        robots = RobotsTable(
            {
                "ex.org": parse_robots(
                    "User-agent: *\n"
                    "Disallow: /d\n"
                    "Allow: /d/ok\n"
                    "Disallow: /d/ok/no\n"
                    "Allow: /w*z\n"
                    "Disallow: /exact$\n",
                    "spider",
                ),
                "closed.org": parse_robots(
                    "User-agent: spid\nDisallow: /", "spider"
                ),
            }
        )
        gate = make_robots_udf(spark.sparkContext.broadcast(robots))
        d = docs.select(
            "doc_id",
            host.alias("host"),
            F.concat(F.lit("https://"), host, path).alias("url"),
        )
        return d.select(
            "doc_id", "host", "url", gate("url", "host").alias("allowed")
        )

    def r21_sitemap_expand(spark, sf):
        # R21: depth-bounded iterative expansion over a synthetic
        # sitemap-index tree (node k's parent is k div 2, root 1) using the
        # engine's distributed self-join flatten; oracle is a recursive CTE
        ev = _t(spark, sf, "events")
        edges = ev.filter(F.col("event_id") >= 2).select(
            F.expr("event_id div 2").cast("long").alias("parent"),
            F.col("event_id").alias("child"),
        )
        roots = spark.createDataFrame([(1,)], "node long")
        out = expand_reachable(edges, roots, max_depth=8)
        return out.select("node", F.col("depth").cast("long").alias("depth"))

    def r27_run_stats(spark, sf):
        # R27: per-day run manifest (fetches, active hosts, errors, value)
        ev = _t(spark, sf, "events")
        return ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day")
        ).agg(
            F.count("*").cast("long").alias("n_fetches"),
            F.countDistinct("user_id").cast("long").alias("n_hosts"),
            F.sum((F.col("event_type") == "error").cast("long")).alias(
                "n_errors"
            ),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )

    def r28_scrape_sanity(spark, sf):
        # R28: indexed ⊆ scheduled sanity report (Supervisor.scala:139-144)
        # — per host, how many indexed pages were never scheduled
        ev = _with_page(_t(spark, sf, "events"))
        indexed = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "url"
        ).distinct()
        sched = (
            ev.filter(F.col("value") >= 50)
            .select("url")
            .distinct()
            .withColumn("_s", F.lit(1))
        )
        return (
            indexed.join(sched, "url", "left")
            .groupBy("user_id")
            .agg(
                F.count("*").cast("long").alias("n_indexed"),
                F.sum(F.when(F.col("_s").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_unscheduled"),
            )
        )

    def r2_host_extract(spark, sf):
        ev = _with_url(_t(spark, sf, "events"))
        return (
            ev.withColumn(
                "host", F.regexp_extract("url", r"^[a-z]+://([^/?#]+)", 1)
            )
            .groupBy("host")
            .agg(F.count("*").cast("long").alias("n_urls"))
        )

    def r3_namespace_semijoin(spark, sf):
        cust = _t(spark, sf, "customer")
        nat = _t(spark, sf, "nation")
        reg = _t(spark, sf, "region")
        ns = nat.join(
            reg.filter(F.col("r_name") == "EUROPE"),
            nat.n_regionkey == reg.r_regionkey,
        ).select("n_nationkey")
        return cust.join(
            F.broadcast(ns), cust.c_nationkey == ns.n_nationkey, "left_semi"
        ).select("c_custkey", "c_name")

    def r4_seen_antijoin(spark, sf):
        # "unseen" customers: no URGENT-priority order yet (anti-join R4)
        cust = _t(spark, sf, "customer")
        orders = _t(spark, sf, "orders")
        seen = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("c_custkey")
        )
        return cust.join(seen, "c_custkey", "left_anti").select(
            "c_custkey", "c_acctbal"
        )

    def _r4_sidecar(spark, sf, kind):
        # run the REAL seen-filter sidecar (bloom or cuckoo prefilter +
        # exact anti-join fall-through); the oracle is the plain SQL
        # anti-join — equality proves the combined path stays exact
        from spider_spark.operators.cuckoo import (
            build_cuckoo_delta,
            cuckoo_prefilter,
        )
        from spider_spark.operators.dedup import (
            anti_join_seen,
            bloom_prefilter,
            build_bloom_delta,
        )

        ev = _with_url(_t(spark, sf, "events"))
        seen = ev.filter(F.col("event_id") % 2 == 0).select("url")
        cand = ev.select("url").distinct()
        if kind == "cuckoo":
            filters = build_cuckoo_delta(seen, 8, 1 << 12, 4, 1 << 14, 5)
            probed = cuckoo_prefilter(cand, filters, 8)
        else:
            filters = build_bloom_delta(seen, 8, 1 << 16, 5)
            probed = bloom_prefilter(cand, filters, 8)
        definite = probed.filter(~F.col("maybe_seen")).select("url")
        checked = anti_join_seen(
            probed.filter(F.col("maybe_seen")).select("url"), seen
        )
        return definite.unionByName(checked)

    def r4_seen_bloom(spark, sf):
        return _r4_sidecar(spark, sf, "bloom")

    def r4_seen_cuckoo(spark, sf):
        return _r4_sidecar(spark, sf, "cuckoo")

    def r6_visit_counts(spark, sf):
        return (
            _t(spark, sf, "orders")
            .groupBy("o_custkey")
            .agg(
                F.count("*").cast("long").alias("visits"),
                F.round(F.max("o_totalprice"), 2).alias("max_price"),
            )
        )

    def r8_politeness_topk(spark, sf):
        orders = _t(spark, sf, "orders")
        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        return (
            orders.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "rn")
        )

    def r8_priority_topk(spark, sf):
        # the REAL schedule_topk with a priority frontier order
        # (priority_mode='short_url': shorter URLs first, FIFO ties) vs an
        # independent DuckDB row_number over (length(url), seq)
        from spider_spark.operators.politeness import (
            priority_column,
            schedule_topk,
        )

        fr = (
            _with_url(_t(spark, sf, "events"))
            .select(
                F.col("user_id").cast("string").alias("host"),
                F.col("event_id").cast("long").alias("seq"),
                "url",
                F.lit(False).alias("sm"),
            )
            .withColumn("prio", priority_column("short_url"))
        )
        s, _ = schedule_topk(fr, budget=3, order_cols=("prio", "seq"))
        return s.select("host", "seq", F.col("rn").cast("long").alias("rn"))

    def r8_delay_budget(spark, sf):
        # the REAL schedule_topk with per-host delay budgets (budget_col):
        # each host keeps rn <= its own budget, literal ceiling prunes first
        from spider_spark.operators.politeness import schedule_topk

        fr = _with_url(_t(spark, sf, "events")).select(
            F.col("user_id").cast("string").alias("host"),
            F.col("event_id").cast("long").alias("seq"),
            "url",
            F.lit(False).alias("sm"),
            (F.lit(1) + F.col("user_id") % 4).cast("int").alias("_budget"),
        )
        s, _ = schedule_topk(fr, budget=4, budget_col="_budget")
        return s.select("host", "seq", F.col("rn").cast("long").alias("rn"))

    def r8_delay_skip(spark, sf):
        # the REAL cross-round Crawl-delay schedule (engine.py run_round
        # under cfg.crawl_delay_skip: _budget -> 0 when _period > 1 and
        # (r-1) % _period != 0, operators/politeness.delay_period) at a
        # fixed round r=3, vs an independent DuckDB CASE replica.
        # Synthetic periods 1 + user_id % 4: periods 3 and 4 are off-round
        # at r=3 and must schedule NOTHING; 1 and 2 fetch budget 2.
        from spider_spark.operators.politeness import schedule_topk

        r = 3
        fr = _with_url(_t(spark, sf, "events")).select(
            F.col("user_id").cast("string").alias("host"),
            F.col("event_id").cast("long").alias("seq"),
            "url",
            F.lit(False).alias("sm"),
            F.lit(2).cast("int").alias("_budget"),
            (F.lit(1) + F.col("user_id") % 4).cast("int").alias("_period"),
        )
        fr = fr.withColumn(
            "_budget",
            F.when(
                (F.coalesce(F.col("_period"), F.lit(1)) > 1)
                & ((F.lit(r - 1) % F.col("_period")) != 0),
                F.lit(0),
            ).otherwise(F.col("_budget")),
        ).drop("_period")
        s, _ = schedule_topk(fr, budget=2, budget_col="_budget")
        return s.select("host", "seq", F.col("rn").cast("long").alias("rn"))

    def r8_backoff_budget(spark, sf):
        # the REAL schedule_topk under error_backoff budgets (engine.py
        # run_round: budget = max(1, base >> min(prev-round errors, cap)))
        # vs an independent DuckDB row_number + bit-shift replica.
        # Synthetic error counts: user_id % 9 plays the herr sidecar.
        from spider_spark.operators.politeness import schedule_topk

        fr = _with_url(_t(spark, sf, "events")).select(
            F.col("user_id").cast("string").alias("host"),
            F.col("event_id").cast("long").alias("seq"),
            "url",
            F.lit(False).alias("sm"),
            (F.col("user_id") % 9).cast("long").alias("_berr"),
        )
        fr = fr.withColumn(
            "_budget",
            F.expr(
                "greatest(1, shiftright(4, cast(least("
                "coalesce(_berr, 0L), 6L) as int)))"
            ),
        ).drop("_berr")
        s, _ = schedule_topk(fr, budget=4, budget_col="_budget")
        return s.select("host", "seq", F.col("rn").cast("long").alias("rn"))

    def r8_indegree_topk(spark, sf):
        # the REAL schedule_topk under priority_mode='indegree' (engine.py
        # run_round: accumulated in-link totals LEFT-joined onto the
        # frontier, prio = -count, FIFO ties) vs an independent DuckDB
        # row_number over (-n, seq). Synthetic inlinks: every event
        # references its (user_id, event_id % 64) collision class, so the
        # class size IS the backlink count — deterministic, skewed, and
        # computable by both engines without the crawl loop.
        from spider_spark.operators.politeness import schedule_topk

        ev = _t(spark, sf, "events")
        fr = ev.select(
            F.col("user_id").cast("string").alias("host"),
            F.col("event_id").cast("long").alias("seq"),
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("/"),
                (F.col("event_id") % 64).cast("string"),
            ).alias("url"),
            F.lit(False).alias("sm"),
        )
        totals = (
            ev.select(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("/"),
                    (F.col("event_id") % 64).cast("string"),
                ).alias("url")
            )
            .groupBy("url")
            .agg(F.count("*").cast("long").alias("_in"))
        )
        sched_in = (
            fr.join(totals, "url", "left")
            .withColumn("prio", -F.coalesce(F.col("_in"), F.lit(0).cast("long")))
            .drop("_in")
        )
        s, _ = schedule_topk(sched_in, budget=3, order_cols=("prio", "seq"))
        return s.select("host", "seq", F.col("rn").cast("long").alias("rn"))

    def r8_pagerank_topk(spark, sf):
        # the REAL schedule_topk under priority_mode='pagerank'
        # (engine.py run_round: integer-PageRank ranks over the
        # accumulated edge graph LEFT-joined onto the frontier,
        # prio = -rank, FIFO ties) vs an independent DuckDB row_number
        # over (-r, seq) with the rank itself recomputed by the unrolled
        # integer-PageRank oracle — the whole rank column is value-exact,
        # so the ordering check pins both the scheduler AND the ranks.
        from spider_spark.operators.politeness import schedule_topk

        edges = G.transition_edges(_event_nodes(spark, sf))
        ranks = G.pagerank_int(edges, iters=3)
        ev = _t(spark, sf, "events")
        fr = ev.select(
            F.col("user_id").cast("string").alias("host"),
            F.col("event_id").cast("long").alias("seq"),
            F.concat(
                F.lit("h"), (F.col("event_id") % 32).cast("string")
            ).alias("url"),
            F.lit(False).alias("sm"),
        )
        sched_in = (
            fr.join(ranks.withColumnRenamed("node", "url"), "url", "left")
            .withColumn(
                "prio", -F.coalesce(F.col("r"), F.lit(0).cast("long"))
            )
            .drop("r")
        )
        s, _ = schedule_topk(sched_in, budget=3, order_cols=("prio", "seq"))
        return s.select("host", "seq", F.col("rn").cast("long").alias("rn"))

    def r10_fetch_join(spark, sf):
        # fetch = left outer equi-join (frontier x documents); missing doc
        # -> error path. Stand-in: orders LEFT JOIN customer (synthetic
        # misses via filtered right side)
        orders = _t(spark, sf, "orders")
        cust = _t(spark, sf, "customer").filter(F.col("c_custkey") % 3 != 0)
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
            .select(
                "o_orderkey",
                F.coalesce("c_name", F.lit("MISSING")).alias("fetched_name"),
            )
        )

    def r15_error_classifier(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.select(
            "event_id",
            F.when(F.col("event_type") == "error", "retryable")
            .when(F.col("value") < 10, "drop")
            .when(F.col("event_type") == "purchase", "index_no_links")
            .otherwise("parse")
            .alias("cls"),
        )

    def r24_url_validity(spark, sf):
        ev = _with_url(_t(spark, sf, "events"))
        bad = ev.withColumn(
            "url2",
            F.when(F.col("event_id") % 17 == 0, F.lit("not a url")).otherwise(
                F.col("url")
            ),
        )
        return bad.filter(
            F.col("url2").rlike(r"^(https?|ftp)://([A-Za-z0-9-]+\.)+[A-Za-z]{2,}(:[0-9]{1,5})?(/[^ ]*)?$")
        ).select("event_id", F.col("url2").alias("valid_url"))

    def r11_response_filter(spark, sf):
        # the REAL R11 predicate (operators/classify.xrobots_noindex — the
        # exact expression the engine applies to docs_meta) over a
        # synthesized headers map: key case varies per row, some rows lack
        # the header entirely, values span noindex/NONE/all
        from spider_spark.operators.classify import xrobots_noindex

        docs = _t(spark, sf, "documents")
        key = F.expr(
            "CASE doc_id % 4 WHEN 0 THEN 'X-Robots-Tag' "
            "WHEN 1 THEN 'x-robots-tag' WHEN 2 THEN 'X-ROBOTS-TAG' "
            "ELSE 'X-Other' END"
        )
        val = F.expr(
            "CASE doc_id % 3 WHEN 0 THEN 'noindex, nofollow' "
            "WHEN 1 THEN 'NONE' ELSE 'all' END"
        )
        d = docs.select(
            "doc_id",
            F.map_from_arrays(
                F.array(F.lit("Server"), key), F.array(F.lit("t"), val)
            ).alias("headers"),
        )
        return (
            d.select("doc_id", xrobots_noindex("headers").alias("noindex"))
            .filter(~F.col("noindex"))
            .select("doc_id")
        )

    def r12_content_gate(spark, sf):
        # the REAL R11/R12/R15 decision tree (operators/classify.
        # response_class — the engine's round classification) over
        # synthesized fetch-join rows: err/bad/noidx/html/plain all hit
        from spider_spark.operators.classify import response_class

        docs = _t(spark, sf, "documents")
        d = docs.select(
            "doc_id",
            F.expr(
                "CASE doc_id % 5 WHEN 0 THEN -1 WHEN 1 THEN 404 "
                "WHEN 2 THEN 301 ELSE 200 END"
            ).alias("status"),
            F.expr(
                "CASE doc_id % 3 WHEN 0 THEN 'text/html; charset=utf-8' "
                "WHEN 1 THEN 'text/plain' ELSE 'application/xhtml+xml' END"
            ).alias("content_type"),
            F.expr("doc_id % 7 = 0").alias("noindex"),
            F.expr(
                "CASE WHEN doc_id % 11 = 0 THEN CAST(NULL AS BIGINT) "
                "ELSE doc_id END"
            ).alias("join_doc"),
        )
        return d.select(
            "doc_id",
            response_class(
                F.col("status"),
                F.col("content_type"),
                F.col("noindex"),
                F.col("join_doc"),
            ).alias("cls"),
        )

    def r13_link_extract(spark, sf):
        # the REAL R13+R14 pipeline: per-doc HTML synthesized from the
        # text's first words, driven through make_extract_udf — tag parse,
        # head-canonical extraction, R24 validity (localhost link dropped),
        # R25 wanted-filter (/warenkorb link dropped), robots gate on the
        # page host's rules (Disallow /a/t), R22 clean (?nn param and
        # #fragment stripped), set-dedup + sort
        from spider_spark.engine import make_extract_udf
        from spider_spark.functions.robots import RobotsTable, parse_robots

        docs = _t(spark, sf, "documents")
        words = F.expr(
            "slice(filter(split(lower(coalesce(text, '')), '\\\\s+'), "
            "w -> w rlike '^[a-z]+$'), 1, 3)"
        )
        anchor = lambda acc, w: F.concat(
            acc,
            F.lit('<a href="https://ex.org/a/'),
            w,
            F.lit('?nn=5#frag">'),
            w,
            F.lit("</a>"),
            F.lit('<a href="/rel/'),
            w,
            F.lit('">r</a>'),
        )
        html = F.concat(
            F.lit(
                '<head><link rel="canonical" href="https://ex.org/canon"/>'
                "</head><body>"
            ),
            F.aggregate(words, F.lit(""), anchor),
            F.lit(
                '<a href="/always">a</a>'
                '<a href="https://ex.org/warenkorb/cart">w</a>'
                '<a href="http://localhost/nodots">b</a></body>'
            ),
        )
        robots = RobotsTable(
            {"ex.org": parse_robots("User-agent: *\nDisallow: /a/t", "spider")}
        )
        udf = make_extract_udf(spark.sparkContext.broadcast(robots))
        d = docs.select(
            "doc_id",
            udf(
                html, F.concat(F.lit("https://ex.org/p/"), F.col("doc_id"))
            ).alias("ex"),
        )
        return d.select(
            "doc_id",
            F.col("ex.canonical_url").alias("canonical_url"),
            F.explode("ex.links").alias("link"),
        )

    def r16_retry_budget(spark, sf):
        # retryable "hosts": error count within budget (= mean error count,
        # so the split is non-trivial at every sf)
        ev = _t(spark, sf, "events")
        errs = (
            ev.filter(F.col("event_type") == "error")
            .groupBy("user_id")
            .agg(F.count("*").cast("long").alias("attempts"))
        )
        thr = errs.agg(F.avg("attempts").alias("budget"))
        return (
            errs.crossJoin(F.broadcast(thr))
            .filter(F.col("attempts") <= F.col("budget"))
            .select("user_id", "attempts")
        )

    def r17_canonical_coalesce(spark, sf):
        orders = _t(spark, sf, "orders")
        return orders.select(
            "o_orderkey",
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("")),
                F.col("o_orderstatus"),
            ).alias("canon"),
        )

    def r22_url_clean(spark, sf):
        ev = _with_url(_t(spark, sf, "events"))
        cleaned = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("url", "#.*$", ""), ";jsessionid=[^/?#]*", ""
            ),
            r"\?nn=1&",
            "?",
        )
        return ev.select("event_id", cleaned.alias("url_clean"))

    def r23_slash_strip(spark, sf):
        ev = _with_url(_t(spark, sf, "events"))
        return ev.select(
            "event_id",
            F.regexp_replace(F.concat("url", F.lit("/")), "/$", "").alias(
                "url_noslash"
            ),
        )

    def r25_url_filter(spark, sf):
        ev = _with_url(_t(spark, sf, "events"))
        bad = ev.withColumn(
            "url2",
            F.when(
                F.col("event_id") % 13 == 0,
                F.concat("url", F.lit("/warenkorb")),
            ).otherwise(F.col("url")),
        )
        return bad.filter(
            ~F.col("url2").contains("!search?")
            & ~F.col("url2").contains("/SiteGlobals/Forms/")
            & ~F.col("url2").contains("?show=image")
            & ~F.col("url2").rlike("/warenkorb|/addToCart")
        ).select("event_id", F.col("url2").alias("url_wanted"))

    def r26_round_stats(spark, sf):
        ev = _t(spark, sf, "events")
        # decimal sum: exact & associative -> identical across engines
        # regardless of partial-aggregation order
        return ev.groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total"),
        )

    def q1_pricing_summary(spark, sf):
        li = _t(spark, sf, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,6)")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
                F.round(F.sum(dec("l_extendedprice")), 2)
                .cast("double")
                .alias("sum_base_price"),
                F.round(
                    F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))), 2
                )
                .cast("double")
                .alias("sum_disc_price"),
                F.round(
                    F.sum(dec("l_quantity")) / F.count("*").cast("decimal(18,6)"), 4
                )
                .cast("double")
                .alias("avg_qty"),
                F.count("*").cast("long").alias("count_order"),
            )
        )

    def q3_shipping_priority(spark, sf):
        cust = _t(spark, sf, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        return (
            cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, F.col("o_orderkey") == li.l_orderkey)
            .groupBy("o_orderkey", "o_orderdate")
            .agg(
                F.round(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,6)")
                        * (1 - F.col("l_discount").cast("decimal(18,6)"))
                    ),
                    2,
                )
                .cast("double")
                .alias("revenue")
            )
            .select(
                "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "revenue",
            )
        )

    def q_window_running_total(spark, sf):
        orders = _t(spark, sf, "orders")
        w = (
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )

    def q5_local_supplier_volume(spark, sf):
        # TPC-H Q5 shape: the 6-way snowflake join. region/nation are
        # broadcast dims (tiny), customer/supplier hash-join, the
        # lineitem fact streams through — the canonical
        # broadcast-then-shuffle plan AQE keeps at any scale. Note the
        # TPC-H c_nationkey = s_nationkey "local supplier" predicate
        # rides the supplier join condition, not a post-filter.
        r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
        n = _t(spark, sf, "nation")
        c = _t(spark, sf, "customer")
        s = _t(spark, sf, "supplier")
        o = _t(spark, sf, "orders").filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        li = _t(spark, sf, "lineitem")
        return (
            F.broadcast(r)
            .join(n, F.col("n_regionkey") == F.col("r_regionkey"))
            .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
            .join(o, F.col("o_custkey") == F.col("c_custkey"))
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(
                s,
                (F.col("l_suppkey") == F.col("s_suppkey"))
                & (F.col("s_nationkey") == F.col("c_nationkey")),
            )
            .groupBy("n_name")
            .agg(
                F.round(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,6)")
                        * (1 - F.col("l_discount").cast("decimal(18,6)"))
                    ),
                    2,
                )
                .cast("double")
                .alias("revenue")
            )
        )

    def q4_order_priority(spark, sf):
        # TPC-H Q4 shape: correlated EXISTS subquery — Catalyst rewrites
        # it to a left-semi join (plan-pinned in test_plans.py), so the
        # subquery surface costs exactly one semi-join, never a per-row
        # probe. Predicate adapted to this lineitem's columns: an order
        # counts when some line shipped after the order date.
        for t in ("orders", "lineitem"):
            _t(spark, sf, t).createOrReplaceTempView(f"_q4_{t}")
        return spark.sql(
            """
            SELECT o_orderpriority, count(*) AS order_count
            FROM _q4_orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (
                SELECT 1 FROM _q4_lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority
            """
        )

    def q17_small_quantity(spark, sf):
        # TPC-H Q17 shape: correlated SCALAR subquery (per-part average
        # quantity threshold) — Catalyst rewrites it to an aggregate +
        # equi-join, one pass over lineitem for the per-part stats. The
        # threshold compare is cross-multiplied into pure int64
        # (qty * 5 * cnt < sum) so no float average can diverge.
        for t in ("lineitem", "part"):
            _t(spark, sf, t).createOrReplaceTempView(f"_q17_{t}")
        return spark.sql(
            """
            SELECT count(*) AS n_lines,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                        AS DOUBLE) AS total_extprice
            FROM _q17_lineitem l
            WHERE CAST(l.l_quantity AS BIGINT) * 5 * (
                    SELECT count(*) FROM _q17_lineitem i
                    WHERE i.l_partkey = l.l_partkey)
                  < (SELECT sum(CAST(i.l_quantity AS BIGINT))
                     FROM _q17_lineitem i
                     WHERE i.l_partkey = l.l_partkey)
            """
        )

    def q18_large_orders(spark, sf):
        # TPC-H Q18 shape: self-aggregating semi-join — orders whose
        # total lineitem quantity exceeds a threshold. The HAVING
        # aggregate reduces lineitem to qualifying keys FIRST (combine-
        # heavy groupBy), then joins back; the big fact is never joined
        # unreduced.
        li = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
            .filter(F.col("sum_qty") > 150)
        )
        return (
            big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .select(
                "c_name",
                "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias(
                    "o_orderdate"
                ),
                F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2)
                .cast("double")
                .alias("o_totalprice"),
                F.col("sum_qty").cast("long").alias("sum_qty"),
            )
        )

    def q21_sole_failing_supplier(spark, sf):
        # TPC-H Q21 shape on this schema: suppliers that were the SOLE
        # returned-flag supplier on a multi-supplier finished order —
        # the EXISTS(other supplier) + NOT EXISTS(other failing
        # supplier) pair. Both quantifiers compile to hash semi-/anti-
        # joins whose equi key is l_orderkey with the suppkey
        # INEQUALITY riding the join condition (never a nested loop —
        # plan-pinned), and the anti side is pre-filtered to returned
        # rows so it shuffles the small slice only.
        li = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders")
        s = _t(spark, sf, "supplier")
        fail = li.where(F.col("l_returnflag") == "R").select(
            "l_orderkey", "l_suppkey"
        )
        l1 = (
            fail.join(
                o.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .drop("o_orderkey")
        )
        l2 = li.select(
            F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
        )
        l3 = fail.select(
            F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
        )
        sole = (
            l1.join(
                l2,
                (F.col("l_orderkey") == F.col("ok2"))
                & (F.col("l_suppkey") != F.col("sk2")),
                "left_semi",
            )
            .join(
                l3,
                (F.col("l_orderkey") == F.col("ok3"))
                & (F.col("l_suppkey") != F.col("sk3")),
                "left_anti",
            )
        )
        return (
            sole.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name")
            .agg(F.count("*").cast("long").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(25)
        )

    def q13_customer_distribution(spark, sf):
        # TPC-H Q13 shape: customers LEFT-joined to a filtered orders
        # side (the filter must ride the join, not drop the
        # no-order customers), per-customer order counts, then the
        # count-of-counts histogram — two combine-heavy aggregations,
        # zero-order customers kept as c_count = 0.
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        percust = (
            c.select("c_custkey")
            .join(
                o.where(F.col("o_orderpriority") != "1-URGENT").select(
                    "o_custkey", "o_orderkey"
                ),
                F.col("o_custkey") == F.col("c_custkey"),
                "left",
            )
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").cast("long").alias("c_count"))
        )
        return percust.groupBy("c_count").agg(
            F.count("*").cast("long").alias("custdist")
        )

    def q11_important_parts(spark, sf):
        # TPC-H Q11 shape: per-group value HAVING > fraction-of-global
        # scalar subquery. The global total reuses the per-part partial
        # sums (one combine-heavy shuffle feeds both levels) and rides
        # a 1-ROW BROADCAST join — never a recompute of lineitem, never
        # a driver collect. Exact decimal arithmetic; the fraction test
        # is cross-multiplied (value*1000 > total) so both engines
        # compare exact decimals, no division.
        li = _t(spark, sf, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,6)")
        per = li.groupBy("l_partkey").agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).alias(
                "val"
            )
        )
        total = per.agg(F.sum("val").alias("tot"))
        return (
            per.join(F.broadcast(total))
            .where(F.col("val") * 1500 > F.col("tot"))
            .select(
                "l_partkey",
                F.round("val", 2).cast("double").alias("value"),
            )
        )

    def q15_top_supplier(spark, sf):
        # TPC-H Q15 shape: the revenue view + scalar-max subquery —
        # suppliers whose quarterly revenue EQUALS the global max. The
        # max comes from the same aggregated view (tiny) as a 1-row
        # broadcast; ties all surface, exactly as the spec's view
        # formulation requires. Decimal-exact so the equality join
        # cannot be lost to float summation order.
        li = _t(spark, sf, "lineitem")
        s = _t(spark, sf, "supplier")
        dec = lambda c: F.col(c).cast("decimal(18,6)")
        rev = (
            li.where(
                (F.col("l_shipdate") >= F.lit("1996-01-01"))
                & (F.col("l_shipdate") < F.lit("1996-04-01"))
            )
            .groupBy("l_suppkey")
            .agg(
                F.sum(
                    dec("l_extendedprice") * (1 - dec("l_discount"))
                ).alias("total_rev")
            )
        )
        mx = rev.agg(F.max("total_rev").alias("mx"))
        return (
            rev.join(F.broadcast(mx))
            .where(F.col("total_rev") == F.col("mx"))
            .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .select(
                "s_suppkey",
                "s_name",
                F.round("total_rev", 2).cast("double").alias("total_rev"),
            )
        )

    def q22_dormant_customers(spark, sf):
        # TPC-H Q22 shape: above-average balance (scalar AVG subquery
        # over the positive-balance slice) AND dormant — no orders
        # since 2000 (anti-join on the filtered orders slice; this
        # schema's every customer has SOME order, so recency is the
        # dormancy that leaves a non-trivial answer to verify),
        # grouped by nation. The average test is cross-multiplied
        # (bal*n > sum) so it stays exact-decimal — avg() would return
        # a double in DuckDB and a wider decimal in Spark, the one
        # place the engines could legally disagree.
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        dec = lambda col: F.col(col).cast("decimal(18,6)")
        stats = c.where(F.col("c_acctbal") > 0).agg(
            F.sum(dec("c_acctbal")).alias("s"),
            F.count("*").cast("decimal(18,0)").alias("n"),
        )
        return (
            c.join(F.broadcast(stats))
            .where(dec("c_acctbal") * F.col("n") > F.col("s"))
            .join(
                o.where(
                    F.col("o_orderdate") >= F.lit("2000-01-01")
                ).select("o_custkey"),
                F.col("o_custkey") == F.col("c_custkey"),
                "left_anti",
            )
            .groupBy("c_nationkey")
            .agg(
                F.count("*").cast("long").alias("numcust"),
                F.round(F.sum(dec("c_acctbal")), 2)
                .cast("double")
                .alias("totacctbal"),
            )
        )

    def q16_supplier_counts(spark, sf):
        # TPC-H Q16 shape: supplier-count-per-part-attribute with a
        # NOT IN supplier exclusion — the exclusion compiles to a hash
        # anti-join (6-row broadcast), the partsupp stand-in is the
        # distinct (partkey, suppkey) projection of lineitem (one
        # combine-heavy shuffle), and countDistinct is the second
        # two-phase aggregate.
        li = _t(spark, sf, "lineitem")
        p = _t(spark, sf, "part")
        s = _t(spark, sf, "supplier")
        ps = li.select("l_partkey", "l_suppkey").distinct()
        excl = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
        return (
            ps.join(
                p.where(
                    (F.col("p_brand") != "Brand#2")
                    & ~F.col("p_type").startswith("ECONOMY")
                ),
                F.col("p_partkey") == F.col("l_partkey"),
            )
            .join(
                excl, F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti",
            )
            .groupBy("p_brand", "p_type", "p_size")
            .agg(
                F.countDistinct("l_suppkey")
                .cast("long")
                .alias("supplier_cnt")
            )
        )

    def q20_dominant_suppliers(spark, sf):
        # TPC-H Q20 shape: the nested IN(agg-threshold subquery) —
        # suppliers shipping >50% of a part's 1996 volume. Per-(part,
        # supplier) partial sums feed the per-part totals (the reuse
        # Q20's partsupp correlation wants), the >half test is
        # cross-multiplied exact decimal (q*2 > tq), and the supplier
        # lookup is a semi-join. No scalar subquery per row anywhere.
        li = _t(spark, sf, "lineitem")
        s = _t(spark, sf, "supplier")
        dec = lambda c: F.col(c).cast("decimal(18,6)")
        per = (
            li.where(F.year("l_shipdate") == 1996)
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.sum(dec("l_quantity")).alias("q"))
        )
        tot = per.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
        dom = (
            per.join(tot, "l_partkey")
            .where(F.col("q") * 2 > F.col("tq"))
            .select("l_suppkey")
            .distinct()
        )
        return s.join(
            dom, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        ).select("s_suppkey", "s_name", "s_nationkey")

    def dedup_exact(spark, sf):
        docs = _t(spark, sf, "documents")
        return (
            T.fingerprint(docs)
            .groupBy("fp")
            .agg(F.count("*").cast("long").alias("n_docs"))
        )

    def text_quality(spark, sf):
        docs = _t(spark, sf, "documents")
        n = F.length("text").cast("double")
        nop = F.length(F.regexp_replace("text", r"[^\w\s]", "")).cast("double")
        return docs.select(
            "doc_id",
            F.round((n - nop) / n, 6).alias("punct_ratio"),
        )

    def text_token_count(spark, sf):
        # the REAL operator (null/empty-safe shared semantics), not an
        # inline re-derivation that could drift from the oracle
        docs = _t(spark, sf, "documents")
        return T.token_count(docs).select(
            "doc_id",
            F.col("ws_tokens").cast("long").alias("ws_tokens"),
            F.col("bpe_tokens").cast("long")
            .alias("bpe_tokens"),
        )

    def text_lang_id(spark, sf):
        docs = _t(spark, sf, "documents")
        return T.lang_id(docs).select("doc_id", "lang_guess")

    def text_fingerprint(spark, sf):
        docs = _t(spark, sf, "documents")
        return T.fingerprint(docs).select("doc_id", "fp")

    def text_repetition(spark, sf):
        # Gopher-style repetition signals (dup word/ngram/line fractions,
        # top-bigram occupancy) over the raw word-soup text
        docs = _t(spark, sf, "documents")
        return C.repetition_stats(docs)

    def text_gopher_filter(spark, sf):
        # structural keep/drop gates over the deterministic multi-line
        # rendering (line structure gives the bullet/ellipsis flags
        # signal); booleans cast to int for bit-stable value hashing
        docs = C.synth_multiline(_t(spark, sf, "documents"))
        g = C.gopher_filter(docs, text_col="mtext")
        flags = (
            "f_words", "f_word_len", "f_symbols",
            "f_bullets", "f_ellipsis", "f_stops", "keep",
        )
        return g.select(
            "doc_id", "n_words",
            *[F.col(c).cast("int").alias(c) for c in flags],
        )

    def text_c4_clean(spark, sf):
        docs = C.synth_multiline(_t(spark, sf, "documents"))
        return C.c4_line_clean(docs, text_col="mtext")

    def text_line_dedup(spark, sf):
        # corpus-level line dedup (CCNet/RefinedWeb boilerplate pass) over
        # the multi-line rendering — its injected boilerplate line recurs
        # across docs, so the blocklist is non-trivial
        docs = C.synth_multiline(_t(spark, sf, "documents"))
        return C.line_dedup(docs, text_col="mtext", max_doc_freq=2)

    def text_pack_sequences(spark, sf):
        # greedy contiguous sequence packing into 256-token training packs,
        # 8 shards (analysis/packing.py)
        from spider_spark.analysis import packing as PK

        return PK.pack_sequences(
            _t(spark, sf, "documents"), window=256, n_shards=8
        )

    def dedup_winnow(spark, sf):
        # winnowing document fingerprints (Schleimer et al. 2003): k=5
        # token grams, window 8 — substring-level near-dup signatures
        return D.winnow_fingerprints(
            _t(spark, sf, "documents"), k=5, w=8
        )

    def dedup_substring_spans(spark, sf):
        # Lee et al. 2021 ExactSubstr at token-5-gram granularity:
        # maximal per-doc spans covered by corpus-duplicated grams
        return D.duplicate_gram_spans(
            _t(spark, sf, "documents"), k=5, min_doc_freq=2
        )

    def text_dup_span_stats(spark, sf):
        # per-doc duplicated-token totals (the keep/trim signal a
        # substring-dedup pass thresholds on); exact integer milli frac
        return D.dup_span_stats(
            _t(spark, sf, "documents"), k=5, min_doc_freq=2
        )

    def search_postings(spark, sf):
        # inverted-index build: per-token posting lists, hapaxes gated
        from spider_spark.analysis import search as SR

        return SR.inverted_postings(_t(spark, sf, "documents"), min_df=2)

    def search_conjunctive_q(spark, sf):
        # boolean-AND retrieval as a pure scan filter (zero shuffle);
        # 'dup' is the rare corpus token, so the conjunction is selective
        from spider_spark.analysis import search as SR

        return SR.search_conjunctive(
            _t(spark, sf, "documents"), ["dup", "window", "sort"]
        )

    def search_topk_q(spark, sf):
        # integer tf-idf ranked retrieval (floor-log2 surprisal weights;
        # N passed as a literal so no corpus-count join enters the plan)
        from spider_spark.analysis import search as SR

        docs = _t(spark, sf, "documents")
        return SR.search_topk(
            docs, ["dup", "window", "sort"], n_docs=docs.count(), k=25
        )

    def search_bm25_q(spark, sf):
        # fixed-point int64 BM25 (length normalization + tf saturation;
        # milli-unit arithmetic so ranking is engine-bit-identical)
        from spider_spark.analysis import search as SR

        docs = _t(spark, sf, "documents")
        return SR.search_bm25(
            docs, ["dup", "window", "sort"], n_docs=docs.count(), k=25
        )

    def text_chunk_tokens(spark, sf):
        # RAG / long-doc chunking: 32-token windows, stride 24 (docs run
        # 10-99 tokens, so multi-chunk docs with a short tail exist)
        from spider_spark.analysis import packing as PK

        return PK.chunk_tokens(
            _t(spark, sf, "documents"), chunk=32, stride=24
        )

    def _event_nodes(spark, sf):
        # clickstream → host-graph reduction: node = a 32-host hash of the
        # event (event_id % 32 — user_id%5 would make every per-user
        # transition a self-loop)
        return _t(spark, sf, "events").withColumn(
            "node",
            F.concat(F.lit("h"), (F.col("event_id") % 32).cast("string")),
        )

    def text_vocab_topk(spark, sf):
        # tokenizer-prep vocabulary: top-100 tokens by occurrence count
        return T.vocab_topk(_t(spark, sf, "documents"), k=100)

    def corpus_rollup_q(spark, sf):
        # dataset-card rollup: docs/tokens/chars per (lang, source) with
        # ROLLUP subtotals — one Expand + one combine-heavy aggregation
        return T.corpus_rollup(_t(spark, sf, "documents"))

    def text_pii_scrub(spark, sf):
        # PII redaction over deterministically injected emails/phones (the
        # raw corpus carries none — synth_pii is the fixture-shaping step)
        docs = C.synth_pii(_t(spark, sf, "documents"))
        return C.pii_scrub(docs, text_col="ptext")

    def text_decontaminate(spark, sf):
        # benchmark-overlap decontamination (GPT-3/PaLM n-gram rule): the
        # "eval set" is a deterministic md5-residue class of the corpus
        # itself (closed-form, no external data), its gram hashes
        # broadcast against the full corpus
        from spider_spark.analysis import decontam as DC
        from spider_spark.functions.hashing import md5_u32_sql

        docs = _t(spark, sf, "documents")
        bench = docs.filter(
            F.expr(md5_u32_sql("cast(doc_id as string)")) % 25 == 0
        )
        out = DC.decontaminate(docs, bench, n=3)
        return out.withColumn(
            "contaminated", F.col("contaminated").cast("int")
        )

    def text_surprisal(spark, sf):
        # integer-exact IDF/surprisal quality score (floor-log2 via
        # length(bin(x))-1 — bit-identical on any engine/summation order)
        from spider_spark.analysis import decontam as DC

        return DC.surprisal_score(_t(spark, sf, "documents"))

    def text_bigram_lm(spark, sf):
        # CCNet-style add-one-smoothed bigram LM surprisal (self-trained),
        # integer-exact: floor(log2((c1+V) DIV (c12+1))) per occurrence
        from spider_spark.analysis import decontam as DC

        return DC.bigram_lm_score(_t(spark, sf, "documents"))

    def text_importance(spark, sf):
        # DSIR-style importance scoring (Xie et al. 2023): hashed
        # {1,2}-gram bucket distributions, integer floor-log2 log-weight.
        # The "target" corpus is a deterministic md5-residue class of the
        # corpus itself (closed-form, no external data)
        from spider_spark.analysis import importance as IW
        from spider_spark.functions.hashing import md5_u32_sql

        docs = _t(spark, sf, "documents")
        target = docs.filter(
            F.expr(md5_u32_sql("cast(doc_id as string)")) % 16 == 0
        )
        return IW.importance_score(docs, target)

    def tok_bpe_pairs(spark, sf):
        # BPE tokenizer-training merge-selection step (Sennrich et al.
        # 2016): corpus word-frequency reduction, then frequency-weighted
        # adjacent character-pair counts, distributed top-50
        from spider_spark.analysis import tokenizer as TK

        return TK.bpe_pair_counts(_t(spark, sf, "documents"), k=50)

    def graph_anchor_texts(spark, sf):
        # anchor-text link graph: HTML synthesized from the text's first
        # words (the r13 idiom — DuckDB recomputes the expected edges in
        # closed form), driven through the REAL extract_anchors pandas UDF
        # (nested-markup strip, validity gate, unclosed-tag drop), then the
        # two-level (dst, anchor) aggregation
        docs = _t(spark, sf, "documents")
        words = F.expr(
            "slice(filter(split(lower(coalesce(text, '')), '\\\\s+'), "
            "w -> w rlike '^[a-z]+$'), 1, 3)"
        )
        anchor = lambda acc, w: F.concat(
            acc,
            F.lit('<a href="https://ex.org/t/'),
            w,
            F.lit('">go '),
            w,
            F.lit("</a>"),
        )
        html = F.concat(
            F.aggregate(words, F.lit(""), anchor),
            F.lit(
                '<a href="https://ex.org/top"><b> hi there </b></a>'
                '<a href="http://localhost/x">skip</a>'
                '<a href="https://ex.org/un">unclosed'
            ),
        )
        d = docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            html.alias("html"),
            F.concat(F.lit("https://ex.org/p/"), F.col("doc_id")).alias(
                "url"
            ),
        )
        return G.anchor_text_agg(G.anchor_text_edges(d))

    def graph_transition_edges(spark, sf):
        return G.transition_edges(_event_nodes(spark, sf))

    def graph_pagerank(spark, sf):
        edges = G.transition_edges(_event_nodes(spark, sf))
        return G.pagerank_int(edges, iters=5)

    def graph_hits(spark, sf):
        # Kleinberg hubs/authorities in exact int64 (max-normalized) —
        # the second classic crawl-ordering signal next to PageRank
        edges = G.transition_edges(_event_nodes(spark, sf))
        return G.hits_int(edges, iters=4)

    def text_length_histogram(spark, sf):
        # dataset-card length distribution: one combine-heavy groupBy,
        # shuffle carries #bins rows per partition
        docs = _t(spark, sf, "documents")
        return T.length_histogram(docs, bin_width=50)

    def text_binned_quantiles(spark, sf):
        # histogram-resolution P50/P90/P99 — the no-global-sort scale
        # path next to sample_percentiles' exact quantiles
        docs = _t(spark, sf, "documents")
        return T.binned_quantiles(docs, bin_width=50, pcts=(50, 90, 99))

    def text_corpus_pivot(spark, sf):
        # native pivot with the value list pinned (no values-discovery
        # job) -> ONE fused conditional-count aggregation
        docs = _t(spark, sf, "documents")
        return T.corpus_pivot(
            docs,
            pivot_col="lang",
            pivot_values=("de", "en", "es", "fr", "zh"),
            group_col="source",
        )

    def ann_cosine_topk(spark, sf):
        emb = _t(spark, sf, "embeddings")
        qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
        query = [float(x) for x in qrow[0]["embedding"]]
        scored = S.with_cosine(emb, query).select(
            "vec_id", F.round("cos_sim", 4).alias("cos_r")
        )
        return (
            scored.orderBy(F.desc("cos_r"), F.col("vec_id"))
            .limit(10)
            # string-format for bit-stable cross-engine value comparison
            .select("vec_id", F.format_string("%.4f", "cos_r").alias("cos_sim"))
        )

    def ann_topk_quantized(spark, sf):
        # fixed-point int64 dot-product top-10 (query = vec_id 0): the
        # quantized scoring kernel — exact integer scores, no rounding
        emb = _t(spark, sf, "embeddings")
        qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
        query = [float(x) for x in qrow[0]["embedding"]]
        return S.ann_topk_quantized(emb, query, k=10, frac_bits=8)

    def dedup_minhash_lsh(spark, sf):
        docs = _t(spark, sf, "documents")
        return D.minhash_lsh_candidates(
            docs, num_hashes=16, bands=8, shingle_w=2
        )

    def dedup_minhash_pregroup(spark, sf):
        docs = _t(spark, sf, "documents")
        return D.minhash_lsh_candidates_pregrouped(
            docs, num_hashes=16, bands=8, shingle_w=2
        )

    def dedup_clusters(spark, sf):
        # pairs -> transitive closure -> canonical cluster per doc; the
        # Spark side iterates min-label propagation (O(diameter) bounded
        # jobs), the oracle closes the same graph with a recursive CTE
        docs = _t(spark, sf, "documents")
        return D.duplicate_clusters(
            docs, num_hashes=16, bands=8, shingle_w=2
        )

    def dedup_simhash(spark, sf):
        docs = _t(spark, sf, "documents")
        return D.simhash_near_duplicates(docs, max_hamming=8)

    def dedup_ngram_jaccard(spark, sf):
        docs = _t(spark, sf, "documents")
        pairs = D.minhash_lsh_candidates(
            docs, num_hashes=16, bands=8, shingle_w=2
        )
        return D.ngram_jaccard(pairs, docs, n=2)

    # threshold 0.40: driver embeddings are near-orthogonal random vectors
    # (max pairwise cos ≈ 0.6), so a "real" 0.95 near-dup bar matches zero
    # rows at every sf; 0.40 keeps the operator's output non-trivial
    def dedup_embedding_cosine(spark, sf):
        emb = _t(spark, sf, "embeddings")
        return S.embedding_near_dup(emb, threshold=0.40)

    def dedup_embedding_lsh(spark, sf):
        emb = _t(spark, sf, "embeddings")
        planes = S.srp_planes(64, 4)
        return S.embedding_near_dup(emb, threshold=0.40, planes=planes)

    def ann_lsh_buckets(spark, sf):
        emb = _t(spark, sf, "embeddings")
        planes = S.srp_planes(64, 6)
        return (
            S.with_srp_bucket(emb, planes)
            .groupBy("srp_bucket")
            .agg(F.count("*").cast("long").alias("n_vecs"))
        )

    def ann_topk_lsh(spark, sf):
        # the actual ANN query path: prune to the query's SRP bucket, exact
        # cosine re-rank inside it (stable 4-dp rank + %.4f format for
        # cross-engine value comparison, like ann_cosine_topk)
        emb = _t(spark, sf, "embeddings")
        planes = S.srp_planes(64, 6)
        qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
        query = [float(x) for x in qrow[0]["embedding"]]
        # strict left-fold dot product — the exact association order of the
        # Spark aggregate() fold and the oracle SQL's expanded sum, so the
        # sign (and thus the bucket) can never diverge across engines
        qbucket = 0
        for i, plane in enumerate(planes):
            s = 0.0
            for a, b in zip(query, plane):
                s += a * float(b)
            if s >= 0:
                qbucket |= 1 << i
        bucketed = S.with_srp_bucket(emb, planes).filter(
            F.col("srp_bucket") == qbucket
        )
        scored = S.with_cosine(bucketed, query).select(
            "vec_id", F.round("cos_sim", 4).alias("cos_r")
        )
        return (
            scored.orderBy(F.desc("cos_r"), F.col("vec_id"))
            .limit(10)
            .select(
                "vec_id", F.format_string("%.4f", "cos_r").alias("cos_sim")
            )
        )

    def ann_topk_ivf(spark, sf):
        # IVF ANN path: prune to the query's nprobe argmax-cosine cells,
        # exact re-rank inside them (cell id = lake partition key at scale)
        emb = _t(spark, sf, "embeddings")
        cents = S.ivf_centroids(64, 8)
        qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
        query = [float(x) for x in qrow[0]["embedding"]]
        probed = S.ivf_probe_cells(query, cents, 2)
        celled = S.with_ivf_cell(emb, cents).filter(
            F.col("ivf_cell").isin(probed)
        )
        scored = S.with_cosine(celled, query).select(
            "vec_id", F.round("cos_sim", 4).alias("cos_r")
        )
        return (
            scored.orderBy(F.desc("cos_r"), F.col("vec_id"))
            .limit(10)
            .select(
                "vec_id", F.format_string("%.4f", "cos_r").alias("cos_sim")
            )
        )

    def ann_ivf_cells(spark, sf):
        # cell-occupancy histogram — pins the full assignment operator
        emb = _t(spark, sf, "embeddings")
        return (
            S.with_ivf_cell(emb, S.ivf_centroids(64, 8))
            .groupBy("ivf_cell")
            .agg(F.count("*").cast("long").alias("n_vecs"))
        )

    def ivf_train_means(spark, sf):
        # the Lloyd training step (assign → per-(cell,dim) mean) that
        # ivf_train iterates; milli-unit ints dodge float low-bit drift
        emb = _t(spark, sf, "embeddings")
        return S.ivf_cell_means(emb, S.ivf_centroids(64, 8)).select(
            "ivf_cell",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("m") * 1000, 0).cast("long").alias("m_milli"),
        )

    def multimodal_meta(spark, sf):  # stubbed decode; metadata is real
        ev = _t(spark, sf, "events")
        refs = ev.select(
            F.concat(F.lit("img://"), F.col("event_id").cast("string")).alias(
                "media_ref"
            )
        )
        return M.media_metadata(refs)

    def multimodal_audio(spark, sf):
        # REAL WAV decode: payloads are synthesized square waves whose
        # encode→decode→feature round-trip lands on closed-form integers
        # (media_fixtures.wav_params), so DuckDB re-derives every feature
        # arithmetically while Spark actually parses RIFF chunk lists
        from spider_spark.analysis import media_fixtures as MF

        ev = _t(spark, sf, "events").select("event_id")
        return M.decode_audio_features(MF.synth_wav(ev))

    def multimodal_frames(spark, sf):
        # REAL frame sampling: SSVF containers of solid-color PPM frames,
        # stride-2 sampled via the seekable index (only sampled frames are
        # decoded); frame count/color/timestamps are closed-form in the id
        from spider_spark.analysis import media_fixtures as MF

        ev = (
            _t(spark, sf, "events")
            .select("event_id")
            .where(F.col("event_id") % 2 == 0)
        )
        return M.sample_video_frames(MF.synth_frames(ev), stride=2)

    def multimodal_resize(spark, sf):
        # REAL decode → nearest-neighbor resize → block-mean features over
        # left/right split PPMs; the half-pixel-center sampling rule maps
        # resized cell means back to the two source gray levels exactly
        from spider_spark.analysis import media_fixtures as MF

        ev = _t(spark, sf, "events").select("event_id")
        return M.resize_image_features(
            MF.synth_split_image(ev), width=4, height=4
        )

    def multimodal_phash_dedup(spark, sf):
        # REAL decode → block-mean perceptual hash → dedup: planted
        # perceptual duplicates (content from event_id%23, size+container
        # PPM/BMP/PNG from event_id) group on the decoded-content hash even
        # though every payload's bytes differ; DuckDB re-derives the
        # packed hash arithmetically from the id
        from spider_spark.analysis import media_fixtures as MF

        ev = _t(spark, sf, "events").select("event_id")
        return M.phash_dedup(M.image_phash(MF.synth_quad_image(ev)))

    def multimodal_phash_jpeg_dedup(spark, sf):
        # REAL JPEG decode → phash dedup across ENCODINGS: same-group
        # content encoded baseline-sequential 4:4:4 (even ids) and
        # progressive SOF2 (odd ids) — identical quantized coefficients,
        # so same-group payloads decode bit-identically and group on the
        # perceptual hash despite thoroughly different bytes. JPEG loss
        # makes the hash VALUE non-integer-exact, so the row returns the
        # GROUPING (rep_ref, is_dup), a pure function of id arithmetic
        # DuckDB replicates hash-free (media_fixtures.jpeg_quad_params)
        from spider_spark.analysis import media_fixtures as MF

        # UNCAPPED since round 5: table-sized Huffman LUTs (codecs.
        # _huff_lut) + full-parallelism fixture synthesis made the full
        # 100k-image corpus cheaper than the old 5000-image capped row
        ev = _t(spark, sf, "events").select("event_id")
        return M.phash_dedup(M.image_phash(MF.synth_jpeg_quad_image(ev))).select(
            "media_ref", "rep_ref", "is_dup"
        )

    def multimodal_phash_near(spark, sf):
        # near-dup pairs at cell-hamming<=1 via the leave-one-out band
        # join: planted groups (event_id%150, <251 so color tuples never
        # collide across groups) whose members differ by one gray level
        # in one quadrant on alternating parity ((id div 150)%2) — the
        # band hit itself proves >=3 equal cells, no verify join
        from spider_spark.analysis import media_fixtures as MF

        ev = (
            _t(spark, sf, "events")
            .select("event_id")
            .where(F.col("event_id") < 600)
        )
        return M.phash_near_dups(
            M.image_phash(MF.synth_near_quad_image(ev, groups=150))
        )

    def multimodal_audio_fp(spark, sf):
        # REAL WAV decode → scale-invariant energy-delta fingerprint:
        # frame energies in exact int64 on the raw integer samples, bit
        # t = [E(t+1) > E(t)], frame count in the high byte. Amplitude
        # patterns are closed-form in event_id (media_fixtures.
        # fp_wav_params), so DuckDB computes the packed fingerprint
        # arithmetically while Spark decodes real PCM bytes
        from spider_spark.analysis import media_fixtures as MF

        ev = _t(spark, sf, "events").select("event_id")
        return M.audio_fingerprint(MF.synth_fp_wav(ev))

    def multimodal_audio_fp_dedup(spark, sf):
        # volume-scaled near-dup recovery: members of a content group
        # differ by an integer volume scale k (different payload bytes)
        # but share the fingerprint (energies scale by k² — comparisons
        # invariant), so phash_dedup groups them; the oracle computes
        # the fingerprint itself in SQL and groups by it, so even the
        # rare cross-group fp collision is replicated exactly
        from spider_spark.analysis import media_fixtures as MF

        ev = _t(spark, sf, "events").select("event_id")
        return M.phash_dedup(
            M.audio_fingerprint(MF.synth_fp_wav(ev)), hash_col="afp"
        ).select("media_ref", "rep_ref", "is_dup")

    def multimodal_mp3_meta(spark, sf):
        # REAL MP3 container parse (frame-header walk + ID3v2 skip) over
        # synthesized MPEG-1 Layer III streams: frame count / bitrate
        # pattern / tag size are closed-form in event_id
        # (media_fixtures.mp3_params), so every parsed column is integer
        # arithmetic for DuckDB while Spark walks real frame headers
        from spider_spark.analysis import media_fixtures as MF

        ev = _t(spark, sf, "events").select("event_id")
        return M.decode_mp3_features(MF.synth_mp3(ev))

    def multimodal_mp4_samples(spark, sf):
        # REAL ISO BMFF box-tree + stbl sample-table parse with stride-2
        # sampling: sample sizes/values/timestamps are closed-form in
        # (event_id, sample_idx) (media_fixtures.mp4_params), byte-exact
        # extraction via stco/stsz offsets — no codec library involved
        from spider_spark.analysis import media_fixtures as MF

        ev = (
            _t(spark, sf, "events")
            .select("event_id")
            .where(F.col("event_id") % 5 == 0)
        )
        return M.sample_mp4_payloads(MF.synth_mp4(ev), stride=2)

    def feed_parse_entries(spark, sf):
        # RSS/Atom feed-entry extraction (the discovery channel next to
        # R21's sitemaps): dialect detect + regexp_extract_all blocks +
        # posexplode + per-field regexps, ALL JVM expressions; fixture
        # rotates Atom/RSS with CDATA titles so both dialects' link
        # semantics (element text vs href attribute) verify against the
        # arithmetic DuckDB rebuild
        from spider_spark.sources import feeds as FD

        ev = _t(spark, sf, "events").select("event_id")
        return FD.feed_entries(FD.synth_feeds(ev))

    def feed_discover_links(spark, sf):
        # <link rel=alternate> feed advertisements — the page-scan →
        # feed-frontier hook; type-first AND href-first attribute
        # orders, pure JVM regexps; fixture ids %3==0 advertise rss,
        # %3==1 atom (reversed order), %15==0 both
        from spider_spark.sources import feeds as FD

        docs = _t(spark, sf, "documents").select("doc_id")
        d = docs.withColumn("html", F.expr(FD.feedlink_page_expr()))
        return FD.discover_feed_links(d)

    def multimodal_pdf_text(spark, sf):
        # REAL PDF container parse (xref table, page tree, FlateDecode
        # content streams, Tj/TJ text operators) over synthesized
        # multi-page PDFs; page count / text are closed-form in
        # (event_id, page_idx) (pdfdoc.pdf_fix_pages) so DuckDB rebuilds
        # every column while Spark walks real xref offsets — half the
        # fixture streams are zlib'd so both filter paths execute
        from spider_spark.analysis import pdfdoc as PD

        ev = _t(spark, sf, "events").select("event_id")
        return PD.decode_pdf_pages(PD.synth_pdf(ev))

    def warc_parse_records(spark, sf):
        # REAL WARC walk (per-record gzip members, WARC header parse,
        # HTTP response-block split) over synthesized .warc.gz blobs:
        # url/status/date/body are closed-form in (event_id, j)
        # (sources/warc.warc_params), so DuckDB rebuilds every parsed
        # column — including body length — while Spark decompresses and
        # walks real members (reference scope: captures-as-interchange,
        # the layer above SiteScraper.scala's direct store)
        from spider_spark.sources import warc as W

        ev = _t(spark, sf, "events").select("event_id")
        return (
            W.read_warc_records(W.synth_warc(ev))
            .where(
                F.col("err").isNull()
                & (F.col("warc_type") == "response")
            )
            .select(
                "ref",
                F.col("rec_idx").cast("int").alias("rec_idx"),
                "url",
                "http_status",
                "mime",
                F.length("body").cast("bigint").alias("body_len"),
                "warc_date",
            )
        )

    def warc_cdx_index(spark, sf):
        # CDX capture index over the same fixture: SURT urlkey, 14-digit
        # timestamp, sha-256 body digest (JVM-side F.sha2) — DuckDB
        # reconstructs the digest from the body string it builds itself
        from spider_spark.sources import warc as W

        ev = _t(spark, sf, "events").select("event_id")
        return W.cdx_index(W.synth_warc(ev)).select(
            "urlkey", "ts14", "url", "mime", "http_status", "digest"
        )

    def warc_wet_extract(spark, sf):
        # WET derivation (Common-Crawl conversion records): tag-strip +
        # whitespace-collapse of the HTML body, pure JVM regexps over
        # the parsed record table; the fixture page (title, paragraph,
        # 1+id%4 anchors) is closed-form in event_id so DuckDB rebuilds
        # the extracted text token-for-token; 404 captures (id%5==0)
        # are gated out on both sides
        from spider_spark.sources import warc as W

        ev = _t(spark, sf, "events").select("event_id")
        return W.to_wet(W.synth_warc_html(ev)).select(
            "url", "warc_date", "text"
        )

    def warc_wat_links(spark, sf):
        # WAT derivation (metadata envelopes): title via regexp_extract,
        # outlinks via regexp_extract_all — JVM-side over real parsed
        # gzip members; DuckDB reconstructs title/links/body_len from
        # the closed-form page (WAT covers 404 captures too)
        from spider_spark.sources import warc as W

        ev = _t(spark, sf, "events").select("event_id")
        return W.to_wat(W.synth_warc_html(ev)).select(
            "url",
            "warc_date",
            "http_status",
            "title",
            F.array_join("links", " ").alias("links_cat"),
            "n_links",
            "body_len",
        )

    def events_sessionize(spark, sf):
        # gap-based sessionization: lag + running sum over one (user, ts)
        # window partitioning — a single Exchange+Sort at any scale
        from spider_spark.analysis import sessions as SS

        ev = _t(spark, sf, "events")
        return SS.sessionize(ev, gap_minutes=30).select(
            "event_id", "user_id", "session_seq"
        )

    def events_session_stats(spark, sf):
        # the built-in F.session_window gap window; the oracle is the
        # classic lag/cumsum SQL, pinning the built-in's merge semantics
        from spider_spark.analysis import sessions as SS

        ev = _t(spark, sf, "events")
        return SS.session_stats(ev, gap_minutes=30)

    def events_tumbling(spark, sf):
        # native F.window tumbling rollup; oracle = (epoch_us // W) * W
        # closed-form bucket arithmetic (integer us, no timezone)
        from spider_spark.analysis import windows as WN

        ev = _t(spark, sf, "events")
        return WN.tumbling_stats(ev, width_s=3600)

    def events_sliding(spark, sf):
        # native F.window sliding (1h window, 15min hop): each event in
        # width/slide=4 windows; the oracle expands a static replica
        # series and filters — exactly the generator's window set
        from spider_spark.analysis import windows as WN

        ev = _t(spark, sf, "events")
        return WN.sliding_stats(ev, width_s=3600, slide_s=900)

    def sketch_hll_users(spark, sf):
        # HyperLogLog per-event-type distinct-user estimate in exact
        # int64 fixed-point (md5 register hash, rational alpha) — the
        # oracle recomputes the identical sketch, not just the answer
        from spider_spark.analysis import sketches as K

        ev = _t(spark, sf, "events")
        return K.hll_distinct(ev, "user_id", ("event_type",), p=6)

    def sketch_cms_topk(spark, sf):
        # count-min heavy hitters over the user_id stream (depth 4,
        # width 256): upward-biased integer estimates, min over rows
        from spider_spark.analysis import sketches as K

        ev = _t(spark, sf, "events")
        return K.cms_heavy_hitters(
            ev, "user_id", k=20, depth=4, width=256
        )

    def text_epoch_shuffle(spark, sf):
        # deterministic per-epoch training-order permutation: md5(epoch
        # || id) order key, shard + in-shard rank, no global sort
        from spider_spark.analysis.packing import epoch_shuffle

        docs = _t(spark, sf, "documents")
        return epoch_shuffle(docs, epoch=3, n_shards=16)

    def dedup_semantic(spark, sf):
        # SemDeDup: IVF-cell-bounded quantized-cosine pairs (exact
        # decimal threshold test) closed transitively, min-id reps;
        # planted exact copies (vec_id%7, shifted ids) give the fixture
        # real duplicate structure on any sf
        emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
        planted = emb.unionByName(
            emb.filter(F.col("vec_id") % 7 == 0).select(
                (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
            )
        )
        cents = S.ivf_centroids(64, 8)
        return S.semantic_dedup(planted, cents, threshold_ppm=900_000)

    def text_html_blocks(spark, sf):
        # jusText-style block classification over HTML synthesized
        # closed-form from the corpus text (r13 idiom): link-density /
        # length / stopword signals + the context pass, all exact ints
        from spider_spark.analysis import boilerplate as BP

        docs = _t(spark, sf, "documents")
        d = docs.withColumn("html", F.expr(BP.synth_page_expr()))
        return BP.html_blocks(d)

    def text_main_content(spark, sf):
        # final-good blocks reassembled in document order
        from spider_spark.analysis import boilerplate as BP

        docs = _t(spark, sf, "documents")
        d = docs.withColumn("html", F.expr(BP.synth_page_expr()))
        return BP.main_content(d)

    def export_manifest(spark, sf):
        # sharded-export manifest: growth-stable md5 shard assignment,
        # per-shard doc/token/char counts + order-independent int64
        # checksum — one combine-heavy groupBy to n_shards rows
        from spider_spark.analysis.export import shard_manifest

        docs = _t(spark, sf, "documents")
        return shard_manifest(docs, n_shards=16)

    def sample_corpus_mix(spark, sf):
        # training-mixture sample: largest-remainder integer quotas per
        # lang (60/25/15 over 300 docs), md5-ranked deterministic
        # selection (WindowGroupLimit, no rand())
        from spider_spark.analysis import sampling as SA

        docs = _t(spark, sf, "documents")
        return SA.mix_sample(
            docs,
            {"en": 600000, "de": 250000, "es": 150000},
            total_n=300,
        )

    def dedup_incremental(spark, sf):
        # incremental snapshot update: classify the "new crawl" quarter
        # of documents (doc_id % 4 == 0) against the other three
        # quarters as exact-dup / near-dup / new
        docs = _t(spark, sf, "documents")
        new = docs.filter(F.col("doc_id") % 4 == 0)
        old = docs.filter(F.col("doc_id") % 4 != 0)
        return D.incremental_dedup(
            new, old, num_hashes=16, bands=8, shingle_w=2
        )

    def sketch_kmv_users(spark, sf):
        # k-minimum-values distinct sketch per event type: integer
        # estimator (k-1)*2^32 div kth_min — exact below k, engine-
        # bit-identical above it
        from spider_spark.analysis import sketches as K

        ev = _t(spark, sf, "events")
        return K.kmv_distinct(ev, "user_id", ("event_type",), k=64)

    def crawl_change_rate(spark, sf):
        # Cho & Garcia-Molina refresh estimation: per-URL consecutive-
        # fingerprint change rate over the revisit log (one window + one
        # groupBy sharing a single url-keyed Exchange)
        from spider_spark.analysis import freshness as FR

        ev = _with_page(_t(spark, sf, "events"))
        return FR.change_rate(ev, fp_col="event_type")

    def crawl_recrawl_topk(spark, sf):
        # staleness-weighted volatility top-K per host (exact int64
        # priority; rank <= k compiles to WindowGroupLimit)
        from spider_spark.analysis import freshness as FR

        ev = _with_page(_t(spark, sf, "events"))
        rates = FR.change_rate(ev, fp_col="event_type").withColumn(
            "host", F.expr("split_part(split_part(url, '//', 2), '/', 1)")
        )
        return FR.recrawl_topk(rates, host_col="host", k=7)

    def crawl_trap_signals(spark, sf):
        # per-URL spider-trap signals (depth / repeated segments / query
        # params) — pure scan projection, zero shuffle
        from spider_spark.analysis import trapdetect as TD

        urls = _t(spark, sf, "events").selectExpr(
            f"{_trap_url('STRING')} AS url"
        )
        return TD.trap_signals(urls)

    def crawl_trap_hosts(spark, sf):
        # per-host trap verdicts: distinct-URL aggregation + exact-ppm
        # query blow-up ratio, one host-keyed shuffle
        from spider_spark.analysis import trapdetect as TD

        urls = _t(spark, sf, "events").selectExpr(
            f"{_trap_url('STRING')} AS url"
        )
        return TD.trap_hosts(urls)

    def crawl_diff_q(spark, sf):
        # incremental re-crawl delta: ONE full-outer url join classifying
        # added/removed/changed/unchanged (null-safe fp equality)
        from spider_spark.analysis import snapshots as SN

        ev = _t(spark, sf, "events")
        return SN.crawl_diff(_snap_df(ev, "old"), _snap_df(ev, "new"))

    def events_asof_join(spark, sf):
        # as-of backward join (union-sort window, ONE shuffle): every
        # event gains the newest policy snapshot at-or-before its ts on
        # its host, matches older than 10 min nulled; oracle is DuckDB's
        # native ASOF LEFT JOIN
        from spider_spark.operators.asof import asof_join

        ev = _t(spark, sf, "events")
        left = ev.selectExpr(
            "'h' || CAST(user_id % 5 AS STRING) AS host", "ts", "event_id"
        )
        right = (
            ev.filter("event_id % 37 = 0")
            .selectExpr(
                "'h' || CAST(event_id % 5 AS STRING) AS host",
                "ts",
                "'p' || CAST(event_id % 91 AS STRING) AS policy",
            )
            .groupBy("host", "ts")
            .agg(F.max("policy").alias("policy"))
        )
        return asof_join(
            left, right, key_cols=("host",), tolerance_us=600_000_000
        ).selectExpr(
            "host",
            "event_id",
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS ts_us",
            "policy",
            "matched_ts_us",
        )

    def crawl_redirects(spark, sf):
        # redirect-chain resolution (jsoup followRedirects parity,
        # SiteScraper.scala:81): pointer doubling — 5 self-joins resolve
        # every chain under the 20-hop cap; edges are a closed-form
        # function of doc_id (chains, a 2-cycle, self-loops, off-corpus
        # hops), oracle is a DuckDB recursive CTE chasing hop-by-hop
        from spider_spark.operators.redirects import resolve_redirects

        d = F.col("doc_id")
        u = lambda c: F.concat(F.lit("u"), c.cast("string"))  # noqa: E731
        edges = (
            _t(spark, sf, "documents")
            .select(
                u(d).alias("src"),
                F.when((d % 16).isin(0, 1, 2), u(d + 1))
                .when(d % 16 == 5, u(d))
                .when(d % 16 == 8, u(d + 1))
                .when(d % 16 == 9, u(d - 1))
                .when(d % 16 == 12, u(d + 1000000))
                .alias("dst"),
            )
            .where(F.col("dst").isNotNull())
        )
        return resolve_redirects(edges, max_hops=20)

    def events_range_join(spark, sf):
        # binned point-in-interval join (hash join on bin ids — never a
        # BroadcastNestedLoopJoin): events vs 200 closed-form maintenance
        # windows, integer-exact per-interval rollup; oracle is a plain
        # DuckDB BETWEEN join over the same closed-form intervals
        from spider_spark.operators.rangejoin import (
            range_join,
            synth_intervals,
        )

        ev = _t(spark, sf, "events").selectExpr(
            "event_id",
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS ts_us",
        )
        j = range_join(
            ev,
            synth_intervals(spark, 200),
            "ts_us",
            "lo_us",
            "hi_us",
            bin_size=7_680_000_000,  # 128 min ≈ p95 interval width
        )
        return j.groupBy("interval_id").agg(
            F.count("*").alias("n_events"),
            F.sum("event_id").alias("sum_event_id"),
        )

    def crawl_diff_stats_q(spark, sf):
        # per-host churn summary of the snapshot diff (map-side
        # combinable conditional counts + exact-ppm churn)
        from spider_spark.analysis import snapshots as SN

        ev = _t(spark, sf, "events")
        return SN.diff_stats(
            SN.crawl_diff(_snap_df(ev, "old"), _snap_df(ev, "new"))
        )

    def sample_stratified_q(spark, sf):
        # deterministic per-(lang, source) sample: md5-order row_number,
        # WindowGroupLimit prunes to n per partition before the sort
        from spider_spark.analysis import sampling as SA

        docs = _t(spark, sf, "documents")
        return SA.sample_stratified(docs, n_per_stratum=5).withColumn(
            "sample_rank", F.col("sample_rank").cast("long")
        )

    def doc_length_stats(spark, sf):
        # exact per-lang length quantiles (percentile == quantile_cont)
        from spider_spark.analysis import sampling as SA

        docs = _t(spark, sf, "documents")
        return SA.length_stats(docs)

    def sample_split_assign(spark, sf):
        # growth-stable train/val/test hash split (50/25 permille so all
        # three splits are populated at the 500-doc gate scale)
        from spider_spark.analysis import sampling as SA

        docs = _t(spark, sf, "documents")
        return SA.split_assign(docs, val_permille=25, test_permille=50)

    def pipeline_clean_corpus(spark, sf):
        # the composed corpus-cleaning pipeline: lang/token/punct gates +
        # near-dup cluster resolution, canonical docs only — one plan,
        # one SQL oracle for the whole composition
        from spider_spark.analysis import pipeline as P

        docs = _t(spark, sf, "documents")
        return P.clean_corpus(docs, num_hashes=16, bands=8, shingle_w=2)

    def text_page_metadata(spark, sf):
        # title/description/og:title/lang/h1 extraction over synthesized
        # pages whose metadata presence varies by doc id (every NULL
        # branch fires); single codegen scan, full DuckDB replica
        from spider_spark.analysis import metadata as MD

        docs = _t(spark, sf, "documents")
        d = docs.withColumn("html", F.expr(MD.metadata_page_expr()))
        return MD.page_metadata(d)

    def text_page_jsonld(spark, sf):
        # schema.org JSON-LD structured data: regexp block slice +
        # get_json_object paths, single codegen scan; fixture rotates
        # present/absent/MALFORMED blocks so the degrade-to-NULL
        # branch is oracle-verified too (DuckDB gates with json_valid
        # where Spark's get_json_object nulls natively)
        from spider_spark.analysis import metadata as MD

        docs = _t(spark, sf, "documents")
        d = docs.withColumn("html", F.expr(MD.jsonld_page_expr()))
        return MD.jsonld_extract(d)

    def crawl_charset_decode(spark, sf):
        # fetch-boundary charset detection + transcode: BOM / meta-tag /
        # default routes rotate by doc id over real encoded bytes
        # (utf-8-sig, utf-16-le, latin-1, cp1252, plain utf-8); the
        # decode is an Arrow-batched pandas UDF (the one inherently
        # Python codec boundary), detection contract pinned in
        # tests/test_charset.py; DuckDB rebuilds charset + decoded text
        # closed-form from the id
        from spider_spark.functions import charset as CS

        docs = _t(spark, sf, "documents").select("doc_id")
        return CS.decode_documents(CS.synth_charset_docs(docs))

    def r8_yield_budget(spark, sf):
        # yield-proportional global-budget split (largest remainder over
        # integer new-URLs-per-fetch yields — the engine's
        # yield_budget_total mode, oracle-pinned end to end)
        from spider_spark.operators.politeness import yield_budgets

        ev = _t(spark, sf, "events")
        stats = ev.groupBy(F.col("event_type").alias("host")).agg(
            F.count("*").cast("long").alias("fetched"),
            F.countDistinct("user_id").cast("long").alias("new_urls"),
        )
        return yield_budgets(stats, total_budget=1000, min_budget=2)

    def lake_zorder_key(spark, sf):
        # Morton bit-interleave of (user_id, event_id) — the Iceberg
        # zorder(rewrite) sort key, exact integer arithmetic
        from spider_spark import lake

        ev = _t(spark, sf, "events")
        return lake.with_zorder(
            ev.select("event_id", "user_id"), ["user_id", "event_id"],
            bits=14,
        ).select("event_id", "zkey")

    def _doc_inventory(spark, sf):
        # file-inventory stand-in synthesized from documents: one "file"
        # per doc, partition = lang, size = n_chars
        return _t(spark, sf, "documents").select(
            F.col("lang").alias("partition"),
            F.col("doc_id").cast("string").alias("path"),
            F.col("n_chars").cast("long").alias("size_bytes"),
        )

    def lake_compaction_plan(spark, sf):
        # deterministic next-fit-decreasing bin pack (metadata-only
        # planning of Iceberg rewrite_data_files binpack)
        from spider_spark import lake

        return lake.compaction_plan(_doc_inventory(spark, sf), 400)

    def lake_compaction_stats(spark, sf):
        from spider_spark import lake

        return lake.compaction_stats(
            lake.compaction_plan(_doc_inventory(spark, sf), 400)
        )

    def skew_hot_keys(spark, sf):
        # shuffle-skew diagnosis: keys above the fair share of a 16-way
        # exchange on documents.lang, with the leveling salt factor
        from spider_spark.analysis import skew as SK

        docs = _t(spark, sf, "documents")
        return SK.hot_keys(docs, "lang", 16, total=docs.count())

    def skew_partition_load(spark, sf):
        # projected post-shuffle partition histogram (portable md5
        # router so the oracle reproduces the exact assignment)
        from spider_spark.analysis import skew as SK

        ev = _t(spark, sf, "events")
        return SK.partition_load(ev, "event_type", 16, total=ev.count())

    return {
        "r1_seed_scan": r1_seed_scan,
        "r5_inflight_dedup": r5_inflight_dedup,
        "r7_fifo_rank": r7_fifo_rank,
        "r14_link_pipeline": r14_link_pipeline,
        "r18_index_upsert": r18_index_upsert,
        "r19_robots_parse": r19_robots_parse,
        "r20_robots_gate": r20_robots_gate,
        "r21_sitemap_expand": r21_sitemap_expand,
        "r27_run_stats": r27_run_stats,
        "r28_scrape_sanity": r28_scrape_sanity,
        "ann_topk_lsh": ann_topk_lsh,
        "ann_topk_ivf": ann_topk_ivf,
        "ann_ivf_cells": ann_ivf_cells,
        "ivf_train_means": ivf_train_means,
        "r2_host_extract": r2_host_extract,
        "r3_namespace_semijoin": r3_namespace_semijoin,
        "r4_seen_antijoin": r4_seen_antijoin,
        "r4_seen_bloom": r4_seen_bloom,
        "r4_seen_cuckoo": r4_seen_cuckoo,
        "r6_visit_counts": r6_visit_counts,
        "r8_politeness_topk": r8_politeness_topk,
        "r8_priority_topk": r8_priority_topk,
        "r8_delay_budget": r8_delay_budget,
        "r8_delay_skip": r8_delay_skip,
        "r8_indegree_topk": r8_indegree_topk,
        "r8_pagerank_topk": r8_pagerank_topk,
        "r8_backoff_budget": r8_backoff_budget,
        "r10_fetch_join": r10_fetch_join,
        "r11_response_filter": r11_response_filter,
        "r15_error_classifier": r15_error_classifier,
        "r24_url_validity": r24_url_validity,
        "r12_content_gate": r12_content_gate,
        "r13_link_extract": r13_link_extract,
        "r16_retry_budget": r16_retry_budget,
        "r17_canonical_coalesce": r17_canonical_coalesce,
        "r22_url_clean": r22_url_clean,
        "r23_slash_strip": r23_slash_strip,
        "r25_url_filter": r25_url_filter,
        "r26_round_stats": r26_round_stats,
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q_window_running_total": q_window_running_total,
        "q4_order_priority": q4_order_priority,
        "q17_small_quantity": q17_small_quantity,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q18_large_orders": q18_large_orders,
        "q21_sole_failing_supplier": q21_sole_failing_supplier,
        "q13_customer_distribution": q13_customer_distribution,
        "q11_important_parts": q11_important_parts,
        "q15_top_supplier": q15_top_supplier,
        "q22_dormant_customers": q22_dormant_customers,
        "q16_supplier_counts": q16_supplier_counts,
        "q20_dominant_suppliers": q20_dominant_suppliers,
        "dedup_exact": dedup_exact,
        "text_quality": text_quality,
        "text_token_count": text_token_count,
        "text_lang_id": text_lang_id,
        "text_fingerprint": text_fingerprint,
        "text_repetition": text_repetition,
        "text_vocab_topk": text_vocab_topk,
        "text_corpus_rollup": corpus_rollup_q,
        "text_pii_scrub": text_pii_scrub,
        "text_decontaminate": text_decontaminate,
        "text_surprisal": text_surprisal,
        "text_bigram_lm": text_bigram_lm,
        "text_importance": text_importance,
        "tok_bpe_pairs": tok_bpe_pairs,
        "graph_anchor_texts": graph_anchor_texts,
        "graph_transition_edges": graph_transition_edges,
        "graph_pagerank": graph_pagerank,
        "graph_hits": graph_hits,
        "text_length_histogram": text_length_histogram,
        "text_binned_quantiles": text_binned_quantiles,
        "text_corpus_pivot": text_corpus_pivot,
        "text_gopher_filter": text_gopher_filter,
        "text_c4_clean": text_c4_clean,
        "text_line_dedup": text_line_dedup,
        "text_pack_sequences": text_pack_sequences,
        "dedup_winnow": dedup_winnow,
        "dedup_substring_spans": dedup_substring_spans,
        "text_dup_span_stats": text_dup_span_stats,
        "text_chunk_tokens": text_chunk_tokens,
        "search_postings": search_postings,
        "search_conjunctive": search_conjunctive_q,
        "search_topk": search_topk_q,
        "search_bm25": search_bm25_q,
        "ann_cosine_topk": ann_cosine_topk,
        "ann_topk_quantized": ann_topk_quantized,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_minhash_pregroup": dedup_minhash_pregroup,
        "dedup_clusters": dedup_clusters,
        "dedup_simhash": dedup_simhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_embedding_cosine": dedup_embedding_cosine,
        "dedup_embedding_lsh": dedup_embedding_lsh,
        "ann_lsh_buckets": ann_lsh_buckets,
        "multimodal_meta": multimodal_meta,
        "multimodal_audio": multimodal_audio,
        "multimodal_frames": multimodal_frames,
        "multimodal_resize": multimodal_resize,
        "multimodal_phash_dedup": multimodal_phash_dedup,
        "multimodal_phash_jpeg_dedup": multimodal_phash_jpeg_dedup,
        "multimodal_phash_near": multimodal_phash_near,
        "multimodal_audio_fp": multimodal_audio_fp,
        "multimodal_audio_fp_dedup": multimodal_audio_fp_dedup,
        "multimodal_mp3_meta": multimodal_mp3_meta,
        "multimodal_mp4_samples": multimodal_mp4_samples,
        "multimodal_pdf_text": multimodal_pdf_text,
        "feed_parse_entries": feed_parse_entries,
        "feed_discover_links": feed_discover_links,
        "warc_parse_records": warc_parse_records,
        "warc_cdx_index": warc_cdx_index,
        "warc_wet_extract": warc_wet_extract,
        "warc_wat_links": warc_wat_links,
        "events_sessionize": events_sessionize,
        "events_session_stats": events_session_stats,
        "events_tumbling": events_tumbling,
        "events_sliding": events_sliding,
        "sketch_hll_users": sketch_hll_users,
        "sketch_cms_topk": sketch_cms_topk,
        "sketch_kmv_users": sketch_kmv_users,
        "dedup_incremental": dedup_incremental,
        "sample_corpus_mix": sample_corpus_mix,
        "text_epoch_shuffle": text_epoch_shuffle,
        "export_manifest": export_manifest,
        "text_page_metadata": text_page_metadata,
        "text_page_jsonld": text_page_jsonld,
        "crawl_charset_decode": crawl_charset_decode,
        "r8_yield_budget": r8_yield_budget,
        "lake_zorder_key": lake_zorder_key,
        "lake_compaction_plan": lake_compaction_plan,
        "lake_compaction_stats": lake_compaction_stats,
        "skew_hot_keys": skew_hot_keys,
        "skew_partition_load": skew_partition_load,
        "text_html_blocks": text_html_blocks,
        "text_main_content": text_main_content,
        "dedup_semantic": dedup_semantic,
        "crawl_change_rate": crawl_change_rate,
        "crawl_recrawl_topk": crawl_recrawl_topk,
        "crawl_trap_signals": crawl_trap_signals,
        "crawl_trap_hosts": crawl_trap_hosts,
        "crawl_diff": crawl_diff_q,
        "crawl_diff_stats": crawl_diff_stats_q,
        "events_asof_join": events_asof_join,
        "events_range_join": events_range_join,
        "crawl_redirects": crawl_redirects,
        "sample_stratified": sample_stratified_q,
        "sample_split_assign": sample_split_assign,
        "doc_length_stats": doc_length_stats,
        "pipeline_clean_corpus": pipeline_clean_corpus,
    }


_GRAPH_NODE = "'h' || (event_id % 32)"


def oracle_sql() -> dict[str, str]:
    from spider_spark.analysis import boilerplate as BP
    from spider_spark.analysis import export as EX
    from spider_spark.analysis import freshness as FR
    from spider_spark.analysis import oracles as O
    from spider_spark.analysis import packing as PK
    from spider_spark.analysis import sampling as SA
    from spider_spark.analysis import sessions as SS
    from spider_spark.analysis import sketches as K
    from spider_spark.analysis import snapshots as SN
    from spider_spark.analysis import windows as WN
    from spider_spark.analysis import trapdetect as TD
    from spider_spark.operators import asof as AJ
    from spider_spark.operators import politeness as PO
    from spider_spark.operators import rangejoin as RJ
    from spider_spark.operators import redirects as RD
    from spider_spark.analysis import similarity as S
    from spider_spark.analysis import metadata as MDX
    from spider_spark.analysis import skew as SK
    from spider_spark.analysis import text as T
    from spider_spark import lake as LK

    url = _URL_SQL
    page = _PAGE_SQL
    _DOC_INV_SQL = (
        "(SELECT lang AS partition, CAST(doc_id AS VARCHAR) AS path, "
        "n_chars AS size_bytes FROM documents) inv"
    )
    return {
        "r1_seed_scan": """
            SELECT CAST(r_regionkey AS BIGINT) AS source_id, r_name AS name,
                   'https://' || lower(replace(r_name, ' ', '-'))
                   || '.example.com' AS seed_url
            FROM region
        """,
        "r5_inflight_dedup": f"""
            SELECT event_id, url FROM (
                SELECT event_id, {page} AS url FROM events
                WHERE event_type = 'view') c
            WHERE NOT EXISTS (
                SELECT 1 FROM events e WHERE e.event_type = 'click'
                  AND {page.replace('user_id', 'e.user_id').replace('event_id', 'e.event_id')} = c.url)
              AND NOT EXISTS (
                SELECT 1 FROM events e WHERE e.event_type = 'purchase'
                  AND {page.replace('user_id', 'e.user_id').replace('event_id', 'e.event_id')} = c.url)
        """,
        "r7_fifo_rank": """
            SELECT CAST(user_id AS VARCHAR) AS user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rk
            FROM events
        """,
        "r14_link_pipeline": f"""
            SELECT event_id, link FROM (
                SELECT event_id,
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(
                               CASE WHEN event_id % 17 = 0 THEN 'not a url'
                                    WHEN event_id % 13 = 0 THEN {url} || '/warenkorb'
                                    WHEN event_id % 19 = 0 THEN {url} || '/'
                                    ELSE {url} END,
                               '#.*$', ''),
                             ';jsessionid=[^/?#]*', ''),
                           '\\?nn=1&', '?'),
                         '/$', '') AS link
                FROM events)
            WHERE regexp_matches(link,
                '^(https?|ftp)://([A-Za-z0-9-]+\\.)+[A-Za-z]{{2,}}(:[0-9]{{1,5}})?(/[^ ]*)?$')
              AND NOT contains(link, '!search?')
              AND NOT contains(link, '/SiteGlobals/Forms/')
              AND NOT contains(link, '?show=image')
              AND NOT regexp_matches(link, '/warenkorb|/addToCart')
        """,
        "r18_index_upsert": f"""
            SELECT url, first_event_id FROM (
                SELECT url, event_id AS first_event_id,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY ts, event_id) AS _k
                FROM (SELECT *, {page} AS url FROM events)) f
            WHERE _k = 1
              AND NOT EXISTS (
                SELECT 1 FROM events e WHERE e.event_id % 5 = 0
                  AND {page.replace('user_id', 'e.user_id').replace('event_id', 'e.event_id')} = f.url)
        """,
        "r19_robots_parse": """
            -- independent replica of the expected REP parse per template:
            -- 0 specific group (2 rules, longest='/s/K/ok' allow)
            -- 1 wildcard group (2 rules, longest='/aK')
            -- 2 disallow-all  3 empty-disallow→allow_all
            -- 4 crawl-delay+sitemaps+anchored rule  5 garbage→fail-open
            SELECT doc_id,
                   CASE doc_id % 6 WHEN 2 THEN 'rules' WHEN 3 THEN 'allow_all'
                        WHEN 5 THEN 'allow_all' ELSE 'rules' END AS mode,
                   CAST(CASE doc_id % 6 WHEN 0 THEN 2 WHEN 1 THEN 2
                        WHEN 2 THEN 1 WHEN 3 THEN 0 WHEN 4 THEN 1
                        ELSE 0 END AS BIGINT) AS n_rules,
                   CASE doc_id % 6
                        WHEN 0 THEN '/s/' || (doc_id % 50) || '/ok'
                        WHEN 1 THEN '/a' || (doc_id % 50)
                        WHEN 2 THEN '/'
                        WHEN 4 THEN '/x*y$'
                        ELSE NULL END AS top_rule,
                   CASE doc_id % 6 WHEN 4 THEN 1.5 ELSE NULL END AS crawl_delay,
                   CAST(CASE doc_id % 6 WHEN 4 THEN 2 ELSE 0 END AS BIGINT)
                       AS n_sitemaps
            FROM documents
        """,
        "r20_robots_gate": """
            -- same fixed ruleset as an explicit precedence ladder
            -- (longest-match-wins; allow beats disallow only via length
            -- here): /d/ok/no(8,deny) > /exact$(7,deny) > /d/ok(5,allow)
            -- > /w*z(4,allow) > /d(2,deny); closed.org denies all,
            -- open.org is absent from the table → fail-open
            WITH g AS (
                SELECT doc_id,
                       CASE doc_id % 3 WHEN 0 THEN 'ex.org'
                            WHEN 1 THEN 'closed.org' ELSE 'open.org'
                       END AS host,
                       CASE doc_id % 8
                            WHEN 0 THEN '/d/' || (doc_id % 50)
                            WHEN 1 THEN '/d/ok/' || (doc_id % 50)
                            WHEN 2 THEN '/d/ok/no/' || (doc_id % 50)
                            WHEN 3 THEN '/w' || (doc_id % 50) || 'z'
                            WHEN 4 THEN '/w' || (doc_id % 50) || 'za'
                            WHEN 5 THEN '/exact'
                            WHEN 6 THEN '/exact/' || (doc_id % 50)
                            ELSE '/other/' || (doc_id % 50) END AS path
                FROM documents)
            SELECT doc_id, host, 'https://' || host || path AS url,
                   CASE host
                        WHEN 'closed.org' THEN FALSE
                        WHEN 'open.org' THEN TRUE
                        ELSE CASE
                            WHEN path LIKE '/d/ok/no%' THEN FALSE
                            WHEN path = '/exact' THEN FALSE
                            WHEN path LIKE '/d/ok%' THEN TRUE
                            WHEN regexp_matches(path, '^/w.*z') THEN TRUE
                            WHEN path LIKE '/d%' THEN FALSE
                            ELSE TRUE END
                   END AS allowed
            FROM g
        """,
        "r21_sitemap_expand": """
            WITH RECURSIVE reach(node, depth) AS (
                SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
                UNION ALL
                SELECT e.child, r.depth + 1
                FROM reach r
                JOIN (SELECT event_id AS child, event_id // 2 AS parent
                      FROM events WHERE event_id >= 2) e
                  ON e.parent = r.node
                WHERE r.depth < 8
            )
            SELECT node, depth FROM reach
        """,
        "r27_run_stats": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   count(*) AS n_fetches,
                   count(DISTINCT user_id) AS n_hosts,
                   count(*) FILTER (WHERE event_type = 'error') AS n_errors,
                   CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                       AS total_value
            FROM events GROUP BY 1
        """,
        "r28_scrape_sanity": f"""
            SELECT user_id, count(*) AS n_indexed,
                   count(*) FILTER (WHERE s.url IS NULL) AS n_unscheduled
            FROM (SELECT DISTINCT user_id, {page} AS url FROM events
                  WHERE event_type = 'purchase') i
            LEFT JOIN (SELECT DISTINCT {page} AS url FROM events
                       WHERE value >= 50) s USING (url)
            GROUP BY user_id
        """,
        "dedup_minhash_lsh": O.minhash_lsh_sql(
            "documents", num_hashes=16, bands=8, shingle_w=2
        ),
        "dedup_minhash_pregroup": O.minhash_lsh_pregroup_sql(
            "documents", num_hashes=16, bands=8, shingle_w=2
        ),
        "dedup_clusters": O.duplicate_clusters_sql(
            "documents", num_hashes=16, bands=8, shingle_w=2
        ),
        "dedup_simhash": O.simhash_pairs_sql("documents", max_hamming=8),
        "dedup_ngram_jaccard": O.ngram_jaccard_sql(
            "documents", num_hashes=16, bands=8, shingle_w=2, n=2
        ),
        "dedup_embedding_lsh": O.embedding_lsh_sql(
            S.srp_planes(64, 4), threshold=0.40
        ),
        "ann_lsh_buckets": O.srp_histogram_sql(S.srp_planes(64, 6)),
        "ann_topk_lsh": O.ann_topk_lsh_sql(S.srp_planes(64, 6), k=10),
        "ann_topk_ivf": O.ann_topk_ivf_sql(S.ivf_centroids(64, 8), nprobe=2, k=10),
        "ann_ivf_cells": O.ivf_histogram_sql(S.ivf_centroids(64, 8)),
        "ivf_train_means": O.ivf_means_sql(S.ivf_centroids(64, 8)),
        "multimodal_meta": """
            SELECT media_ref,
                   coalesce(nullif(regexp_extract(media_ref, '^([a-z]+)://', 1),
                                   ''), 'unknown') AS media_kind,
                   CAST(0 AS BIGINT) AS n_bytes,
                   sha256(media_ref) AS sha256
            FROM (SELECT 'img://' || CAST(event_id AS VARCHAR) AS media_ref
                  FROM events)
        """,
        # independent replica of decode_audio_features over synth_wav: every
        # decoded feature of the square wave is closed-form in event_id
        # (media_fixtures.wav_params) — amp=((id%16)+1)*1024 is rms==peak
        # (x32768), alternating signs give n-1 zero crossings
        "multimodal_audio": """
            SELECT 'wav://' || CAST(event_id AS VARCHAR) AS media_ref,
                   CAST(8 + (event_id % 5) * 4 AS INT) AS n_samples,
                   CAST(8000 + (event_id % 3) * 4000 AS INT) AS sample_rate,
                   CAST(1 AS INT) AS n_channels,
                   CAST(((event_id % 16) + 1) * 1024 AS BIGINT) AS rms_x32768,
                   CAST(((event_id % 16) + 1) * 1024 AS BIGINT) AS peak_x32768,
                   CAST(8 + (event_id % 5) * 4 - 1 AS BIGINT) AS zero_crossings,
                   CAST(NULL AS VARCHAR) AS err
            FROM events
        """,
        # replica of sample_video_frames(stride=2) over synth_frames:
        # n_frames = 3 + id%4, fps=2.0 (ts_milli = idx*500), frame color
        # (id*31 + idx*7) % 251 — sampled indices via unnest(generate_series)
        "multimodal_frames": """
            SELECT media_ref,
                   CAST(i AS INT) AS frame_idx,
                   CAST(i * 500 AS BIGINT) AS ts_milli,
                   CAST(4 AS INT) AS width,
                   CAST(4 AS INT) AS height,
                   CAST((event_id * 31 + i * 7) % 251 AS BIGINT) AS mean_pix,
                   CAST(NULL AS VARCHAR) AS err
            FROM (
                SELECT event_id,
                       'vid://' || CAST(event_id AS VARCHAR) AS media_ref,
                       unnest(generate_series(0, 3 + (event_id % 4) - 1, 2)) AS i
                FROM events WHERE event_id % 2 = 0
            )
        """,
        # replica of resize_image_features over synth_split_image: the
        # half-pixel-center nearest rule maps resized columns 0-1 to the
        # left gray level and 2-3 to the right, so the 2x2 cell means are
        # exactly the two source levels
        "multimodal_resize": """
            SELECT 'img://' || CAST(event_id AS VARCHAR) AS media_ref,
                   CAST(6 + (event_id % 5) * 2 AS INT) AS orig_width,
                   CAST(4 + (event_id % 3) * 2 AS INT) AS orig_height,
                   CAST(4 AS INT) AS width,
                   CAST(4 AS INT) AS height,
                   CAST((event_id * 3) % 251 AS BIGINT) AS f00,
                   CAST((event_id * 7) % 251 AS BIGINT) AS f01,
                   CAST((event_id * 3) % 251 AS BIGINT) AS f10,
                   CAST((event_id * 7) % 251 AS BIGINT) AS f11,
                   CAST(NULL AS VARCHAR) AS err
            FROM events
        """,
        "multimodal_phash_dedup": """
            WITH h AS (
              SELECT 'img://' || CAST(event_id AS VARCHAR) AS media_ref,
                     (((event_id % 23) * 5) % 251) * 16777216
                       + (((event_id % 23) * 11 + 3) % 251) * 65536
                       + (((event_id % 23) * 17 + 7) % 251) * 256
                       + (((event_id % 23) * 23 + 13) % 251) AS phash
              FROM events
            )
            SELECT media_ref, CAST(phash AS BIGINT) AS phash,
                   min(media_ref) OVER (PARTITION BY phash) AS rep_ref,
                   media_ref <> min(media_ref) OVER (PARTITION BY phash)
                     AS is_dup
            FROM h
        """,
        "multimodal_phash_jpeg_dedup": """
            WITH t AS (
              SELECT 'img://' || CAST(event_id AS VARCHAR) AS media_ref,
                     event_id % 23 AS g
              FROM events
            )
            SELECT media_ref,
                   min(media_ref) OVER (PARTITION BY g) AS rep_ref,
                   media_ref <> min(media_ref) OVER (PARTITION BY g)
                     AS is_dup
            FROM t
        """,
        "multimodal_phash_near": """
            WITH c AS (
              SELECT 'img://' || CAST(event_id AS VARCHAR) AS media_ref,
                     ((event_id % 150) * 5) % 251 AS c0,
                     ((event_id % 150) * 11 + 3) % 251 AS c1,
                     ((event_id % 150) * 17 + 7) % 251 AS c2,
                     ((event_id % 150) * 23 + 13) % 251
                       + ((event_id // 150) % 2) AS c3
              FROM events WHERE event_id < 600
            ),
            h AS (
              SELECT media_ref,
                     ((c0 * 256 + c1) * 256 + c2) * 256 + c3 AS phash,
                     c0, c1, c2, c3
              FROM c
            ),
            b AS (
              SELECT media_ref, phash, 0 AS band,
                     c1 || ',' || c2 || ',' || c3 AS key FROM h
              UNION ALL
              SELECT media_ref, phash, 1,
                     c0 || ',' || c2 || ',' || c3 FROM h
              UNION ALL
              SELECT media_ref, phash, 2,
                     c0 || ',' || c1 || ',' || c3 FROM h
              UNION ALL
              SELECT media_ref, phash, 3,
                     c0 || ',' || c1 || ',' || c2 FROM h
            )
            SELECT l.media_ref AS id_l, r.media_ref AS id_r,
                   CAST(max(3 + CASE WHEN l.phash = r.phash
                                     THEN 1 ELSE 0 END) AS INT)
                     AS n_equal_cells
            FROM b l JOIN b r
              ON l.band = r.band AND l.key = r.key
                 AND l.media_ref < r.media_ref
            GROUP BY l.media_ref, r.media_ref
        """,
        # replica of audio_fingerprint over synth_fp_wav: frame-t
        # amplitude a(t) = 256*(1 + ((g*(t+2) + t) % 11)) with
        # g = id % 37, nf = 8 + g%5 frames; energies are 8*(k*a)² so
        # bit t = [a(t+1) > a(t)] (the volume scale k cancels); packed
        # | nf<<56 (media_fixtures.fp_wav_params)
        "multimodal_audio_fp": """
            WITH ev AS (
              SELECT event_id AS id, event_id % 37 AS g,
                     8 + (event_id % 37) % 5 AS nf
              FROM events
            ),
            b AS (
              SELECT id, nf,
                     CASE WHEN (1 + ((g * (t + 3) + t + 1) % 11))
                            > (1 + ((g * (t + 2) + t) % 11))
                          THEN 1::BIGINT << t ELSE 0 END AS bit
              FROM ev
              JOIN (SELECT unnest(generate_series(0, 11)) AS t) s
                ON s.t < nf - 1
            )
            SELECT 'afp://' || id AS media_ref,
                   CAST(sum(bit) + (max(nf)::BIGINT << 56) AS BIGINT)
                     AS afp,
                   CAST(max(nf) AS INT) AS n_frames,
                   CAST(NULL AS VARCHAR) AS err
            FROM b GROUP BY id
        """,
        # same fingerprint computed in SQL, then the min-ref-per-group
        # window — grouping by the fp VALUE, so any cross-group
        # collision matches the engine exactly
        "multimodal_audio_fp_dedup": """
            WITH ev AS (
              SELECT event_id AS id, event_id % 37 AS g,
                     8 + (event_id % 37) % 5 AS nf
              FROM events
            ),
            b AS (
              SELECT id, nf,
                     CASE WHEN (1 + ((g * (t + 3) + t + 1) % 11))
                            > (1 + ((g * (t + 2) + t) % 11))
                          THEN 1::BIGINT << t ELSE 0 END AS bit
              FROM ev
              JOIN (SELECT unnest(generate_series(0, 11)) AS t) s
                ON s.t < nf - 1
            ),
            fp AS (
              SELECT 'afp://' || id AS media_ref,
                     sum(bit) + (max(nf)::BIGINT << 56) AS afp
              FROM b GROUP BY id
            )
            SELECT media_ref,
                   min(media_ref) OVER (PARTITION BY afp) AS rep_ref,
                   media_ref <> min(media_ref) OVER (PARTITION BY afp)
                     AS is_dup
            FROM fp
        """,
        # replica of decode_mp3_features over synth_mp3: n = 3 + id%5
        # frames at 44.1 kHz; odd ids alternate 128/192 kbps from 128
        # (so floor(n/2) frames carry 192), even ids constant 128 —
        # bitrate_avg is the parser's integer mean, duration the Layer-
        # III 1152-samples-per-frame arithmetic (media_fixtures.mp3_params)
        "multimodal_mp3_meta": """
            SELECT 'mp3://' || CAST(event_id AS VARCHAR) AS media_ref,
                   CAST(3 + event_id % 5 AS INT) AS n_frames,
                   CAST(44100 AS INT) AS sample_rate,
                   CAST(CASE WHEN event_id % 2 = 1 THEN
                          (128 * ((3 + event_id % 5)
                                  - (3 + event_id % 5) // 2)
                           + 192 * ((3 + event_id % 5) // 2))
                          // (3 + event_id % 5)
                        ELSE 128 END AS INT) AS bitrate_avg,
                   CAST(event_id % 2 AS INT) AS vbr_int,
                   CAST((3 + event_id % 5) * 1152 * 1000 // 44100
                        AS BIGINT) AS duration_ms,
                   CAST(NULL AS VARCHAR) AS err
            FROM events
        """,
        # replica of sample_mp4_payloads(stride=2) over synth_mp4:
        # sampled indices k = 0,2,4,6 below n_samples = 2 + id%6; sample
        # k is 3+((id+7k) mod 9) bytes of the constant value
        # (id+11k) mod 251 at timestamp 40k ms (media_fixtures.mp4_params)
        "multimodal_mp4_samples": """
            SELECT 'mp4://' || CAST(e.event_id AS VARCHAR) AS media_ref,
                   CAST(g.k AS INT) AS sample_idx,
                   CAST(g.k * 40 AS BIGINT) AS ts_milli,
                   CAST(3 + (e.event_id + 7 * g.k) % 9 AS INT) AS n_bytes,
                   CAST((e.event_id + 11 * g.k) % 251 AS INT) AS byte_val,
                   CAST(NULL AS VARCHAR) AS err
            FROM events e
            JOIN (SELECT unnest(generate_series(0, 6, 2)) AS k) g
              ON g.k < 2 + e.event_id % 6
            WHERE e.event_id % 5 = 0
        """,
        # replica of discover_feed_links over feedlink_page_expr:
        # output rebuilt closed-form (rss on %3==0 type-first, atom on
        # %3==1 href-first, both on %15==0)
        "feed_discover_links": """
            SELECT doc_id, 'rss' AS feed_kind,
                   'http://f' || (doc_id % 7) || '.example.org/rss/'
                     || doc_id AS feed_url
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id, 'atom' AS feed_kind,
                   'http://f' || (doc_id % 7) || '.example.org/atom/'
                     || doc_id AS feed_url
            FROM documents WHERE doc_id % 3 = 1 OR doc_id % 15 = 0
        """,
        # replica of feed_entries over synth_feeds: Atom on even ids,
        # RSS on odd, 1 + id%4 entries, every field closed-form in
        # (event_id, k) (sources/feeds.feed_fix_xml)
        "feed_parse_entries": """
            SELECT 'feed://' || event_id AS ref,
                   CASE WHEN event_id % 2 = 0
                        THEN 'atom' ELSE 'rss' END AS kind,
                   CAST(g.k AS INT) AS entry_idx,
                   'Post ' || event_id || '.' || g.k AS title,
                   'http://f' || (event_id % 7) || '.example.org/'
                     || CASE WHEN event_id % 2 = 0
                             THEN 'a' ELSE 'r' END
                     || '/' || event_id || '/' || g.k AS link,
                   CASE WHEN event_id % 2 = 0
                        THEN '2024-01-'
                          || lpad(CAST(1 + (event_id + g.k) % 28
                                       AS VARCHAR), 2, '0')
                          || 'T00:00:00Z'
                        ELSE 'Mon, '
                          || lpad(CAST(1 + (event_id + g.k) % 28
                                       AS VARCHAR), 2, '0')
                          || ' Jan 2024 00:00:00 GMT'
                   END AS published,
                   'urn:e:' || event_id || ':' || g.k AS guid
            FROM events
            JOIN (SELECT unnest(generate_series(0, 3)) AS k) g
              ON g.k < 1 + event_id % 4
        """,
        # replica of decode_pdf_pages over synth_pdf: 1 + id%3 pages,
        # page j's text is the Tj line + newline + the TJ concat
        # (pdfdoc.pdf_fix_pages)
        "multimodal_pdf_text": """
            SELECT 'pdf://' || event_id AS media_ref,
                   CAST(g.j AS INT) AS page_idx,
                   '1.4' AS version,
                   CAST(1 + event_id % 3 AS INT) AS n_pages,
                   'Doc ' || event_id || ' page ' || g.j || ' (pdf)'
                     || chr(10) || 'A' || event_id || 'B' || g.j
                     AS page_text,
                   CAST(NULL AS VARCHAR) AS err
            FROM events
            JOIN (SELECT unnest(generate_series(0, 2)) AS j) g
              ON g.j < 1 + event_id % 3
        """,
        # replica of read_warc_records over synth_warc: 1 + id%3
        # response records per blob (rec_idx j+1 after the warcinfo),
        # url/status/date closed-form, body = repeat('doc id j ',
        # 3+(id+j)%7) rebuilt in SQL so body_len is just length()
        # (sources/warc.warc_params)
        "warc_parse_records": """
            SELECT 'warc://' || event_id AS ref,
                   CAST(g.j + 1 AS INT) AS rec_idx,
                   'http://w' || (event_id % 7) || '.example.org/p/'
                     || event_id || '/' || g.j AS url,
                   CAST(CASE WHEN (event_id + g.j) % 5 = 0
                             THEN 404 ELSE 200 END AS INT) AS http_status,
                   'text/html' AS mime,
                   CAST(length(repeat('doc ' || event_id || ' ' || g.j
                                      || ' ', 3 + (event_id + g.j) % 7))
                        AS BIGINT) AS body_len,
                   strftime(epoch_ms((1700000000 + event_id * 60 + g.j)
                                     * 1000),
                            '%Y-%m-%dT%H:%M:%SZ') AS warc_date
            FROM events
            JOIN (SELECT unnest(generate_series(0, 2)) AS j) g
              ON g.j < 1 + event_id % 3
        """,
        # replica of cdx_index: SURT key of the fixture url, digit-only
        # 14-char timestamp, sha-256 of the SQL-reconstructed body
        "warc_cdx_index": """
            SELECT 'org,example,w' || (event_id % 7) || ')/p/'
                     || event_id || '/' || g.j AS urlkey,
                   strftime(epoch_ms((1700000000 + event_id * 60 + g.j)
                                     * 1000), '%Y%m%d%H%M%S') AS ts14,
                   'http://w' || (event_id % 7) || '.example.org/p/'
                     || event_id || '/' || g.j AS url,
                   'text/html' AS mime,
                   CAST(CASE WHEN (event_id + g.j) % 5 = 0
                             THEN 404 ELSE 200 END AS INT) AS http_status,
                   sha256(repeat('doc ' || event_id || ' ' || g.j || ' ',
                                 3 + (event_id + g.j) % 7)) AS digest
            FROM events
            JOIN (SELECT unnest(generate_series(0, 2)) AS j) g
              ON g.j < 1 + event_id % 3
        """,
        # replica of to_wet over synth_warc_html: the tag-stripped text
        # of the closed-form page is 't id doc id text l0 .. l{id%4}';
        # 404 captures (id%5==0) fail the conversion gate on both sides
        "warc_wet_extract": """
            SELECT 'http://w' || (event_id % 7) || '.example.org/p/'
                     || event_id AS url,
                   strftime(epoch_ms((1700000000 + event_id * 60)
                                     * 1000),
                            '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
                   't ' || event_id || ' doc ' || event_id || ' text '
                     || array_to_string(
                          list_transform(
                            generate_series(0, event_id % 4),
                            k -> 'l' || k),
                          ' ') AS text
            FROM events
            WHERE event_id % 5 != 0
        """,
        # replica of to_wat: title / outlink list / body length all
        # rebuilt arithmetically from the closed-form page markup
        "warc_wat_links": """
            SELECT 'http://w' || (event_id % 7) || '.example.org/p/'
                     || event_id AS url,
                   strftime(epoch_ms((1700000000 + event_id * 60)
                                     * 1000),
                            '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
                   CAST(CASE WHEN event_id % 5 = 0
                             THEN 404 ELSE 200 END AS INT)
                     AS http_status,
                   't ' || event_id AS title,
                   array_to_string(
                     list_transform(
                       generate_series(0, event_id % 4),
                       k -> 'http://w' || ((event_id + k) % 7)
                            || '.example.org/p/' || event_id || '/'
                            || k),
                     ' ') AS links_cat,
                   CAST(1 + event_id % 4 AS INT) AS n_links,
                   CAST(length(
                     '<html><head><title>t ' || event_id
                     || '</title></head><body><p>doc ' || event_id
                     || ' text</p> '
                     || array_to_string(
                          list_transform(
                            generate_series(0, event_id % 4),
                            k -> '<a href="http://w'
                                 || ((event_id + k) % 7)
                                 || '.example.org/p/' || event_id
                                 || '/' || k || '">l' || k || '</a>'),
                          ' ')
                     || '</body></html>') AS BIGINT) AS body_len
            FROM events
        """,
        "crawl_change_rate": FR.change_rate_sql(
            f"SELECT {_PAGE_SQL} AS url, ts, event_id, event_type AS fp "
            "FROM events"
        ),
        "crawl_recrawl_topk": FR.recrawl_topk_sql(
            f"SELECT {_PAGE_SQL} AS url, ts, event_id, event_type AS fp "
            "FROM events",
            "split_part(split_part(url, '//', 2), '/', 1)",
            k=7,
        ),
        "crawl_trap_signals": TD.trap_signals_sql(
            f"SELECT {_trap_url('VARCHAR')} AS url FROM events"
        ),
        "crawl_trap_hosts": TD.trap_hosts_sql(
            f"SELECT {_trap_url('VARCHAR')} AS url FROM events"
        ),
        "crawl_diff": SN.crawl_diff_sql(
            _snap_sql("VARCHAR", "old"), _snap_sql("VARCHAR", "new")
        ),
        "crawl_diff_stats": SN.diff_stats_sql(
            _snap_sql("VARCHAR", "old"), _snap_sql("VARCHAR", "new")
        ),
        "events_asof_join": (
            "SELECT host, event_id, epoch_us(ts)::BIGINT AS ts_us,"
            " policy, matched_ts_us FROM ("
            + AJ.asof_join_sql(
                "SELECT 'h' || CAST(user_id % 5 AS VARCHAR) AS host, ts,"
                " event_id FROM events",
                "SELECT host, ts, max(policy) AS policy FROM ("
                "SELECT 'h' || CAST(event_id % 5 AS VARCHAR) AS host, ts,"
                " 'p' || CAST(event_id % 91 AS VARCHAR) AS policy"
                " FROM events WHERE event_id % 37 = 0) GROUP BY host, ts",
                key_cols=("host",),
                left_cols=("host", "ts", "event_id"),
                value_cols=("policy",),
                tolerance_us=600_000_000,
            )
            + ")"
        ),
        "crawl_redirects": RD.resolve_redirects_sql(
            """
            SELECT 'u' || doc_id::VARCHAR AS src,
                   CASE WHEN doc_id % 16 IN (0, 1, 2)
                          THEN 'u' || (doc_id + 1)::VARCHAR
                        WHEN doc_id % 16 = 5
                          THEN 'u' || doc_id::VARCHAR
                        WHEN doc_id % 16 = 8
                          THEN 'u' || (doc_id + 1)::VARCHAR
                        WHEN doc_id % 16 = 9
                          THEN 'u' || (doc_id - 1)::VARCHAR
                        WHEN doc_id % 16 = 12
                          THEN 'u' || (doc_id + 1000000)::VARCHAR
                   END AS dst
            FROM documents
            WHERE doc_id % 16 IN (0, 1, 2, 5, 8, 9, 12)
            """,
            max_hops=20,
        ),
        "events_range_join": f"""
            WITH ivs AS ({RJ.synth_intervals_sql(200)}),
                 ev AS (SELECT event_id, epoch_us(ts)::BIGINT AS ts_us
                        FROM events)
            SELECT interval_id, count(*)::BIGINT AS n_events,
                   sum(event_id)::BIGINT AS sum_event_id
            FROM ev JOIN ivs ON ts_us BETWEEN lo_us AND hi_us
            GROUP BY interval_id
        """,
        "events_sessionize": SS.sessionize_sql("events", gap_minutes=30),
        "events_session_stats": SS.session_stats_sql(
            "events", gap_minutes=30
        ),
        "events_tumbling": WN.tumbling_sql("events", width_s=3600),
        "events_sliding": WN.sliding_sql(
            "events", width_s=3600, slide_s=900
        ),
        "sketch_hll_users": K.hll_sql(
            "events", "user_id", ("event_type",), p=6
        ),
        "sketch_cms_topk": K.cms_sql(
            "events", "user_id", k=20, depth=4, width=256
        ),
        "sketch_kmv_users": K.kmv_sql(
            "events", "user_id", ("event_type",), k=64
        ),
        "text_epoch_shuffle": PK.epoch_shuffle_sql(
            "documents", 3, 16
        ),
        "export_manifest": EX.shard_manifest_sql("documents", 16),
        "text_page_metadata": MDX.page_metadata_sql(
            "documents", MDX.metadata_page_duckdb()
        ),
        "text_page_jsonld": MDX.jsonld_extract_sql(
            "documents", MDX.jsonld_page_duckdb()
        ),
        # replica of crawl_charset_decode: charset route and decoded
        # text are both closed-form in the doc id (functions/charset
        # _FIX_MODES rotation); non-ASCII literals are UTF-8 SQL text
        "crawl_charset_decode": """
            SELECT doc_id,
                   CASE doc_id % 5
                     WHEN 0 THEN 'utf-8'
                     WHEN 1 THEN 'utf-16-le'
                     WHEN 2 THEN 'latin-1'
                     WHEN 3 THEN 'cp1252'
                     ELSE 'utf-8' END AS charset,
                   CASE
                     WHEN doc_id % 5 IN (2, 3) THEN
                       '<html><head><meta charset="'
                       || CASE doc_id % 5 WHEN 2 THEN 'latin-1'
                                          ELSE 'cp1252' END
                       || '"></head><body>héllo wörld ' || doc_id
                       || ' dès ünïcode</body></html>'
                     ELSE 'héllo wörld ' || doc_id || ' dès ünïcode'
                   END AS text
            FROM documents
        """,
        "r8_yield_budget": PO.yield_budgets_sql(
            "(SELECT event_type AS host, count(*) AS fetched, "
            "count(DISTINCT user_id) AS new_urls FROM events GROUP BY 1) st",
            1000,
            2,
        ),
        "lake_zorder_key": (
            "SELECT event_id, "
            + LK.zorder_key_sql(["user_id", "event_id"], 14, "duckdb")
            + " AS zkey FROM events"
        ),
        "lake_compaction_plan": LK.compaction_plan_sql(
            _DOC_INV_SQL, 400
        ),
        "lake_compaction_stats": LK.compaction_stats_sql(
            LK.compaction_plan_sql(_DOC_INV_SQL, 400)
        ),
        "skew_hot_keys": SK.hot_keys_sql(
            "documents", "lang", 16, "(SELECT count(*) FROM documents)"
        ),
        "skew_partition_load": SK.partition_load_sql(
            "events", "event_type", 16, "(SELECT count(*) FROM events)"
        ),
        "dedup_semantic": O.semdedup_sql(
            S.ivf_centroids(64, 8),
            """(
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 100000, embedding FROM embeddings
              WHERE vec_id % 7 = 0
            )""",
            900_000,
        ),
        "text_html_blocks": BP.html_blocks_sql(
            "documents", BP.synth_page_duckdb()
        ),
        "text_main_content": BP.main_content_sql(
            "documents", BP.synth_page_duckdb()
        ),
        "sample_corpus_mix": SA.mix_sample_sql(
            "documents",
            {"en": 600000, "de": 250000, "es": 150000},
            total_n=300,
        ),
        "dedup_incremental": O.incremental_dedup_sql(
            "SELECT * FROM documents WHERE doc_id % 4 = 0",
            "SELECT * FROM documents WHERE doc_id % 4 != 0",
            num_hashes=16,
            bands=8,
            shingle_w=2,
        ),
        "sample_stratified": SA.sample_stratified_sql(
            "documents", n_per_stratum=5
        ),
        "doc_length_stats": SA.length_stats_sql("documents"),
        "sample_split_assign": SA.split_assign_sql(
            "documents", val_permille=25, test_permille=50
        ),
        "pipeline_clean_corpus": O.clean_corpus_sql(
            "documents", num_hashes=16, bands=8, shingle_w=2
        ),
        "r2_host_extract": f"""
            SELECT regexp_extract({url}, '^[a-z]+://([^/?#]+)', 1) AS host,
                   count(*) AS n_urls
            FROM events GROUP BY 1
        """,
        "r3_namespace_semijoin": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_nationkey IN (
                SELECT n_nationkey FROM nation
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE')
        """,
        "r4_seen_antijoin": """
            SELECT c_custkey, c_acctbal FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
        """,
        "r4_seen_bloom": f"""
            WITH u AS (SELECT {url} AS url, event_id FROM events)
            SELECT DISTINCT url FROM u
            WHERE url NOT IN (SELECT url FROM u WHERE event_id % 2 = 0)
        """,
        "r4_seen_cuckoo": f"""
            WITH u AS (SELECT {url} AS url, event_id FROM events)
            SELECT DISTINCT url FROM u
            WHERE url NOT IN (SELECT url FROM u WHERE event_id % 2 = 0)
        """,
        "r6_visit_counts": """
            SELECT o_custkey, count(*) AS visits,
                   round(max(o_totalprice), 2) AS max_price
            FROM orders GROUP BY o_custkey
        """,
        "r8_politeness_topk": """
            SELECT o_custkey, o_orderkey, rn FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS rn
                FROM orders) WHERE rn <= 3
        """,
        "r8_priority_topk": f"""
            SELECT host, seq, rn FROM (
                SELECT CAST(user_id AS VARCHAR) AS host,
                       CAST(event_id AS BIGINT) AS seq,
                       CAST(row_number() OVER (
                            PARTITION BY user_id
                            ORDER BY length({url}), event_id) AS BIGINT) AS rn
                FROM events)
            WHERE rn <= 3
        """,
        "r8_delay_budget": """
            SELECT host, seq, rn FROM (
                SELECT CAST(user_id AS VARCHAR) AS host,
                       CAST(event_id AS BIGINT) AS seq,
                       1 + (user_id % 4) AS b,
                       CAST(row_number() OVER (
                            PARTITION BY user_id
                            ORDER BY event_id) AS BIGINT) AS rn
                FROM events)
            WHERE rn <= b
        """,
        "r8_delay_skip": """
            SELECT host, seq, rn FROM (
                SELECT CAST(user_id AS VARCHAR) AS host,
                       CAST(event_id AS BIGINT) AS seq,
                       CASE WHEN (1 + user_id % 4) > 1
                                 AND (2 % (1 + user_id % 4)) != 0
                            THEN 0 ELSE 2 END AS b,
                       CAST(row_number() OVER (
                            PARTITION BY user_id
                            ORDER BY event_id) AS BIGINT) AS rn
                FROM events)
            WHERE rn <= b
        """,
        "r8_backoff_budget": """
            SELECT host, seq, rn FROM (
                SELECT CAST(user_id AS VARCHAR) AS host,
                       CAST(event_id AS BIGINT) AS seq,
                       greatest(1, 4 >> least(user_id % 9, 6)) AS b,
                       CAST(row_number() OVER (
                            PARTITION BY user_id
                            ORDER BY event_id) AS BIGINT) AS rn
                FROM events)
            WHERE rn <= b
        """,
        "r8_indegree_topk": """
            WITH c AS (
                SELECT user_id, event_id % 64 AS k, COUNT(*) AS n
                FROM events GROUP BY 1, 2)
            SELECT host, seq, rn FROM (
                SELECT CAST(e.user_id AS VARCHAR) AS host,
                       CAST(e.event_id AS BIGINT) AS seq,
                       CAST(row_number() OVER (
                            PARTITION BY e.user_id
                            ORDER BY -c.n, e.event_id) AS BIGINT) AS rn
                FROM events e
                JOIN c ON e.user_id = c.user_id AND e.event_id % 64 = c.k)
            WHERE rn <= 3
        """,
        "r8_pagerank_topk": f"""
            SELECT host, seq, rn FROM (
                SELECT CAST(e.user_id AS VARCHAR) AS host,
                       CAST(e.event_id AS BIGINT) AS seq,
                       CAST(row_number() OVER (
                            PARTITION BY e.user_id
                            ORDER BY -coalesce(pr.r, 0), e.event_id)
                            AS BIGINT) AS rn
                FROM events e
                LEFT JOIN ({O.pagerank_int_sql(
                    O.transition_edges_cte("events", _GRAPH_NODE), iters=3
                )}) pr
                  ON pr.node = 'h' || (e.event_id % 32))
            WHERE rn <= 3
        """,
        "r10_fetch_join": """
            SELECT o_orderkey,
                   coalesce(c_name, 'MISSING') AS fetched_name
            FROM orders LEFT JOIN
                 (SELECT * FROM customer WHERE c_custkey % 3 != 0) c
                 ON o_custkey = c_custkey
        """,
        "r15_error_classifier": """
            SELECT event_id,
                   CASE WHEN event_type = 'error' THEN 'retryable'
                        WHEN value < 10 THEN 'drop'
                        WHEN event_type = 'purchase' THEN 'index_no_links'
                        ELSE 'parse' END AS cls
            FROM events
        """,
        "r24_url_validity": f"""
            SELECT event_id, url2 AS valid_url FROM (
                SELECT event_id,
                       CASE WHEN event_id % 17 = 0 THEN 'not a url'
                            ELSE {url} END AS url2
                FROM events)
            WHERE regexp_matches(url2,
                '^(https?|ftp)://([A-Za-z0-9-]+\\.)+[A-Za-z]{{2,}}(:[0-9]{{1,5}})?(/[^ ]*)?$')
        """,
        # independent DuckDB replica of classify.xrobots_noindex: the same
        # case-insensitive map-entry scan + regex, over the same synthesis
        "r11_response_filter": """
            SELECT doc_id FROM (
              SELECT doc_id, coalesce(regexp_matches(lower(
                       list_filter(map_entries(map(['Server', k], ['t', v])),
                                   e -> lower(e.key) = 'x-robots-tag'
                       )[1].value), 'noindex|none'), false) AS noidx
              FROM (SELECT doc_id,
                      CASE doc_id % 4 WHEN 0 THEN 'X-Robots-Tag'
                           WHEN 1 THEN 'x-robots-tag'
                           WHEN 2 THEN 'X-ROBOTS-TAG'
                           ELSE 'X-Other' END AS k,
                      CASE doc_id % 3 WHEN 0 THEN 'noindex, nofollow'
                           WHEN 1 THEN 'NONE' ELSE 'all' END AS v
                    FROM documents) s)
            WHERE NOT noidx
        """,
        # independent replica of classify.response_class's decision tree
        "r12_content_gate": """
            SELECT doc_id,
                   CASE WHEN join_doc IS NULL OR status < 0 THEN 'err'
                        WHEN status != 200 THEN 'bad'
                        WHEN noindex THEN 'noidx'
                        WHEN content_type LIKE 'text/html%' THEN 'html'
                        ELSE 'plain' END AS cls
            FROM (SELECT doc_id,
                    CASE doc_id % 5 WHEN 0 THEN -1 WHEN 1 THEN 404
                         WHEN 2 THEN 301 ELSE 200 END AS status,
                    CASE doc_id % 3 WHEN 0 THEN 'text/html; charset=utf-8'
                         WHEN 1 THEN 'text/plain'
                         ELSE 'application/xhtml+xml' END AS content_type,
                    doc_id % 7 = 0 AS noindex,
                    CASE WHEN doc_id % 11 = 0 THEN NULL
                         ELSE doc_id END AS join_doc
                  FROM documents) s
        """,
        # expected output of the real extract pipeline on the synthesized
        # HTML: abs anchors survive unless robots-blocked (word LIKE 't%')
        # or unwanted (warenkorb); ?nn=5 + #frag cleaned away; relative
        # anchors resolve against the page URL; the /warenkorb and
        # localhost fixtures are dropped by R25/R24; links set-deduped
        "r13_link_extract": """
            WITH base AS (
              SELECT doc_id,
                     list_slice(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       w -> regexp_full_match(w, '[a-z]+')), 1, 3) AS words
              FROM documents
            ), w AS (
              SELECT doc_id, unnest(words) AS word FROM base
            ), links AS (
              SELECT DISTINCT doc_id, link FROM (
                SELECT doc_id, 'https://ex.org/a/' || word AS link FROM w
                 WHERE word NOT LIKE 't%' AND word NOT LIKE 'warenkorb%'
                UNION ALL
                SELECT doc_id, 'https://ex.org/rel/' || word FROM w
                 WHERE word NOT LIKE 'warenkorb%'
                UNION ALL
                SELECT doc_id, 'https://ex.org/always' FROM base
              ) u
            )
            SELECT doc_id, 'https://ex.org/canon' AS canonical_url, link
            FROM links
        """,
        "r16_retry_budget": """
            SELECT user_id, count(*) AS attempts FROM events
            WHERE event_type = 'error' GROUP BY user_id
            HAVING count(*) <= (SELECT avg(n) FROM (
                SELECT count(*) AS n FROM events
                WHERE event_type = 'error' GROUP BY user_id))
        """,
        "r17_canonical_coalesce": """
            SELECT o_orderkey,
                   coalesce(nullif(o_orderpriority, ''), o_orderstatus) AS canon
            FROM orders
        """,
        "r22_url_clean": f"""
            SELECT event_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace({url}, '#.*$', ''),
                       ';jsessionid=[^/?#]*', ''),
                     '\\?nn=1&', '?') AS url_clean
            FROM events
        """,
        "r23_slash_strip": f"""
            SELECT event_id,
                   regexp_replace({url} || '/', '/$', '') AS url_noslash
            FROM events
        """,
        "r25_url_filter": f"""
            SELECT event_id, url2 AS url_wanted FROM (
                SELECT event_id,
                       CASE WHEN event_id % 13 = 0 THEN {url} || '/warenkorb'
                            ELSE {url} END AS url2
                FROM events)
            WHERE NOT contains(url2, '!search?')
              AND NOT contains(url2, '/SiteGlobals/Forms/')
              AND NOT contains(url2, '?show=image')
              AND NOT regexp_matches(url2, '/warenkorb|/addToCart')
        """,
        "r26_round_stats": """
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   count(*) AS n,
                   CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
            FROM events GROUP BY 1, 2
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                                  * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS sum_disc_price,
                   CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6)))
                              / CAST(count(*) AS DECIMAL(18,6)), 4) AS DOUBLE) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                                  * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_orderdate
        """,
        "q_window_running_total": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_total
            FROM orders
        """,
        "q17_small_quantity": """
            SELECT count(*) AS n_lines,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                        AS DOUBLE) AS total_extprice
            FROM lineitem l
            WHERE CAST(l.l_quantity AS BIGINT) * 5 * (
                    SELECT count(*) FROM lineitem i
                    WHERE i.l_partkey = l.l_partkey)
                  < (SELECT sum(CAST(i.l_quantity AS BIGINT))
                     FROM lineitem i
                     WHERE i.l_partkey = l.l_partkey)
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                              * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2)
                        AS DOUBLE) AS revenue
            FROM region, nation, customer, orders, lineitem, supplier
            WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
              AND c_nationkey = n_nationkey AND o_custkey = c_custkey
              AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
              AND s_nationkey = c_nationkey
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n_name
        """,
        "q18_large_orders": """
            SELECT c_name, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2)
                        AS DOUBLE) AS o_totalprice,
                   sum_qty
            FROM (SELECT l_orderkey,
                         sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
                  FROM lineitem GROUP BY 1 HAVING sum_qty > 150) big
            JOIN orders ON o_orderkey = big.l_orderkey
            JOIN customer ON c_custkey = o_custkey
        """,
        "q21_sole_failing_supplier": """
            SELECT s_name, count(*)::BIGINT AS numwait
            FROM lineitem l1
            JOIN orders ON o_orderkey = l1.l_orderkey
                           AND o_orderstatus = 'F'
            JOIN supplier ON s_suppkey = l1.l_suppkey
            WHERE l1.l_returnflag = 'R'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 25
        """,
        "q13_customer_distribution": """
            SELECT c_count, count(*)::BIGINT AS custdist
            FROM (SELECT c_custkey,
                         count(o_orderkey)::BIGINT AS c_count
                  FROM customer
                  LEFT JOIN orders ON o_custkey = c_custkey
                       AND o_orderpriority <> '1-URGENT'
                  GROUP BY c_custkey) pc
            GROUP BY c_count
        """,
        # Q11 shape: cross-multiplied fraction test over exact decimals
        "q11_important_parts": """
            SELECT l_partkey, round(val, 2)::DOUBLE AS value
            FROM (SELECT l_partkey,
                         sum(l_extendedprice::DECIMAL(18,6)
                             * (1 - l_discount::DECIMAL(18,6))) AS val
                  FROM lineitem GROUP BY l_partkey) p
            WHERE val * 1500 >
                  (SELECT sum(l_extendedprice::DECIMAL(18,6)
                              * (1 - l_discount::DECIMAL(18,6)))
                   FROM lineitem)
        """,
        # Q15 shape: revenue view + scalar max; decimal-exact equality
        "q15_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       sum(l_extendedprice::DECIMAL(18,6)
                           * (1 - l_discount::DECIMAL(18,6)))
                         AS total_rev
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name,
                   round(total_rev, 2)::DOUBLE AS total_rev
            FROM rev JOIN supplier ON s_suppkey = l_suppkey
            WHERE total_rev = (SELECT max(total_rev) FROM rev)
        """,
        # Q16 shape: NOT IN exclusion + distinct partsupp projection
        "q16_supplier_counts": """
            SELECT p_brand, p_type, p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
                     AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey
                  FROM lineitem) ps
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#2'
              AND p_type NOT LIKE 'ECONOMY%'
              AND l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
        """,
        # Q20 shape: dominant-supplier threshold, cross-multiplied
        "q20_dominant_suppliers": """
            WITH per AS (
                SELECT l_partkey, l_suppkey,
                       sum(l_quantity::DECIMAL(18,6)) AS q
                FROM lineitem
                WHERE year(l_shipdate) = 1996
                GROUP BY l_partkey, l_suppkey),
            tot AS (SELECT l_partkey, sum(q) AS tq FROM per
                    GROUP BY l_partkey)
            SELECT s_suppkey, s_name, s_nationkey
            FROM supplier
            WHERE s_suppkey IN (
                SELECT DISTINCT l_suppkey
                FROM per JOIN tot USING (l_partkey)
                WHERE q * 2 > tq)
        """,
        # Q22 shape: cross-multiplied above-average test + NOT EXISTS
        "q22_dormant_customers": """
            SELECT c_nationkey, count(*)::BIGINT AS numcust,
                   round(sum(c_acctbal::DECIMAL(18,6)), 2)::DOUBLE
                     AS totacctbal
            FROM customer
            WHERE c_acctbal::DECIMAL(18,6)
                  * (SELECT count(*)::DECIMAL(18,0) FROM customer
                     WHERE c_acctbal > 0)
                  > (SELECT sum(c_acctbal::DECIMAL(18,6)) FROM customer
                     WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >=
                                    TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey
        """,
        "dedup_exact": """
            SELECT fp, count(*) AS n_docs FROM (
                SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
                FROM documents)
            GROUP BY fp
        """,
        "text_quality": """
            SELECT doc_id,
                   round((length(text) -
                          length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                         / length(text), 6) AS punct_ratio
            FROM documents
        """,
        "text_token_count": """
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(
                       trim(coalesce(text, '')), '\\s+'),
                     x -> x <> ''))::BIGINT AS ws_tokens,
                   len(regexp_extract_all(coalesce(text, ''),
                       '[A-Za-z]{1,4}|[0-9]+|[^\\sA-Za-z0-9]'))::BIGINT AS bpe_tokens
            FROM documents
        """,
        "text_lang_id": r"""
            SELECT doc_id,
              CASE
                WHEN en >= de AND en >= es AND en > 0 THEN 'en'
                WHEN de >= es AND de > 0 THEN 'de'
                WHEN es > 0 THEN 'es'
                ELSE 'unknown' END AS lang_guess
            FROM (
              SELECT doc_id,
                (CASE WHEN regexp_matches(lower(text), '\bthe\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\band\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bof\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bto\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bis\b') THEN 1 ELSE 0 END) AS en,
                (CASE WHEN regexp_matches(lower(text), '\bder\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bdie\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bund\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bnicht\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bist\b') THEN 1 ELSE 0 END) AS de,
                (CASE WHEN regexp_matches(lower(text), '\bel\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bla\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bque\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\bde\b') THEN 1 ELSE 0 END +
                 CASE WHEN regexp_matches(lower(text), '\blos\b') THEN 1 ELSE 0 END) AS es
              FROM documents)
        """,
        "text_fingerprint": """
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
            FROM documents
        """,
        "text_repetition": O.repetition_stats_sql("documents"),
        "text_gopher_filter": (
            f"WITH {O.synth_multiline_cte('documents')} "
            + O.gopher_filter_sql("mdocs", text_col="mtext")
        ),
        "text_c4_clean": (
            f"WITH {O.synth_multiline_cte('documents')} "
            + O.c4_line_clean_sql("mdocs", text_col="mtext")
        ),
        "text_line_dedup": (
            f"WITH {O.synth_multiline_cte('documents')} "
            + O.line_dedup_sql("mdocs", text_col="mtext", max_doc_freq=2)
        ),
        "text_pack_sequences": O.pack_sequences_sql(
            "documents", window=256, n_shards=8
        ),
        "dedup_winnow": O.winnow_fps_sql("documents", k=5, w=8),
        "dedup_substring_spans": O.dup_spans_sql(
            "documents", k=5, min_doc_freq=2
        ),
        "text_dup_span_stats": O.dup_span_stats_sql(
            "documents", k=5, min_doc_freq=2
        ),
        "text_chunk_tokens": O.chunk_tokens_sql(
            "documents", chunk=32, stride=24
        ),
        "search_postings": O.inverted_postings_sql("documents", min_df=2),
        "search_conjunctive": O.search_conjunctive_sql(
            "documents", ["dup", "window", "sort"]
        ),
        "search_topk": O.search_topk_sql(
            "documents", ["dup", "window", "sort"], k=25
        ),
        "search_bm25": O.search_bm25_sql(
            "documents", ["dup", "window", "sort"], k=25
        ),
        "ann_topk_quantized": O.ann_topk_quantized_sql(
            "embeddings", query_id=0, k=10, frac_bits=8
        ),
        "text_vocab_topk": """
            WITH vt AS (
              SELECT list_filter(regexp_split_to_array(
                       lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS t
              FROM documents
            ), cnts AS (
              SELECT token, count(*)::BIGINT AS n_occurrences
              FROM (SELECT unnest(t) AS token FROM vt) GROUP BY 1
            ), dc AS (
              SELECT token, count(*)::BIGINT AS n_docs
              FROM (SELECT unnest(list_distinct(t)) AS token FROM vt) GROUP BY 1
            )
            SELECT token, n_occurrences, n_docs,
                   (row_number() OVER (
                      ORDER BY n_occurrences DESC, token))::BIGINT AS rank
            FROM cnts JOIN dc USING (token)
            QUALIFY rank <= 100
        """,
        "text_corpus_rollup": T.corpus_rollup_sql(
            "SELECT lang, source, text FROM documents"
        ),
        "graph_transition_edges": (
            f"WITH {O.transition_edges_cte('events', _GRAPH_NODE)} "
            "SELECT src, dst, weight FROM gedges"
        ),
        "graph_anchor_texts": r"""
            WITH base AS (
              SELECT doc_id::VARCHAR AS doc_id,
                     list_slice(list_filter(
                       string_split_regex(lower(coalesce(text, '')), '\s+'),
                       w -> regexp_full_match(w, '[a-z]+')), 1, 3) AS words
              FROM documents
            ), w AS (
              SELECT doc_id, unnest(words) AS word FROM base
            ), aedges AS (
              SELECT doc_id AS src, 'https://ex.org/t/' || word AS dst,
                     'go ' || word AS anchor
              FROM w
              UNION ALL
              SELECT doc_id, 'https://ex.org/top', 'hi there' FROM base
            ), per_src AS (
              SELECT dst, anchor, src, count(*) AS c
              FROM aedges GROUP BY 1, 2, 3
            )
            SELECT dst, anchor, sum(c)::BIGINT AS n_refs,
                   count(*)::BIGINT AS n_src_pages
            FROM per_src GROUP BY 1, 2
        """,
        "text_pii_scrub": O.pii_scrub_sql(
            "documents", text_expr=O.synth_pii_expr()
        ),
        "text_decontaminate": O.decontaminate_sql(
            "documents", n=3, bench_residue_mod=25
        ),
        "text_surprisal": O.surprisal_score_sql("documents"),
        "text_bigram_lm": O.bigram_lm_score_sql("documents"),
        "text_importance": O.importance_score_sql(
            "documents", target_residue_mod=16
        ),
        "tok_bpe_pairs": O.bpe_pair_counts_sql("documents", k=50),
        "graph_pagerank": O.pagerank_int_sql(
            O.transition_edges_cte("events", _GRAPH_NODE), iters=5
        ),
        "graph_hits": O.hits_int_sql(
            O.transition_edges_cte("events", _GRAPH_NODE), iters=4
        ),
        "text_length_histogram": T.length_histogram_sql(
            "documents", bin_width=50
        ),
        "text_binned_quantiles": T.binned_quantiles_sql(
            "documents", bin_width=50, pcts=(50, 90, 99)
        ),
        "text_corpus_pivot": T.corpus_pivot_sql(
            "documents",
            pivot_col="lang",
            pivot_values=("de", "en", "es", "fr", "zh"),
            group_col="source",
        ),
        "dedup_embedding_cosine": """
            SELECT id_a, id_b, cos_sim FROM (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       round(list_cosine_similarity(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            WHERE cos_sim >= 0.40
        """,
        "ann_cosine_topk": """
            SELECT vec_id, printf('%.4f', cos_r) AS cos_sim FROM (
                SELECT vec_id,
                       round(list_cosine_similarity(embedding,
                           (SELECT embedding FROM embeddings WHERE vec_id = 0)), 4)
                       AS cos_r
                FROM embeddings
                ORDER BY cos_r DESC, vec_id
                LIMIT 10)
        """,
    }

"""Re-crawl freshness scheduling over revisit logs.

The reference crawler fetches each URL at most ``maxRetries + 1`` times in
one run (Supervisor.scala:93-125) and has no refresh policy — deciding
WHICH known URLs to re-fetch is the operation a production crawl pipeline
layers on top (Cho & Garcia-Molina, *Synchronizing a database to improve
freshness*, SIGMOD 2000; *Effective page refresh policies for web
crawlers*, TODS 2003). This module estimates per-URL change rates from
consecutive revisit fingerprints and ranks stale-and-volatile URLs first
under an integer-exact priority, feeding the same per-host budgeted
scheduler as the live frontier (operators/politeness.py).

Scale shape:

  - ``change_rate`` is ONE window (partition by url, order by ts) feeding
    ONE groupBy(url) on the same key — Catalyst plans a single Exchange
    whose partitioning both consumers reuse. At a 10^10-URL revisit log
    this is the minimal shuffle: everything else rides the scan.
  - ``recrawl_topk`` adds one host-keyed rank window with ``rank <= k``,
    which Spark compiles to WindowGroupLimit (per-partition top-k pruned
    BEFORE the exchange) — the same fast path as the politeness top-K.

All arithmetic is exact int64 (ppm change rates, second-granularity
staleness, bounded products — change_ppm <= 10^6 and staleness fits 10^11
seconds before the product nears 2^63), so the priority and ranking are
bit-identical on any engine and any summation order — the determinism
contract shared with ``graph.pagerank_int`` and ``search.bm25``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessions import _us

PPM = 1_000_000
US_PER_S = 1_000_000


def change_rate(
    visits: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    fp_col: str = "fp",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-URL content-change statistics from a revisit log.

    ``visits`` has one row per fetch of ``url_col`` at ``ts_col`` whose
    content fingerprint (any stable digest of the fetched spans) is
    ``fp_col``. A *change* is a revisit whose fingerprint differs from the
    immediately preceding visit of the same URL (lag over (ts, id) — ties
    broken by id so the scan order is deterministic even if the log has
    same-microsecond fetches). Null fingerprints (failed fetches with no
    digest) never count as changes in either direction — ``prev != fp``
    is null-propagating on both engines, so a flaky URL is not mistaken
    for a volatile one.

    Returns one row per url:

      - ``n_visits``            — total fetches observed
      - ``n_changes``           — consecutive-fingerprint flips
      - ``change_ppm``          — 10^6 * n_changes div (n_visits - 1)
                                  (0 for single-visit URLs: no evidence)
      - ``last_us``             — microseconds of the newest visit
    """
    w = Window.partitionBy(url_col).orderBy(ts_col, id_col)
    prev = F.lag(fp_col).over(w)
    changed = (prev.isNotNull() & (prev != F.col(fp_col))).cast("long")
    return (
        visits.select(
            F.col(url_col).alias("url"),
            _us(ts_col).alias("_us"),
            changed.alias("_chg"),
        )
        .groupBy("url")
        .agg(
            F.count("*").alias("n_visits"),
            F.sum("_chg").alias("n_changes"),
            F.max("_us").alias("last_us"),
        )
        .withColumn(
            "change_ppm",
            F.expr(
                f"if(n_visits > 1, ({PPM} * n_changes) div (n_visits - 1),"
                " 0)"
            ),
        )
        .select("url", "n_visits", "n_changes", "change_ppm", "last_us")
    )


def recrawl_topk(
    rates: DataFrame,
    host_col: str = "host",
    k: int = 5,
    now_us: int | None = None,
) -> DataFrame:
    """Top-``k`` re-crawl candidates per host by staleness-weighted
    volatility.

    ``priority = change_ppm * stale_s`` with ``stale_s = (now - last_us)
    div 10^6`` — the Cho & Garcia-Molina insight that re-fetch value grows
    with both how often a page changes and how long since it was seen,
    kept in exact int64 (ppm x seconds). ``now_us`` defaults to the newest
    visit in the log (one scalar aggregate inlined as a literal — the
    BM25/avgdl pattern; a 1-row crossJoin would plan a nested loop), so
    the result is a pure function of the input.

    Ranking is ``row_number`` over (priority DESC, url) per host — the
    url tiebreak makes the top-k set deterministic — and ``rank <= k``
    compiles to WindowGroupLimit: each partition keeps k rows per host
    before the shuffle, so the exchange moves O(hosts * k), not the URL
    universe.
    """
    if now_us is None:
        now_us = int(
            rates.agg(F.max("last_us").alias("m")).first()["m"] or 0
        )
    pri = rates.withColumn(
        "priority",
        F.expr(f"change_ppm * (greatest({now_us} - last_us, 0) div {US_PER_S})"),
    )
    w = Window.partitionBy(host_col).orderBy(
        F.col("priority").desc(), F.col("url")
    )
    return (
        pri.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            host_col, "url", "priority", F.col("rank").cast("long").alias("rank")
        )
    )


# ------------------------------------------------------------ DuckDB oracles


def change_rate_sql(visits_sql: str) -> str:
    """DuckDB replica of ``change_rate`` over a ``(url, ts, event_id,
    fp)``-shaped subquery."""
    return f"""
    SELECT url,
           count(*) AS n_visits,
           sum(chg)::BIGINT AS n_changes,
           CASE WHEN count(*) > 1
                THEN ({PPM} * sum(chg)::BIGINT) // (count(*) - 1)
                ELSE 0 END AS change_ppm,
           max(epoch_us(ts))::BIGINT AS last_us
    FROM (
      SELECT url, ts,
             CASE WHEN lag(fp) OVER w IS NOT NULL
                   AND lag(fp) OVER w <> fp THEN 1 ELSE 0 END AS chg
      FROM ({visits_sql})
      WINDOW w AS (PARTITION BY url ORDER BY ts, event_id))
    GROUP BY url
    """


def recrawl_topk_sql(visits_sql: str, host_expr: str, k: int = 5) -> str:
    """DuckDB replica of ``change_rate`` |> ``recrawl_topk`` with
    ``now = max(last_us)`` computed in-query (scalar subquery — DuckDB
    has no inline-literal step to mirror, and the value is identical)."""
    rates = change_rate_sql(visits_sql)
    return f"""
    SELECT host, url, priority, rank
    FROM (
      SELECT host, url, priority,
             row_number() OVER (
               PARTITION BY host ORDER BY priority DESC, url) AS rank
      FROM (
        SELECT {host_expr} AS host, url,
               change_ppm * (greatest(
                 (SELECT max(last_us) FROM ({rates})) - last_us, 0)
                 // {US_PER_S}) AS priority
        FROM ({rates})))
    WHERE rank <= {k}
    """

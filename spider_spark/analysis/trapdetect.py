"""Spider-trap detection over discovered-URL sets.

The reference crawler has no trap defense beyond its static unwanted-URL
patterns (UrlFilter.scala:8-33 — warenkorb/addToCart/search are exactly
hand-blocked trap instances). A production crawl needs the *general*
operation those patterns are special cases of: detect hosts whose URL
space is exploding — calendar pages, session-id query params, faceted
navigation, cyclic path segments (``/a/b/a/b/...``) — so the scheduler can
cap or drop them before they eat the frontier (the classic Heritrix /
IRLbot "spider trap" problem; Lee et al., *IRLbot: Scaling to 6 Billion
Pages and Beyond*, WWW 2008, §5 uses budget-per-host exactly because of
these).

Two stages, both engine-portable and integer-exact:

  - ``trap_signals`` — per-URL structural signals (path depth, max
    repeated path segment, query-param count, URL length) computed with
    JVM string/array HOFs on the scan: ZERO shuffle, so at 10^10 URLs it
    rides whatever scan already exists.
  - ``trap_hosts`` — per-host aggregation of those signals plus the
    query-string blow-up ratio distinct(path?query)/distinct(path) in
    exact ppm (a calendar or session-id trap shows a path set of
    thousands of query variants over few physical paths). ONE shuffle,
    keyed by host — the same key the politeness scheduler already
    partitions by, so at scale the exchange can be reused/bucketed.

The trap verdict is a pure threshold predicate over exact integers, so
Spark and any SQL engine agree bit-for-bit — the determinism contract
shared with ``graph.pagerank_int`` and ``freshness.recrawl_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000

# portable URL surgery (same split_part shapes both Spark and DuckDB
# implement): host = first '/'-segment after '//', pathq = the remainder,
# path/query split on '?'. No parse_url — DuckDB has none. split_part
# splits on EVERY '//', so a '//' inside the path truncates pathq there —
# identical on both engines (R22's cleaner never emits '//' paths).
_HOST = "split_part(split_part({u}, '//', 2), '/', 1)"
_PATHQ = (
    "substr(split_part({u}, '//', 2),"
    " length(split_part(split_part({u}, '//', 2), '/', 1)) + 1)"
)


def trap_signals(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL structural trap signals (scan-only, zero shuffle).

    Returns one row per input row:

      - ``host``            — URL host
      - ``path``            — path without query string
      - ``pathq``           — path including query string
      - ``depth``           — number of non-empty path segments
      - ``max_seg_repeat``  — occurrences of the most-repeated path
                              segment (``/a/b/a/b`` → 2); 0 for empty path
      - ``n_params``        — query parameters ('&'-split; 0 if no query)
      - ``url_len``         — total URL length

    The repeat count is an O(depth^2) array HOF per row — depth is tens
    at most, and it runs inside the scan projection with no Python and
    no shuffle.
    """
    u = url_col
    host = _HOST.format(u=u)
    pathq = _PATHQ.format(u=u)
    return df.select(
        F.col(u).alias("url"),
        F.expr(host).alias("host"),
        F.expr(f"split_part({pathq}, '?', 1)").alias("path"),
        F.expr(pathq).alias("pathq"),
    ).select(
        "url",
        "host",
        "path",
        "pathq",
        F.expr(
            "size(filter(split(path, '/'), x -> x != ''))"
        ).cast("long").alias("depth"),
        F.expr(
            "coalesce(array_max(transform(filter(split(path, '/'),"
            " x -> x != ''), s -> size(filter(split(path, '/'),"
            " x -> x = s)))), 0)"
        ).cast("long").alias("max_seg_repeat"),
        F.expr(
            "if(split_part(pathq, '?', 2) = '', 0,"
            " size(split(split_part(pathq, '?', 2), '&')))"
        ).cast("long").alias("n_params"),
        F.length("url").cast("long").alias("url_len"),
    )


def trap_hosts(
    df: DataFrame,
    url_col: str = "url",
    repeat_threshold: int = 3,
    depth_threshold: int = 12,
    blowup_threshold_ppm: int = 5 * PPM,
) -> DataFrame:
    """Per-host trap verdicts from aggregated URL signals (one shuffle).

    Aggregates ``trap_signals`` by host over the DISTINCT URL set (a
    frontier/seen table can carry re-discoveries; duplicates must not
    inflate the blow-up ratio):

      - ``n_urls``, ``max_depth``, ``avg_depth_x100`` (exact integer
        ``(100 * sum_depth) div n``), ``max_repeat``, ``max_params``
      - ``n_paths`` / ``n_pathqs`` — distinct physical paths vs distinct
        path+query variants
      - ``param_blowup_ppm`` = ``10^6 * n_pathqs div max(n_paths, 1)`` —
        ~10^6 for a healthy host, orders of magnitude more for a
        session-id/calendar trap
      - ``is_trap`` — any signal over its threshold: a path segment
        repeating ≥ ``repeat_threshold`` times, depth ≥
        ``depth_threshold``, or blow-up ≥ ``blowup_threshold_ppm``
    """
    sig = trap_signals(df, url_col).dropDuplicates(["url"])
    agg = sig.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.max("depth").alias("max_depth"),
        F.expr("(100 * sum(depth)) div count(*)").alias("avg_depth_x100"),
        F.max("max_seg_repeat").alias("max_repeat"),
        F.max("n_params").alias("max_params"),
        F.countDistinct("path").alias("n_paths"),
        F.countDistinct("pathq").alias("n_pathqs"),
    )
    return agg.select(
        "host",
        "n_urls",
        "max_depth",
        "avg_depth_x100",
        "max_repeat",
        "max_params",
        "n_paths",
        "n_pathqs",
        F.expr(f"({PPM} * n_pathqs) div greatest(n_paths, 1)").alias(
            "param_blowup_ppm"
        ),
        F.expr(
            f"max_repeat >= {repeat_threshold}"
            f" or max_depth >= {depth_threshold}"
            f" or ({PPM} * n_pathqs) div greatest(n_paths, 1)"
            f" >= {blowup_threshold_ppm}"
        ).alias("is_trap"),
    )


# ------------------------------------------------------------ DuckDB oracles


def trap_signals_sql(urls_sql: str, url_col: str = "url") -> str:
    """DuckDB replica of ``trap_signals`` over a subquery with ``url``."""
    u = url_col
    host = _HOST.format(u=u)
    pathq = _PATHQ.format(u=u)
    return f"""
    SELECT url, host, path, pathq,
           len(list_filter(string_split(path, '/'), x -> x <> ''))::BIGINT
             AS depth,
           coalesce(list_max(list_transform(
             list_filter(string_split(path, '/'), x -> x <> ''),
             s -> len(list_filter(string_split(path, '/'),
                                  x -> x = s)))), 0)::BIGINT
             AS max_seg_repeat,
           CASE WHEN split_part(pathq, '?', 2) = '' THEN 0
                ELSE len(string_split(split_part(pathq, '?', 2), '&'))
           END::BIGINT AS n_params,
           length(url)::BIGINT AS url_len
    FROM (
      SELECT {u} AS url, {host} AS host,
             split_part({pathq}, '?', 1) AS path, {pathq} AS pathq
      FROM ({urls_sql}))
    """


def trap_hosts_sql(
    urls_sql: str,
    url_col: str = "url",
    repeat_threshold: int = 3,
    depth_threshold: int = 12,
    blowup_threshold_ppm: int = 5 * PPM,
) -> str:
    """DuckDB replica of ``trap_hosts`` (distinct-url aggregation)."""
    sig = trap_signals_sql(urls_sql, url_col)
    return f"""
    SELECT host, n_urls, max_depth, avg_depth_x100, max_repeat, max_params,
           n_paths, n_pathqs,
           ({PPM} * n_pathqs) // greatest(n_paths, 1) AS param_blowup_ppm,
           (max_repeat >= {repeat_threshold}
            OR max_depth >= {depth_threshold}
            OR ({PPM} * n_pathqs) // greatest(n_paths, 1)
               >= {blowup_threshold_ppm}) AS is_trap
    FROM (
      SELECT host,
             count(*)::BIGINT AS n_urls,
             max(depth)::BIGINT AS max_depth,
             ((100 * sum(depth)) // count(*))::BIGINT AS avg_depth_x100,
             max(max_seg_repeat)::BIGINT AS max_repeat,
             max(n_params)::BIGINT AS max_params,
             count(DISTINCT path)::BIGINT AS n_paths,
             count(DISTINCT pathq)::BIGINT AS n_pathqs
      FROM (
        SELECT * FROM ({sig})
        QUALIFY row_number() OVER (PARTITION BY url ORDER BY url) = 1)
      GROUP BY host)
    """

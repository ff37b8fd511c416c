"""Crawl snapshot diffing for incremental re-crawls.

The reference runs one crawl and stops (Supervisor.scala:223-281); each
URL is inserted once (Indexer.scala:75-101) and never revisited. The
operation an incremental production crawl needs next — given last week's
crawl and this week's — is the *delta*: which URLs appeared, vanished, or
changed content. That delta is what feeds re-index queues, freshness
models (``analysis/freshness``), and storage compaction.

``crawl_diff`` is ONE full-outer equi-join on url. At 10^10 URLs both
sides are the engine's own ``seen``/``fetched`` tables, already bucketed
by ``url_hash`` — co-located buckets make the join shuffle-free on a
lake; in the sandbox it is a single sort-merge exchange. ``diff_stats``
adds one host-keyed groupBy (conditional counts, map-side combinable).

Status classification is null-exact: a URL present only in the old
snapshot is ``removed``, only in the new is ``added``, in both with
differing fingerprints is ``changed`` else ``unchanged`` — a missing
fingerprint (failed fetch) on either side classifies as ``changed``
unless both are missing, mirroring SQL's null-safe-equality semantics on
both engines (``<=>`` / ``IS NOT DISTINCT FROM``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """Classify every URL across two crawl snapshots.

    ``old``/``new`` carry one row per URL with a content fingerprint.
    Returns ``(url, host, status, old_fp, new_fp)`` with status in
    {added, removed, changed, unchanged}. Host comes from whichever side
    has the URL (coalesced), so downstream host-keyed ops work on every
    status class.
    """
    o = old.select(
        F.col(url_col).alias("url"), F.col(fp_col).alias("old_fp")
    )
    n = new.select(
        F.col(url_col).alias("url"), F.col(fp_col).alias("new_fp")
    )
    # presence must come from the join sides, not fp nullability (fp may
    # legitimately be null for a failed fetch): carry explicit flags.
    o2 = o.withColumn("_in_old", F.lit(True))
    n2 = n.withColumn("_in_new", F.lit(True))
    j = o2.join(n2, "url", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.expr("old_fp <=> new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "url",
        F.expr("split_part(split_part(url, '//', 2), '/', 1)").alias(
            "host"
        ),
        status.alias("status"),
        "old_fp",
        "new_fp",
    )


def diff_stats(diff: DataFrame) -> DataFrame:
    """Per-host churn summary of a ``crawl_diff`` result.

    One groupBy(host) with conditional-sum counts (map-side combinable —
    the exchange moves one row per host) plus ``churn_ppm`` =
    ``10^6 * (added + removed + changed) div total`` in exact int64.
    """
    c = lambda s: F.sum(  # noqa: E731
        F.when(F.col("status") == s, F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    return (
        diff.groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            c("added").alias("n_added"),
            c("removed").alias("n_removed"),
            c("changed").alias("n_changed"),
            c("unchanged").alias("n_unchanged"),
        )
        .withColumn(
            "churn_ppm",
            F.expr(
                f"({PPM} * (n_added + n_removed + n_changed)) div n_urls"
            ),
        )
    )


# ------------------------------------------------------------ DuckDB oracles


def crawl_diff_sql(old_sql: str, new_sql: str) -> str:
    """DuckDB replica of ``crawl_diff`` over two ``(url, fp)`` subqueries."""
    return f"""
    SELECT coalesce(o.url, n.url) AS url,
           split_part(split_part(coalesce(o.url, n.url), '//', 2),
                      '/', 1) AS host,
           CASE WHEN o.url IS NULL THEN 'added'
                WHEN n.url IS NULL THEN 'removed'
                WHEN o.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
                ELSE 'changed' END AS status,
           o.fp AS old_fp, n.fp AS new_fp
    FROM ({old_sql}) o FULL OUTER JOIN ({new_sql}) n USING (url)
    """


def diff_stats_sql(old_sql: str, new_sql: str) -> str:
    """DuckDB replica of ``crawl_diff`` |> ``diff_stats``."""
    diff = crawl_diff_sql(old_sql, new_sql)
    return f"""
    SELECT host,
           count(*)::BIGINT AS n_urls,
           sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT
             AS n_added,
           sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT
             AS n_removed,
           sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT
             AS n_changed,
           sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)::BIGINT
             AS n_unchanged,
           ({PPM} * (sum(CASE WHEN status <> 'unchanged' THEN 1 ELSE 0
                         END)::BIGINT)) // count(*) AS churn_ppm
    FROM ({diff})
    GROUP BY host
    """

"""Redirect-chain resolution by pointer doubling.

The reference fetch follows HTTP redirect chains transparently inside
jsoup (``.followRedirects(true)``, SiteScraper.scala:81) with jsoup's
~20-hop cap; exceeding it throws an IOException, which lands in the
retryable-failure path (SiteScraper.scala:93-106, R15/R16). In the
Engine's batch model the fetch is a join against the `documents` lake,
so redirects become data: an edge table ``(src, dst)`` of
redirect-status docs and their Location targets. Resolving every chain
to its landing URL is then a graph problem.

The naive loop — join the frontier against the edge list once per hop —
costs ``max_hops`` shuffles. This operator uses **pointer doubling**
(a.k.a. path doubling, the classic PRAM list-ranking trick): maintain a
mapping ``u → (v, hops, done)`` meaning "following up to 2^k steps from
u lands at v"; each round composes the mapping with itself, so chains
up to ``max_hops`` long resolve in ``ceil(log2(max_hops))`` self-joins
— 5 shuffles for the jsoup cap of 20, whether the corpus has 10^3 or
10^9 redirect rows. Each round's output is ``localCheckpoint``-ed so
lineage stays bounded.

Semantics (matching the reference's fetch behavior):
- ``status='ok'``: a terminal URL (no outgoing redirect) was reached in
  ``hops <= max_hops`` steps; ``final_url``/``hops`` are exact.
- ``status='too_many'``: the chain exceeds ``max_hops`` or never
  terminates (cycle, incl. self-loops) — the jsoup give-up case;
  ``final_url``/``hops`` are NULL (a cycle has no meaningful landing
  point, and the doubling overshoot position is an implementation
  detail no consumer should see).
- A ``dst`` that never appears as a ``src`` is terminal whether or not
  it is in the corpus — "redirects off-corpus" is the R15 fetch-miss
  path downstream, not this operator's concern.

Requirement: at most one outgoing edge per ``src`` (HTTP has one
Location header). Rows with NULL src/dst are ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 20,
) -> DataFrame:
    """Resolve every redirect chain in ``edges`` to
    ``(url, final_url, hops, status)`` — one row per distinct source.
    O(log2(max_hops)) self-joins, each sized by the edge list only.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())

    # done = this hop already landed on a terminal (dst has no out-edge)
    srcs = e.select(F.col("src").alias("dst")).distinct().withColumn(
        "_cont", F.lit(True)
    )
    m = (
        e.join(srcs, "dst", "left")
        .select(
            "src",
            "dst",
            F.lit(1).cast("long").alias("hops"),
            F.col("_cont").isNull().alias("done"),
        )
        .localCheckpoint()
    )

    rounds = 0
    while (1 << rounds) < max_hops:
        rounds += 1
    for _ in range(rounds):
        halt = m.where(F.col("done"))
        step = m.select(
            F.col("src").alias("_ms"),
            F.col("dst").alias("_md"),
            F.col("hops").alias("_mh"),
            F.col("done").alias("_mdone"),
        )
        # every non-done dst IS a source (that's what done=false means),
        # so the inner join is total over the not-done rows
        moved = (
            m.where(~F.col("done"))
            .join(step, F.col("dst") == F.col("_ms"), "inner")
            .select(
                "src",
                F.col("_md").alias("dst"),
                (F.col("hops") + F.col("_mh")).alias("hops"),
                F.col("_mdone").alias("done"),
            )
        )
        m = halt.unionByName(moved).localCheckpoint()

    ok = F.col("done") & (F.col("hops") <= F.lit(max_hops))
    return m.select(
        F.col("src").alias("url"),
        F.when(ok, F.col("dst")).alias("final_url"),
        F.when(ok, F.col("hops")).alias("hops"),
        F.when(ok, F.lit("ok")).otherwise(F.lit("too_many")).alias("status"),
    )


def resolve_redirects_sql(edges_sql: str, max_hops: int = 20) -> str:
    """DuckDB replica: linear recursive-CTE chase with the same
    terminal/cap/cycle semantics (the oracle chases hop-by-hop; the
    engine doubles — same fixpoint)."""
    return f"""
        WITH RECURSIVE e0 AS ({edges_sql}),
        edges AS (
            SELECT src, dst,
                   dst NOT IN (SELECT src FROM e0
                               WHERE src IS NOT NULL) AS term
            FROM e0 WHERE src IS NOT NULL AND dst IS NOT NULL
        ),
        chase(src, cur, hops, done) AS (
            SELECT src, dst, 1::BIGINT, term FROM edges
            UNION ALL
            SELECT c.src, e.dst, c.hops + 1, e.term
            FROM chase c JOIN edges e ON e.src = c.cur
            WHERE NOT c.done AND c.hops < {max_hops}
        ),
        fin AS (SELECT src, cur, hops FROM chase WHERE done)
        SELECT s.src AS url, f.cur AS final_url, f.hops,
               CASE WHEN f.src IS NULL THEN 'too_many' ELSE 'ok' END
                 AS status
        FROM (SELECT DISTINCT src FROM edges) s
        LEFT JOIN fin f ON s.src = f.src
    """

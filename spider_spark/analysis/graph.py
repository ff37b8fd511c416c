"""Host-graph analytics: transition-edge extraction + integer PageRank.

A crawl scheduler that prioritizes important hosts needs a host-centrality
signal. Two operators:

  - ``transition_edges``: per-user consecutive-event transitions — one lag
    window over (user, time) then a weighted groupBy — the standard
    clickstream→graph reduction. One shuffle on the user key, one on the
    edge key; both combine-heavy.
  - ``pagerank_int``: fixed-iteration weighted PageRank in EXACT integer
    arithmetic. Ranks live in micro-units (scale 10^6) and every update is
    ``r' = ((100-d)*scale)//100 + (d * Σ_in (r*w) DIV out_w)//100`` — all
    BIGINT operations, so the result is bit-identical on any engine and
    any summation order (integer addition commutes; float PageRank does
    not, which is why the usual formulation can't be oracle-checked
    value-exactly). Dangling-node mass is dropped (the common
    simplification), documented here so the oracle does the same.

Scale shape: each iteration is one edges⋈ranks hash join (edges carry
(src, dst, weight, out_w) — rank state joins in by src) + one groupBy(dst)
sum, both shuffling the EDGE list, never the corpus. localCheckpoint per
iteration keeps N iterations at N bounded jobs (same reasoning as
analysis/dedup.connected_components). Hot destination hosts are fine — the
sum is map-side combined; a hot SOURCE host fans its single rank row out
through the join, not a skewed shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_SCALE = 1_000_000


def anchor_text_edges(
    docs: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(src, dst, anchor): one row per ``<a href>...</a>`` pair across the
    corpus — the anchor-text link graph search indexing and LLM data
    pipelines mine for third-party descriptions of a target page. href
    resolution/validity matches the crawl's own link extraction
    (functions/extract.extract_anchors; the reference extracts hrefs only,
    ContentFilter.scala:80-85 — anchor TEXT is added pipeline surface).

    Plan shape: ONE scan through an Arrow-batched pandas UDF (same
    compiled-regex core as the R13 extraction UDF) returning
    array<struct>, then a copy-free explode — no shuffle at all; the
    output is the edge list downstream aggregations shuffle, never the
    HTML."""
    from spider_spark.functions.extract import extract_anchors

    @F.pandas_udf("array<struct<url: string, anchor: string>>")
    def anchors_udf(html: pd.Series, base: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_anchors(h or "", b or "")
                for h, b in zip(html, base)
            ]
        )

    return (
        docs.select(
            F.col(id_col).alias("src"),
            F.explode(
                anchors_udf(F.col(html_col), F.col(base_col))
            ).alias("_a"),
        )
        .select("src", F.col("_a.url").alias("dst"), F.col("_a.anchor").alias("anchor"))
    )


def anchor_text_agg(edges: DataFrame) -> DataFrame:
    """(dst, anchor, n_refs, n_src_pages) per distinct (target, anchor
    text): total reference count and how many distinct source pages use
    that wording. Two combine-heavy groupBys — (dst, anchor, src) then
    (dst, anchor) — so the shuffle carries partially-aggregated rows, and
    a hot target URL (every page links the homepage) still distributes
    across its distinct anchor wordings and source pages."""
    per_src = edges.groupBy("dst", "anchor", "src").agg(
        F.count("*").alias("c")
    )
    return per_src.groupBy("dst", "anchor").agg(
        F.sum("c").cast("long").alias("n_refs"),
        F.count("*").cast("long").alias("n_src_pages"),
    )


def transition_edges(
    events: DataFrame,
    node_col: str = "node",
    user_col: str = "user_id",
    order_cols: tuple = ("ts", "event_id"),
) -> DataFrame:
    """(src, dst, weight): per-user consecutive-node transitions, self-loops
    dropped, weight = transition count. ``order_cols`` must make the
    per-user order total (the trailing unique id breaks timestamp ties
    deterministically)."""
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    tr = events.select(
        F.col(node_col).alias("dst"),
        F.lag(node_col).over(w).alias("src"),
    )
    return (
        tr.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )


def pagerank_int(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """(node, r): integer PageRank after exactly ``iters`` iterations.

    r starts at ``scale`` for every node appearing in any edge; each step
    every node sends ``(r * weight) DIV total_out_weight`` along each
    out-edge and receives ``((100-damping_pct)*scale)//100 +
    (damping_pct * Σ received)//100``. All arithmetic is 64-bit integer
    (no float, no convergence test) so the output is deterministic and
    value-exact against the unrolled SQL oracle."""
    e = edges.select("src", "dst", F.col("weight").cast("long").alias("weight"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outw = e.groupBy("src").agg(F.sum("weight").alias("ow"))
    # static per-edge routing table: (src, dst, weight, ow) — built once,
    # checkpointed; iterations only re-join the small rank state into it
    routed = e.join(outw, "src").localCheckpoint()
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = routed.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            # decimal(38,0) multiply: r approaches total mass (n*scale)
            # under extreme concentration, so r*weight can exceed int64
            # at north scale; div on decimals is exact and returns bigint
            F.expr(
                "cast((cast(r as decimal(38,0)) * weight) div ow as long)"
            ).alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                # div, not '/': Column '/' is FLOAT division and a
                # cast-truncate after it could round differently than the
                # oracle's exact integer division on large sums
                F.expr(
                    f"cast({base}L + ({damping_pct}L * coalesce(s, 0L)) "
                    "div 100 as long)"
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks


def hits_int(
    edges: DataFrame,
    iters: int = 5,
    scale: int = PR_SCALE,
) -> DataFrame:
    """(node, hub, auth): Kleinberg HITS after exactly ``iters``
    iterations, in EXACT 64-bit integer arithmetic.

    Update per iteration (weighted graph):
      auth_raw(j) = Σ_{i→j} hub(i) * weight(i,j)
      auth(j)     = (auth_raw(j) * scale) DIV max_j auth_raw(j)
      hub_raw(i)  = Σ_{i→j} auth(j) * weight(i,j)
      hub(i)      = (hub_raw(i) * scale) DIV max_i hub_raw(i)

    Max-normalization replaces the usual L2 norm: it needs no square
    root, keeps every value in [0, scale] as BIGINT, and — like
    pagerank_int's integer division — makes the result bit-identical on
    any engine and any summation order, so the unrolled SQL oracle can
    check it value-exactly. Nodes with no in-edges get auth 0 (and
    symmetrically hub 0) — they receive no mass, same convention as
    pagerank_int's dangling-mass drop.

    Scale shape: per iteration two edges⋈state hash joins + two
    combine-heavy groupBys over the EDGE list (never the corpus) plus a
    1-row global max that broadcasts back — no wide shuffle beyond the
    edge key. localCheckpoint per iteration keeps N iterations at N
    bounded jobs (the pagerank_int / connected-components pattern).

    The reference has no centrality at all; this is the second classic
    crawl-ordering signal (Cho/Garcia-Molina 1998 evaluate both PageRank
    and backlink/authority orderings — the engine's indegree priority_mode
    is the degenerate 1-iteration case).
    """
    e = edges.select(
        "src", "dst", F.col("weight").cast("long").alias("weight")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    state = nodes.select(
        "node",
        F.lit(scale).cast("long").alias("hub"),
        F.lit(scale).cast("long").alias("auth"),
    )
    for _ in range(iters):
        a_raw = (
            e.join(
                state.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("hub * weight")).alias("ar"))
            .localCheckpoint()
        )
        # the normalizer is ONE scalar over the (node-sized, already
        # materialized) raw table — collected and inlined as a literal,
        # the search.search_bm25 pattern, so the plan never carries a
        # scalar-join nested loop
        a_max = a_raw.agg(F.max("ar")).first()[0] or 1  # empty graph
        auth = a_raw.select(
            "node",
            # widen the multiply to decimal(38,0): ar*scale would wrap
            # int64 once a node's weighted in-degree exceeds ~9.2e6 at
            # the default scale (DuckDB's sum() is already HUGEINT, so
            # only this side needed headroom); div on decimals is exact
            # integer floor division returning bigint
            F.expr(
                f"cast((cast(ar as decimal(38,0)) * {scale}) "
                f"div {a_max} as long)"
            ).alias("auth"),
        )
        h_raw = (
            e.join(
                auth.select(F.col("node").alias("dst"), "auth"), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.expr("auth * weight")).alias("hr"))
            .localCheckpoint()
        )
        h_max = h_raw.agg(F.max("hr")).first()[0] or 1
        hub = h_raw.select(
            "node",
            F.expr(
                f"cast((cast(hr as decimal(38,0)) * {scale}) "
                f"div {h_max} as long)"
            ).alias("hub"),
        )
        state = (
            nodes.join(hub, "node", "left")
            .join(auth, "node", "left")
            .select(
                "node",
                F.coalesce("hub", F.lit(0).cast("long")).alias("hub"),
                F.coalesce("auth", F.lit(0).cast("long")).alias("auth"),
            )
            .localCheckpoint()
        )
    return state

"""Iterative graph expansion — reference R21 (sitemap index flatten).

The reference recursively expands sitemap indexes driver-side
(SitemapInspector.scala:22-58, recursion at :47-49). At a 10^10-URL
frontier with sitemap-index-heavy hosts, the seed frontier itself is big
data, so the engine's expansion is a depth-bounded iterative self-join
over a distributed edge table: each level joins the current frontier
against the edges, anti-joins the already-visited set (cycle guard), and
truncates lineage with localCheckpoint so N levels stay N bounded jobs,
not an exponentially deep plan.

Determinism: output is the reachable SET with minimal depth per node —
independent of visit order, so it equals the oracle's recursive DFS after
its sorted-set dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_reachable(
    edges: DataFrame,
    roots: DataFrame,
    max_depth: int = 32,
    parent_col: str = "parent",
    child_col: str = "child",
    key_cols: tuple = (),
) -> DataFrame:
    """BFS reachability over ``edges`` from ``roots``.

    roots: DataFrame with column ``node`` (+ optional ``key_cols`` carried
    through, e.g. the originating host of a sitemap tree so shared subtrees
    expand once per origin). Returns (``*key_cols``, node, depth) with the
    minimal depth per (keys, node); roots are depth 0.

    Each level is one bounded join + anti-join; localCheckpoint keeps the
    plan shallow (an L-level crawl otherwise builds an L-deep lineage that
    re-executes every prior join at each action).
    """
    keys = list(key_cols)
    frontier = (
        roots.select(*keys, "node")
        .dropDuplicates(keys + ["node"])
        .withColumn("depth", F.lit(0))
        .localCheckpoint()
    )
    levels = [frontier]
    for depth in range(1, max_depth + 1):
        # anti-join against all prior levels (each already materialized)
        seen_nodes = levels[0].select(*keys, "node")
        for lv in levels[1:]:
            seen_nodes = seen_nodes.unionByName(lv.select(*keys, "node"))
        nxt = (
            frontier.join(edges, frontier["node"] == edges[parent_col])
            # qualify the key refs: a key column that ALSO exists on the
            # edges side (e.g. key_cols=('host',) with host-carrying
            # edges) would otherwise be an ambiguous reference
            .select(
                *[frontier[k] for k in keys],
                edges[child_col].alias("node"),
            )
            .dropDuplicates(keys + ["node"])
            .join(seen_nodes, keys + ["node"], "left_anti")
            .withColumn("depth", F.lit(depth))
            .localCheckpoint()
        )
        if not nxt.head(1):
            break
        levels.append(nxt)
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out

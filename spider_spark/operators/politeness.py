"""Per-host politeness scheduling — reference R8.

The reference takes the first ``scrapeParallelism`` URLs of each host's FIFO
queue on every tick (HostCrawler.scala:166-186, take at :171). In the batch
model one round == one tick for ALL hosts simultaneously: a rank-by-seq
window caps each host at its budget.

Scale notes (100 TB / 10^10-frontier design point):
  - the window shuffles by host once; AQE coalesces the small output
  - a single hot host (giant queue in one partition) is handled by the
    two-phase variant: salted local top-K first (each (host, salt) slice
    keeps only K rows), then the exact global-per-host rank runs over at
    most ``salt × K`` rows per host instead of the full queue. The final
    rank is exact on ``seq`` so determinism and FIFO order are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_topk(
    frontier: DataFrame, budget: int, salt: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (scheduled with rn ∈ [1..budget], deferred).

    frontier columns: url, host, seq, sm (+ passthrough). ``rn`` is the
    deterministic batch position (1-based, FIFO by seq) the rest of the
    round keys ordering off.
    """
    if salt > 1:
        # phase 1: cheap pre-prune inside salted slices (no global sort of
        # a hot host's queue); keeps a superset of the true top-K
        wsalt = Window.partitionBy("host", "_salt").orderBy("seq")
        frontier = (
            frontier.withColumn(
                "_salt", F.pmod(F.xxhash64("url"), F.lit(salt))
            )
            .withColumn("_srn", F.row_number().over(wsalt))
            .withColumn("_keep", F.col("_srn") <= budget)
        )
        pruned = frontier.filter(F.col("_keep")).drop("_salt", "_srn", "_keep")
        spill = frontier.filter(~F.col("_keep")).drop("_salt", "_srn", "_keep")
    else:
        pruned, spill = frontier, None

    w = Window.partitionBy("host").orderBy("seq")
    ranked = pruned.withColumn("rn", F.row_number().over(w))
    scheduled = ranked.filter(F.col("rn") <= budget)
    deferred = ranked.filter(F.col("rn") > budget).drop("rn")
    if spill is not None:
        deferred = deferred.unionByName(spill)
    return scheduled, deferred

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

    Physical shape: the scheduled side compiles to WindowGroupLimit
    (partial per-input-partition top-K BEFORE the shuffle, final after) —
    Catalyst's built-in equivalent of a salted two-phase rank, so a hot
    host never funnels its whole queue through one sort. The deferred
    side must NOT be expressed as ``rank > budget`` (that forces a full
    frontier shuffle+sort): instead derive it with ``deferred_by_cutoff``
    below — a broadcast-join filter with zero wide shuffle.
    """
    if salt > 1:
        # phase 1: cheap pre-prune inside salted slices (no global sort of
        # a hot host's queue); keeps a superset of the true top-K.
        # (Retained for engines without WindowGroupLimit; on Spark >= 3.5
        # the default salt=1 path already gets the partial top-K.)
        wsalt = Window.partitionBy("host", "_salt").orderBy("seq")
        pre = (
            frontier.withColumn(
                "_salt", F.pmod(F.xxhash64("url"), F.lit(salt))
            )
            .withColumn("_srn", F.row_number().over(wsalt))
        )
        pruned = pre.filter(F.col("_srn") <= budget).drop(
            "_salt", "_srn"
        )
    else:
        pruned = frontier

    w = Window.partitionBy("host").orderBy("seq")
    scheduled = (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= budget)
    )
    deferred = deferred_by_cutoff(frontier, scheduled)
    return scheduled, deferred


def deferred_by_cutoff(frontier: DataFrame, scheduled: DataFrame) -> DataFrame:
    """deferred = frontier rows beyond each host's scheduled cutoff.

    The politeness top-K is FIFO by ``seq``, so the budget-th scheduled
    row's seq IS the per-host cutoff: everything with a larger seq stays
    queued. The cutoff table has one row per active host (hosts are the
    seed namespace — inherently small), so this is a broadcast hash join
    + filter: a narrow scan of the frontier, no shuffle, no global sort.
    Hosts with queue ≤ budget get cutoff = max(seq) ⇒ empty deferred set,
    and hosts absent from ``scheduled`` keep all rows (cutoff null).
    """
    cutoff = scheduled.groupBy("host").agg(F.max("seq").alias("_cut"))
    return (
        frontier.join(F.broadcast(cutoff), "host", "left")
        .filter(F.col("_cut").isNotNull() & (F.col("seq") > F.col("_cut")))
        .drop("_cut")
    )

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

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# named frontier priority modes — the oracle simulator implements the same
# names with plain-Python keys (oracle.PRIORITY_KEYS); both sides order
# ascending by (priority, seq) so FIFO breaks ties deterministically.
# 'indegree' is the stateful mode (Cho/Garcia-Molina 1998 backlink-count
# crawl ordering): priority = -(in-link references accumulated through the
# previous round) — resolved by the engine as a schedule-time join against
# its inlinks sidecar, not a column expression.
PRIORITY_MODES = ("fifo", "short_url", "indegree", "pagerank")


def priority_column(mode: str):
    """JVM-side priority expression for a named mode. None for fifo AND
    for stateful modes the engine resolves itself ('indegree' joins the
    accumulated in-link counts at schedule time)."""
    if mode in ("fifo", "indegree", "pagerank"):
        return None
    if mode == "short_url":
        return F.length("url")
    raise ValueError(f"unknown priority_mode {mode!r}; one of {PRIORITY_MODES}")


def delay_budget(
    crawl_delay: float | None, parallelism: int, tick_s: float = 1.0
) -> int:
    """Per-host politeness budget from a robots Crawl-delay.

    One batch round models one ``tick_s``-second tick across all hosts, so
    a host asking for one fetch per ``crawl_delay`` seconds gets
    ``tick_s // crawl_delay`` fetches per round — clamped to [1,
    parallelism]: the batch model's floor is one fetch per round (delays
    longer than a tick can't stretch across rounds without per-host
    clocks), and the ceiling is the reference's scrapeParallelism. No
    delay (or a nonsense value) means the full parallelism, matching the
    reference's behavior of ignoring Crawl-delay entirely."""
    if crawl_delay is None or crawl_delay <= 0:
        return parallelism
    return max(1, min(parallelism, int(tick_s // crawl_delay)))


def delay_period(crawl_delay: float | None, tick_s: float = 1.0) -> int:
    """Cross-round Crawl-delay scheduling period: a host whose delay
    spans k > 1 ticks fetches on every k-th round only (cfg.
    crawl_delay_skip). ``delay_budget`` alone clamps such hosts to one
    fetch per round — still k× more than robots asked for; the period
    makes the long-delay semantics exact in rounds: one batch every
    ceil(delay / tick) rounds. 1 = schedule every round (no delay, or
    delay within one tick)."""
    if crawl_delay is None or crawl_delay <= 0 or crawl_delay <= tick_s:
        return 1
    return math.ceil(crawl_delay / tick_s)


def schedule_topk(
    frontier: DataFrame,
    budget: int,
    salt: int = 1,
    exact_rank: bool = False,
    order_cols: tuple = ("seq",),
    budget_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (scheduled with rn ∈ [1..budget], deferred).

    frontier columns: url, host, seq, sm (+ passthrough). ``rn`` is the
    deterministic batch position (1-based, by ``order_cols``) the rest of
    the round keys ordering off.

    ``order_cols`` is the per-host ordering key tuple (all ascending;
    column names). The default ("seq",) is the reference's FIFO. A
    priority frontier passes e.g. ("prio", "seq") — priority first, FIFO
    within equal priority; the trailing seq keeps the key unique per row,
    which every path below relies on for determinism.

    ``budget_col`` names an optional per-host budget column ON the
    frontier rows (host-keyed politeness delay budgets): the scalar
    ``budget`` must then be its maximum and acts as the prune ceiling;
    rows keep rn ≤ their own budget_col. With budget_col=None every host
    uses the scalar budget.

    Physical shape: the scheduled side compiles to WindowGroupLimit
    (partial per-input-partition top-K BEFORE the shuffle, final after) —
    Catalyst's built-in equivalent of a salted two-phase rank, so a hot
    host never funnels its whole queue through one sort. WindowGroupLimit
    only fires on a LITERAL rank bound, so the per-host filter is applied
    as a second trivial filter after the literal-``budget`` prune. The
    deferred side must NOT be expressed as ``rank > budget`` (that forces
    a full frontier shuffle+sort): for FIFO it's ``deferred_by_cutoff``
    (broadcast cutoff join, zero wide shuffle); for non-FIFO orders the
    scheduled set is not a seq-prefix, so it's a broadcast ANTI-join
    against the (≤ hosts × budget row) scheduled keys — still no shuffle.

    ``exact_rank=True`` computes the IDENTICAL rn via the range-partitioned
    ``fifo_rank`` instead of the window. Use it when the budget covers
    (nearly) the whole frontier: WindowGroupLimit then prunes nothing and
    degenerates to one full single-task sort per host — a serial straggler
    a hot host turns into the round's Amdahl floor. fifo_rank spreads the
    same sort across range partitions regardless of host skew (all
    order_cols are ascending, so it ranks priority orders too).
    """
    assert budget >= 1, "politeness budget must be >= 1"
    fifo = tuple(order_cols) == ("seq",)

    def _cap(scheduled: DataFrame) -> DataFrame:
        if budget_col is None:
            return scheduled
        return scheduled.filter(F.col("rn") <= F.col(budget_col))

    def _deferred(scheduled: DataFrame) -> DataFrame:
        if fifo and budget_col is None:
            return deferred_by_cutoff(frontier, scheduled)
        return frontier.join(
            F.broadcast(scheduled.select("host", "seq")),
            ["host", "seq"],
            "left_anti",
        )

    if exact_rank:
        ranked = fifo_rank(
            frontier,
            frontier.sparkSession.sparkContext.defaultParallelism,
            host_col="host",
            key_cols=tuple(order_cols),
            out="rn",
        )
        scheduled = _cap(
            ranked.filter(F.col("rn") <= budget).withColumn(
                "rn", F.col("rn").cast("int")
            )
        )
        scheduled._fifo_rank_cache = ranked._fifo_rank_cache
        return scheduled, _deferred(scheduled)
    if salt > 1:
        # phase 1: cheap pre-prune inside salted slices (no global sort of
        # a hot host's queue); keeps a superset of the true top-K.
        # (Retained for engines without WindowGroupLimit; on Spark >= 3.5
        # the default salt=1 path already gets the partial top-K.)
        wsalt = Window.partitionBy("host", "_salt").orderBy(*order_cols)
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

    w = Window.partitionBy("host").orderBy(*order_cols)
    scheduled = _cap(
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= budget)
    )
    return scheduled, _deferred(scheduled)


def fifo_rank(
    df: DataFrame,
    num_partitions: int,
    host_col: str = "thost",
    key_cols: tuple = ("phost", "prn", "url"),
    out: str = "rank",
    dedup: bool = False,
    impl: str = "window",
) -> DataFrame:
    """Exact per-host FIFO rank (1-based), skew-proof.

    ``row_number() OVER (PARTITION BY host ORDER BY keys)`` puts one host's
    ENTIRE queue through a single task — a hot host becomes the stage
    straggler at cluster scale. This computes the identical rank in three
    bounded steps:

      1. range-partition by (host, *keys): rows of one host land in key
         order across consecutive partitions, each ≈ total/num_partitions
         regardless of host skew
      2. local rank within (partition, host) — group size bounded by the
         range partition, never by the host
      3. add per-(partition, host) offsets (cumulative counts over the
         tiny (partitions × hosts) aggregate, broadcast back)

    Where the range boundaries fall cannot change the result: offsets
    adapt to whatever split the sampler picked, and the key tuple is
    unique per row, so the composed rank equals the single-window rank
    exactly — determinism and FIFO order are preserved.

    ``impl`` picks how step 2 is computed; both produce identical output:

      - ``"window"``: ``row_number`` over (_pid, host). Simple, but the
        window's required clustering forces a SECOND full-data hash
        exchange + sort after the range exchange (Catalyst cannot prove
        range-partitioning on (host, keys…) clusters (_pid, host)).
      - ``"arrow"``: partition-local sort (no exchange) + an Arrow-batched
        cumulative count per host run (``mapInPandas``; vectorized
        groupby-cumcount with a carry dict across batches of the same
        partition — no per-row Python). One wide exchange total instead
        of two; the trade is one Arrow round-trip of the compact rows.

    The intermediate embeds ``spark_partition_id()`` on top of a
    sampling-based range partitioning and is consumed TWICE (counts/
    offsets, and the join probe side); correctness requires both consumers
    to read the same partition assignment, so it is persisted here — one
    materialization, not an exchange-reuse accident. The cache handle
    rides on the returned DataFrame as ``_fifo_rank_cache`` for the caller
    to unpersist once the result is materialized.
    """
    d = df.repartitionByRange(num_partitions, host_col, *key_cols)
    if dedup:
        # equal (host, *keys) rows land in ONE range partition, so this
        # dropDuplicates satisfies its clustering from the existing range
        # exchange — a fused set-dedup, not an extra shuffle (callers
        # previously paid a separate distinct() exchange for the same set)
        d = d.dropDuplicates([host_col, *key_cols])
    if impl == "arrow":
        ranked = _local_rank_arrow(d, host_col, key_cols).persist()
        cache = ranked
        counts_src = ranked
    elif impl == "window":
        d = d.withColumn("_pid", F.spark_partition_id()).persist()
        w_local = Window.partitionBy("_pid", host_col).orderBy(*key_cols)
        ranked = d.withColumn("_lrank", F.row_number().over(w_local))
        cache = d
        counts_src = d
    else:
        raise ValueError(f"unknown fifo_rank impl {impl!r}")
    counts = counts_src.groupBy("_pid", host_col).agg(F.count("*").alias("_n"))
    w_off = (
        Window.partitionBy(host_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).drop("_n")
    result = (
        ranked.join(F.broadcast(offsets), ["_pid", host_col])
        .withColumn(out, (F.col("_lrank") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrank", "_off")
    )
    result._fifo_rank_cache = cache
    return result


def _local_rank_arrow(d: DataFrame, host_col: str, key_cols: tuple) -> DataFrame:
    """(d sorted within partitions by (host, keys)) + columns ``_pid`` and
    ``_lrank`` — the per-(partition, host) 1-based rank — computed without
    any exchange: sortWithinPartitions is partition-local, and the rank is
    a vectorized cumulative count streamed over each partition's Arrow
    batches (a dict of per-host counts carries across batch boundaries;
    ``Series.map(dict)`` keeps the carry lookup in pandas C code)."""
    from pyspark.sql.types import LongType, StructField, StructType

    s = d.sortWithinPartitions(host_col, *key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    out_schema = StructType(
        s.schema.fields + [StructField("_lrank", LongType(), False)]
    )

    def _rank(batches):
        carry: dict = {}
        for pdf in batches:
            base = pdf.groupby(host_col, sort=False).cumcount().to_numpy() + 1
            offs = (
                pdf[host_col].map(carry).fillna(0).to_numpy(dtype="int64")
            )
            pdf["_lrank"] = base + offs
            for h, c in pdf[host_col].value_counts().items():
                carry[h] = carry.get(h, 0) + int(c)
            yield pdf

    return s.mapInPandas(_rank, schema=out_schema)


def deferred_by_cutoff(frontier: DataFrame, scheduled: DataFrame) -> DataFrame:
    """deferred = frontier rows beyond each host's scheduled cutoff.

    The politeness top-K is FIFO by ``seq``, so the budget-th scheduled
    row's seq IS the per-host cutoff: everything with a larger seq stays
    queued. The cutoff table has one row per active host (hosts are the
    seed namespace — inherently small), so this is a broadcast hash join
    + filter: a narrow scan of the frontier, no shuffle, no global sort.
    Hosts with queue ≤ budget get cutoff = max(seq) ⇒ empty deferred set,
    and hosts absent from ``scheduled`` keep all rows (cutoff null) — with
    budget ≥ 1 every nonempty host schedules at least one row, so a null
    cutoff can only mean the host was never scheduled and its whole queue
    must stay deferred, never be dropped. (Ties with the cutoff seq cannot
    lose rows: seq is unique per host by construction.)
    """
    cutoff = scheduled.groupBy("host").agg(F.max("seq").alias("_cut"))
    return (
        frontier.join(F.broadcast(cutoff), "host", "left")
        .filter(F.col("_cut").isNull() | (F.col("seq") > F.col("_cut")))
        .drop("_cut")
    )


# --- yield-proportional budget allocation (opt-in extension) -----------
#
# The reference gives every host the same fixed per-tick budget
# (Config.scala:38, HostCrawler.scala:171). A production crawl with a
# GLOBAL fetch budget instead allocates it where the frontier is
# growing: a host's weight is the new URLs ENQUEUED TO IT last round
# per fetch it served — fast-growing host queues get more slots next
# round, so the global budget follows demand (queue-growth
# prioritization; the budget-split complement of the
# Cho/Garcia-Molina ordering modes above). Note the credit is inbound:
# the weight measures growth of the host's own queue, not the
# productivity of the host's own fetches. The allocation is the
# largest-remainder (Hamilton) method over integer yield weights —
# exact, deterministic, and mirrored bit-for-bit by the pure-Python
# twin the oracle simulator uses and by the DuckDB SQL generator, so
# the whole mode is oracle-pinned like the other scheduling extensions.
#
# Weights: yield_ppm = min(new_urls * 1e6 DIV max(fetched, 1), 1e9) —
# new queue entries per fetch, in ppm, clamped at 1000x so every
# product below stays in exact int64 for any total_budget <= 1e9. A
# round where no host discovered anything (all weights 0) degenerates
# to an equal split. Every host keeps a floor of ``min_budget``.


def yield_budgets(
    stats: DataFrame,
    total_budget: int,
    min_budget: int = 1,
    host_col: str = "host",
    fetched_col: str = "fetched",
    new_col: str = "new_urls",
) -> DataFrame:
    """(host, fetched, new_urls, yield_ppm, budget) — split
    ``total_budget`` across the hosts of ``stats`` proportionally to
    their new-URLs-per-fetch yield, exactly (sum(budget) ==
    max(total_budget, n_hosts * min_budget); the floor dominates when
    the total is too small). Plan shape: two global windows over a
    host-cardinality table (rows = hosts, the seed namespace — a
    dimension, never the frontier), the same bounded-table idiom as
    analysis/importance.py's score join."""
    assert total_budget > 0 and 0 <= min_budget <= 10**9
    assert total_budget <= 10**9, "clamp keeps products in int64"
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = stats.select(
        F.col(host_col).alias("host"),
        F.col(fetched_col).cast("long").alias("fetched"),
        F.col(new_col).cast("long").alias("new_urls"),
    ).withColumn(
        "yield_ppm",
        F.expr(
            "least(new_urls * 1000000 DIV greatest(fetched, 1), "
            "1000000000)"
        ).cast("long"),
    )
    d = (
        d.withColumn("_nh", F.count("*").over(w_all).cast("long"))
        .withColumn("_sw", F.sum("yield_ppm").over(w_all).cast("long"))
        # all-zero yields -> equal split (weight 1 each)
        .withColumn(
            "_wt",
            F.when(F.col("_sw") == 0, F.lit(1)).otherwise(
                F.col("yield_ppm")
            ),
        )
        .withColumn(
            "_wsum",
            F.when(F.col("_sw") == 0, F.col("_nh")).otherwise(
                F.col("_sw")
            ),
        )
        .withColumn(
            "_B",
            F.greatest(
                F.lit(int(total_budget))
                - F.col("_nh") * int(min_budget),
                F.lit(0),
            ),
        )
        .withColumn("_fl", F.expr("_B * _wt DIV _wsum").cast("long"))
        .withColumn("_rm", F.expr("_B * _wt % _wsum").cast("long"))
        .withColumn("_rem", (F.col("_B") - F.sum("_fl").over(w_all)))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(
                    F.col("_rm").desc(), F.col("host")
                )
            ),
        )
    )
    return d.select(
        "host",
        "fetched",
        "new_urls",
        "yield_ppm",
        (
            F.lit(int(min_budget))
            + F.col("_fl")
            + (F.col("_rk") <= F.col("_rem")).cast("long")
        )
        .cast("long")
        .alias("budget"),
    )


def yield_budgets_py(
    stats: dict[str, tuple[int, int]],
    total_budget: int,
    min_budget: int = 1,
) -> dict[str, int]:
    """Pure-Python twin of ``yield_budgets`` (the oracle simulator's
    side): stats maps host -> (fetched, new_urls)."""
    assert 0 < total_budget <= 10**9 and 0 <= min_budget <= 10**9
    if not stats:
        return {}
    ys = {
        h: min(n * 1_000_000 // max(f, 1), 1_000_000_000)
        for h, (f, n) in stats.items()
    }
    nh = len(ys)
    sw = sum(ys.values())
    if sw == 0:
        w, W = {h: 1 for h in ys}, nh
    else:
        w, W = ys, sw
    B = max(total_budget - nh * min_budget, 0)
    fl = {h: B * w[h] // W for h in w}
    rm = {h: B * w[h] % W for h in w}
    rem = B - sum(fl.values())
    ranked = sorted(w, key=lambda h: (-rm[h], h))
    out = {h: min_budget + fl[h] for h in w}
    for h in ranked[:rem]:
        out[h] += 1
    return out


def yield_budgets_sql(
    table: str,
    total_budget: int,
    min_budget: int = 1,
    host_col: str = "host",
    fetched_col: str = "fetched",
    new_col: str = "new_urls",
) -> str:
    """DuckDB replica of ``yield_budgets`` over a stats table/subquery."""
    t, mb = int(total_budget), int(min_budget)
    return f"""
    WITH _ys AS (
        SELECT {host_col} AS host,
               CAST({fetched_col} AS BIGINT) AS fetched,
               CAST({new_col} AS BIGINT) AS new_urls,
               CAST(least(CAST({new_col} AS BIGINT) * 1000000
                          // greatest(CAST({fetched_col} AS BIGINT), 1),
                          1000000000) AS BIGINT) AS yield_ppm
        FROM {table}
    ), _yg AS (
        SELECT *,
               count(*) OVER () AS _nh,
               sum(yield_ppm) OVER () AS _sw
        FROM _ys
    ), _yh AS (
        SELECT *,
               CASE WHEN _sw = 0 THEN 1 ELSE yield_ppm END AS _wt,
               CASE WHEN _sw = 0 THEN _nh ELSE _sw END AS _wsum,
               greatest({t} - _nh * {mb}, 0) AS _B
        FROM _yg
    ), _yi AS (
        SELECT *,
               _B * _wt // _wsum AS _fl,
               _B * _wt % _wsum AS _rm
        FROM _yh
    ), _yj AS (
        SELECT *,
               _B - sum(_fl) OVER () AS _rem,
               row_number() OVER (ORDER BY _rm DESC, host) AS _rk
        FROM _yi
    )
    SELECT host, fetched, new_urls, yield_ppm,
           CAST({mb} + _fl + CASE WHEN _rk <= _rem THEN 1 ELSE 0 END
                AS BIGINT) AS budget
    FROM _yj
    """

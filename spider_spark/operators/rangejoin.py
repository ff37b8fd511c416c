"""Binned range join: point-in-interval joins without a nested loop.

The reference has no range semantics (SURVEY §2.2 "Joins — sort-merge /
range / as-of / theta" row); this is the second member of the added
join family (with ``operators/asof.py``) that a production crawl lake
needs constantly: "which fetches landed inside each host's throttle /
maintenance / incident window", IP-range → geo lookups, time-window
policy joins.

Why not ``points JOIN intervals ON p BETWEEN lo AND hi`` directly?
Spark plans a pure non-equi join as BroadcastNestedLoopJoin (or a
cartesian product when neither side is broadcastable) — O(|P|·|I|)
comparisons and a single-node bottleneck once the interval side
outgrows the broadcast threshold. The standard scale shape (what
Databricks' range-join optimization and KDB's bucketed window joins do)
is **binning**: chop the number line into fixed-width bins, explode
each interval onto every bin it overlaps, tag each point with the one
bin that contains it, hash-join on the bin id (plus any extra equi
keys, e.g. ``host``), and keep the exact ``lo <= p <= hi`` predicate in
the join condition. The join becomes a plain shuffled/broadcast HASH
join — partitionable, AQE-skew-splittable, no nested loop — at the
cost of ``ceil(width/bin_size) + 1`` replicas per interval.

Picking ``bin_size``: ≈ the p95 interval width. Larger bins → fewer
interval replicas but more false candidate pairs filtered by the exact
predicate; smaller bins → the reverse. Cost is linear either way —
never quadratic — and the explode is a narrow map-side op.

Semantics: inclusive on both ends (``[lo, hi]``), matching DuckDB /
SQL ``BETWEEN`` (the oracle). Rows with a NULL point never match; an
interval with NULL bounds or ``hi < lo`` matches nothing. ``how='left'``
keeps unmatched points with NULL interval columns (the exact range
predicate rides inside the join condition, so bin-collision candidates
that fail ``[lo, hi]`` do not produce spurious matched rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: int,
    extra_keys: tuple = (),
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    ``[lo_col, hi_col]`` contains ``point_col`` (inclusive), optionally
    also equi-matching ``extra_keys`` (columns present on BOTH sides,
    e.g. ``("host",)``).

    All of ``point_col``/``lo_col``/``hi_col`` must be integer-valued
    (e.g. microseconds from ``timestampdiff`` — never raw timestamps,
    which drag timezones in). Output = all point columns + all interval
    columns except the join keys' right-side duplicates; each matching
    (point, interval) pair appears exactly once (a point lies in exactly
    one bin, and an interval's bin list contains that bin at most once).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if bin_size <= 0:
        raise ValueError(f"bin_size must be positive, got {bin_size}")

    pb = points.withColumn(
        _BIN, F.floor(F.col(point_col) / F.lit(bin_size)).cast("long")
    )
    # Explode each interval onto every bin it overlaps. sequence() is a
    # narrow JVM op; empty/NULL-bounded intervals yield no bins (the
    # where-clause guard keeps sequence() from seeing hi < lo).
    ib = (
        intervals.where(
            F.col(lo_col).isNotNull()
            & F.col(hi_col).isNotNull()
            & (F.col(hi_col) >= F.col(lo_col))
        )
        .withColumn(
            _BIN,
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / F.lit(bin_size)).cast("long"),
                    F.floor(F.col(hi_col) / F.lit(bin_size)).cast("long"),
                )
            ),
        )
    )
    cond = pb[_BIN] == ib[_BIN]
    for k in extra_keys:
        cond = cond & (pb[k] == ib[k])
    # The exact range predicate lives IN the join condition so that
    # how='left' emits exactly one NULL row per unmatched point instead
    # of bin-collision ghosts.
    cond = (
        cond
        & (pb[point_col] >= ib[lo_col])
        & (pb[point_col] <= ib[hi_col])
    )
    joined = pb.join(ib, cond, how)
    drop_right = [ib[_BIN]] + [ib[k] for k in extra_keys]
    out = joined.drop(*drop_right).drop(_BIN)
    return out


def synth_intervals(spark, n: int = 200) -> DataFrame:
    """Deterministic closed-form interval fixture over the `events`
    timeline (events start 2024-01-01, ~3.5 min apart): ``n`` windows,
    lo minute ``(i*181) % 30000``, width ``5 + (i*7) % 240`` minutes,
    expressed in integer microseconds since the naive epoch — the same
    arithmetic ``synth_intervals_sql`` hands DuckDB, so no external
    data and no row transfer."""
    base_us = 1704067200000000  # 2024-01-01 00:00:00 naive, micros
    i = F.col("id")
    lo_min = (i * 181) % 30000
    width_min = F.lit(5) + (i * 7) % 240
    return spark.range(n).select(
        i.cast("long").alias("interval_id"),
        (F.lit(base_us) + lo_min * 60_000_000).cast("long").alias("lo_us"),
        (F.lit(base_us) + (lo_min + width_min) * 60_000_000)
        .cast("long")
        .alias("hi_us"),
    )


def synth_intervals_sql(n: int = 200) -> str:
    """DuckDB replica of ``synth_intervals`` (same closed form)."""
    return f"""
        SELECT i::BIGINT AS interval_id,
               (1704067200000000 + ((i*181) % 30000) * 60000000)::BIGINT
                 AS lo_us,
               (1704067200000000
                + ((i*181) % 30000 + 5 + (i*7) % 240) * 60000000)::BIGINT
                 AS hi_us
        FROM range({n}) t(i)
    """

"""As-of (most-recent-preceding) join — an operator Spark lacks natively.

A crawl pipeline needs it constantly: join every fetch event to the
robots-policy snapshot in force AT that moment, to the frontier config of
its round, to the freshest sitemap generation — "the newest right row at
or before my timestamp, per key". The reference never needs it (one
robots fetch per host per run, HostCrawler.scala:76-91); an incremental
production crawl with policy *history* does.

Spark has no ASOF JOIN. The naive encodings are disqualified at scale:

  - non-equi range join (``l.ts >= r.ts`` + window-max) → Catalyst plans
    a broadcast-nested-loop or cartesian product;
  - per-key ``collect_list`` + UDF binary search → driver-size state and
    Python in the hot path.

This implementation is the union-sort trick: tag both sides, UNION them,
and run ``last(value, ignorenulls=True)`` over one
``Window.partitionBy(key).orderBy(ts, side)`` — right rows sort BEFORE
left rows at equal timestamps, so the match is inclusive (``r.ts <=
l.ts``), exactly DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` semantics,
which is the test oracle. ONE shuffle total, keyed like any window; skew
is per-key row volume, the same envelope as sessionization. Rows-frame
``last`` is a running carry — no per-key buffering beyond Spark's own
window spill.

``tolerance_us`` bounds staleness (a match older than the tolerance
nulls out — pandas ``merge_asof(tolerance=...)`` semantics), which is
also the state-bounding knob at lake scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analysis.sessions import _us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str] = ("host",),
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of-backward join: every ``left`` row gains the
    ``value_cols`` of the newest ``right`` row with ``right.ts <=
    left.ts`` on the same key (or nulls if none / out of tolerance).

    Requirements (asserted by construction, mirrored by the oracle):
    ``right`` must have at most one row per (key, right_ts) — as-of over
    ambiguous snapshots is undefined in every engine. Timestamps are
    compared as integer microseconds (TIMESTAMP_NTZ, no timezone).

    Returns all ``left`` columns plus ``value_cols`` and
    ``matched_ts_us`` (microseconds of the matched right row, null when
    unmatched) — the audit column that makes staleness measurable
    downstream.
    """
    keys = list(key_cols)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    vals = list(value_cols)
    left_payload = [c for c in left.columns]

    l_tagged = left.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        _us(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left_payload).alias("_lrow"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_rv_{v}")
          for v in vals],
        F.lit(None).cast("long").alias("_rts"),
    )
    r_tagged = right.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        _us(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(v).alias(f"_rv_{v}") for v in vals],
        _us(right_ts).alias("_rts"),
    )

    w = (
        Window.partitionBy(*[f"_k_{k}" for k in keys])
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged)
    for v in vals:
        carried = carried.withColumn(
            f"_rv_{v}", F.last(f"_rv_{v}", ignorenulls=True).over(w)
        )
    carried = carried.withColumn(
        "_rts", F.last("_rts", ignorenulls=True).over(w)
    )

    out = carried.filter(F.col("_side") == 1)
    if tolerance_us is not None:
        stale = F.col("_rts").isNull() | (
            F.col("_ts") - F.col("_rts") > F.lit(tolerance_us)
        )
        for v in vals:
            out = out.withColumn(
                f"_rv_{v}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"_rv_{v}")),
            )
        out = out.withColumn(
            "_rts", F.when(stale, F.lit(None)).otherwise(F.col("_rts"))
        )
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left_payload],
        *[F.col(f"_rv_{v}").alias(v) for v in vals],
        F.col("_rts").alias("matched_ts_us"),
    )


# ------------------------------------------------------------ DuckDB oracle


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    key_cols: Sequence[str] = ("host",),
    left_cols: Sequence[str] = (),
    value_cols: Sequence[str] = (),
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int | None = None,
) -> str:
    """DuckDB replica using the native ``ASOF LEFT JOIN`` (inclusive
    ``l.ts >= r.ts``, newest match — the same semantics the union-sort
    implementation produces). Tolerance is applied as a post-filter that
    nulls out stale matches, mirroring ``asof_join``."""
    keys = list(key_cols)
    on = " AND ".join([f"l.{k} = r.{k}" for k in keys])
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    tol_cond = (
        "r.ts_us IS NOT NULL"
        if tolerance_us is None
        else f"r.ts_us IS NOT NULL AND epoch_us(l.{left_ts}) - r.ts_us"
        f" <= {tolerance_us}"
    )
    vsel = ", ".join(
        f"CASE WHEN {tol_cond} THEN r.{v} END AS {v}" for v in value_cols
    )
    return f"""
    SELECT {lsel}, {vsel},
           CASE WHEN {tol_cond} THEN r.ts_us END AS matched_ts_us
    FROM ({left_sql}) l
    ASOF LEFT JOIN (
      SELECT *, epoch_us({right_ts})::BIGINT AS ts_us FROM ({right_sql})
    ) r ON {on} AND l.{left_ts} >= r.{right_ts}
    """

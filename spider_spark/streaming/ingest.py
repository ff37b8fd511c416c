"""Structured-Streaming consumption of the engine's per-round sinks.

The reference crawler is a continuous Akka stream; this engine is
batch-iterative, but its work_dir sinks (``order/round=N``,
``seen/round=N`` parquet deltas) are append-only directories — exactly
the shape Structured Streaming's file source incrementally tails. These
operators let a downstream consumer (index builder, stats dashboard,
training-data pipeline) follow a LIVE crawl without rescanning history:
each micro-batch sees only newly-landed round files, and stateful ops
(streaming seen-dedup) carry their state in the state store.

At the 100-TB design point the same topology runs against a cloud bucket
the crawl appends to: file-source listing + ``maxFilesPerTrigger``
bounds each micro-batch, aggregation state lives in the (RocksDB) state
store, and ``Trigger.AvailableNow`` turns any of these into a catch-up
batch job with streaming semantics (used by the tests — deterministic,
no open-ended query).

All operators are plain DataFrame transformations usable on batch OR
streaming inputs — the streaming-ness comes from the reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_sink_stream(
    spark: SparkSession, work_dir: str, kind: str, max_files: int | None = None
) -> DataFrame:
    """readStream over one engine sink (``order`` / ``seen`` / ``urls`` /
    ``fetched``). Schema is taken from the already-landed files (the file
    source requires one); ``round=N`` partition dirs surface as a
    ``round`` column via partition discovery with basePath."""
    base = os.path.join(work_dir, kind)
    static = spark.read.option("basePath", base).parquet(base)
    r = spark.readStream.schema(static.schema).option("basePath", base)
    if max_files is not None:
        r = r.option("maxFilesPerTrigger", str(max_files))
    return r.parquet(os.path.join(base, "round=*"))


def crawl_order_stats(order: DataFrame) -> DataFrame:
    """Streaming R26/R27: per-(round, host) fetch counts + sitemap share.
    On a stream this is a stateful aggregation (update/complete mode);
    on a batch frame it is the plain groupBy."""
    return order.groupBy("round", "host").agg(
        F.count("*").cast("long").alias("n_fetched"),
        F.sum(F.col("sm").cast("long")).cast("long").alias("n_sitemap"),
        F.max("rn").cast("long").alias("max_rn"),
    )


def streaming_seen_dedup(seen: DataFrame) -> DataFrame:
    """Streaming R4: first sighting of each URL across all micro-batches.
    ``dropDuplicates`` on a stream keeps per-key state in the state store
    — the streaming analogue of the batch anti-join against the
    accumulated seen set (bounded state: one short row per distinct URL,
    the same cardinality the batch seen table carries)."""
    return seen.select("url", "host").dropDuplicates(["url"])


def host_budget_alert(order: DataFrame, budget: int) -> DataFrame:
    """Hosts that hit the politeness budget in a round — the operational
    signal that a host's frontier is saturating (R8's cap binding)."""
    return (
        order.groupBy("round", "host")
        .agg(F.count("*").cast("long").alias("n_fetched"))
        .filter(F.col("n_fetched") >= budget)
    )


def run_available_now(
    df: DataFrame,
    table: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain everything currently in the source into an in-memory sink
    table with streaming semantics, then stop (Trigger.AvailableNow).
    Deterministic — used by tests and catch-up jobs; a live deployment
    uses the same query without the trigger."""
    q = (
        df.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

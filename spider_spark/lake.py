"""Bucketed lake layout: shuffle-free co-located joins for the big state
tables.

The engine's widest recurring joins are keyed on the URL — the R4 seen
anti-join (candidates vs the ever-growing seen set) and the R10 fetch
join (scheduled vs documents). At the 10^10-URL design point both sides
are far past broadcast range, so every round pays a full shuffle of both
sides unless the tables are CO-LOCATED: written bucketed by the join key
into the same bucket count, so the join compiles to a zipped
per-bucket sort-merge with NO Exchange on either side (SURVEY.md §1.2
prescribes `bucket(N, url)` for `seen`; Iceberg bucket partitioning is
the managed-catalog equivalent of Spark's Hive-style bucketing used
here — the sandbox has no catalog service, so `saveAsTable` against the
local warehouse is the stand-in with identical plan shape).

``write_bucketed`` / ``read_table`` wrap the layout so callers can't
mismatch bucket counts by accident, and ``bucketed_anti_join`` /
``bucketed_equi_join`` express the two engine joins against bucketed
state. tests/test_lake.py pins the plan property this module exists
for: the bucketed-bucketed join has ZERO Exchange operators, and the
same join over plain parquet has two.

Scale notes:
 - Bucket count is a layout constant (like cfg.num_seen_buckets — and
   persisted the same way; see operators/dedup.py's geometry columns):
   changing it requires a rewrite, so it is sized for the design point
   (4096 at 10^10 urls → ~2.4M urls/bucket), not the sandbox.
 - Bucketed writes sort within buckets by the key: the sort-merge join
   then needs no sort either (SortMergeJoin reads pre-sorted buckets).
 - A bucketed table is also the right layout for the bloom/cuckoo
   sidecars: the sidecar's `bucket` column is exactly
   `pmod(xxhash64(url), n_buckets)`, aligning filter rows with table
   buckets (operators/dedup.py builds it that way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "url",
    n_buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write ``df`` as a table bucketed AND sorted by ``key`` (external
    when ``path`` is given — bucketing metadata lives in the catalog
    either way). Both sides of a future co-located join must use the
    same ``key`` type and ``n_buckets``."""
    w = (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_anti_join(
    candidates: DataFrame, seen: DataFrame, key: str = "url"
) -> DataFrame:
    """R4 over bucketed state: candidates (bucketed) minus seen
    (bucketed) — zero-Exchange when both inputs are bucketed tables with
    matching bucket specs."""
    return candidates.join(seen, key, "left_anti")


def bucketed_equi_join(
    scheduled: DataFrame,
    documents: DataFrame,
    key_l: str = "url",
    key_r: str = "doc_id",
) -> DataFrame:
    """R10 over bucketed state: the fetch join, co-located when both
    tables are bucketed on their join key with the same count."""
    return scheduled.join(
        documents, scheduled[key_l] == documents[key_r], "left"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange operators in the (pre-AQE-execution) physical
    plan — the property bucketing exists to zero out."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    return plan.split("== Initial Plan ==")[0].count("Exchange")

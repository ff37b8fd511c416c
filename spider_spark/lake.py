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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def register_external_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    key: str,
    n_buckets: int,
    schema_ddl: str,
) -> None:
    """(Re-)register catalog metadata for a directory of files previously
    written by :func:`write_bucketed` (bucket ids ride in the file names,
    so the files themselves carry the layout; only the catalog entry is
    session-scoped). Used after a compaction rename or on engine restart —
    the Iceberg-catalog analogue is table metadata pointing at the same
    manifests after a rewrite commit."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


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


# --- Z-order clustering -----------------------------------------------
#
# Multi-dimensional data skipping: parquet/Iceberg file pruning works off
# per-file min/max column stats, which a single-column sort only tightens
# for ONE column. Interleaving the bits of two (or more) dimension keys
# into one sort key (Morton / Z-order — what Iceberg's
# `rewrite_data_files(strategy => 'sort', sort_order => zorder(...))`
# computes) makes files tight rectangles in BOTH dimensions, so a
# predicate on either one prunes. The interleave below is plain integer
# bit arithmetic generated for both engines' SQL dialects, so the key —
# not just the idea — is DuckDB-oracle-checkable.


def zorder_key_sql(
    cols: list[str], bits: int = 16, dialect: str = "spark"
) -> str:
    """SQL expression interleaving the low ``bits`` bits of each integer
    expression in ``cols`` into one bigint Morton key: bit k of dimension
    d lands at position k*len(cols)+d. Inputs are masked to ``bits``
    wide; callers pass NON-NEGATIVE dimension keys (rank/bucket them
    first if the domain is signed or unbounded — masking a hash or a
    rank is the normal case). len(cols)*bits must stay < 63.
    Dialects differ only in shift syntax (Spark: shiftleft/shiftright
    functions; DuckDB: << / >> operators)."""
    d = len(cols)
    assert d >= 1 and bits >= 1 and d * bits < 63
    mask = (1 << bits) - 1
    terms = []
    for di, c in enumerate(cols):
        for k in range(bits):
            pos = k * d + di
            masked = f"(CAST({c} AS BIGINT) & {mask})"
            if dialect == "spark":
                bit = f"(shiftright({masked}, {k}) & 1)"
                terms.append(f"shiftleft({bit}, {pos})" if pos else bit)
            else:
                bit = f"(({masked} >> {k}) & 1)"
                terms.append(f"({bit} << {pos})" if pos else bit)
    # disjoint bit positions, so + == | (and + reads the same everywhere)
    return "(" + " + ".join(terms) + ")"


def with_zorder(
    df: DataFrame, cols: list[str], bits: int = 16, out: str = "zkey"
) -> DataFrame:
    """Attach the Morton key — write the table `sortWithinPartitions(out)`
    (after a range repartition on it) to get z-clustered files."""
    return df.withColumn(out, F.expr(zorder_key_sql(cols, bits, "spark")))


# --- Small-file compaction --------------------------------------------
#
# The crawl appends per-round deltas: at 10^10 URLs the lake accrues
# millions of small files (every round × partition × writer task), and
# scan cost becomes dominated by file-open overhead and un-prunable tiny
# footers. Compaction = rewrite many small files into ~target-size ones,
# partition-locally. The PLANNING step is metadata-only (the file
# inventory — what Iceberg keeps in manifests — never the data), and the
# rewrite is embarrassingly parallel per output group; this is Iceberg's
# `rewrite_data_files(strategy => 'binpack')` re-expressed over an
# inventory DataFrame so the plan itself is deterministic and
# oracle-checkable.


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "partition",
    path_col: str = "path",
    size_col: str = "size_bytes",
) -> DataFrame:
    """(partition, path, size_bytes, grp) — deterministic next-fit-
    decreasing bin packing WITHIN each partition: files at or above
    ``target_bytes`` keep a group of their own; smaller files are ordered
    (size desc, path) and grouped by running-sum DIV target (the same
    exact-integer cumsum//window contract as packing.pack_sequences, so
    the assignment never drifts between engines). grp numbering is
    per-partition, dense from 0 over the packed files; full-size files
    get negative groups (-1, -2, ... in the same ordering) meaning
    "leave in place".

    Metadata-scale: one window over the file inventory (rows = files,
    not data); the plan output is the rewrite job's task list.
    """
    assert target_bytes > 0
    w = Window.partitionBy(part_col).orderBy(
        F.col(size_col).desc(), F.col(path_col)
    )
    small = F.col(size_col) < target_bytes
    cum_before = F.coalesce(
        F.sum(F.when(small, F.col(size_col)).otherwise(F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    big_rank = F.sum(F.when(small, 0).otherwise(1)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        files.select(
            F.col(part_col).alias("partition"),
            F.col(path_col).alias("path"),
            F.col(size_col).cast("long").alias("size_bytes"),
            cum_before.cast("long").alias("_cum"),
            big_rank.cast("long").alias("_bigrank"),
        )
        .withColumn(
            "grp",
            F.when(
                F.col("size_bytes") < target_bytes,
                # integer DIV, never float: sizes sum to lake scale
                F.expr(f"_cum div {int(target_bytes)}"),
            ).otherwise(-F.col("_bigrank")).cast("long"),
        )
        .drop("_cum", "_bigrank")
    )


def compaction_stats(plan: DataFrame) -> DataFrame:
    """(partition, n_files, n_small, bytes_small, n_groups,
    files_after) — per-partition before/after accounting of a
    ``compaction_plan``. files_after = groups (merged) + full-size files
    (left in place)."""
    packed = F.col("grp") >= 0
    return plan.groupBy("partition").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(packed.cast("long")).cast("long").alias("n_small"),
        F.sum(F.when(packed, F.col("size_bytes")).otherwise(0))
        .cast("long")
        .alias("bytes_small"),
        F.count_distinct(F.when(packed, F.col("grp")))
        .cast("long")
        .alias("n_groups"),
        (
            F.count_distinct(F.when(packed, F.col("grp")))
            + F.sum((~packed).cast("long"))
        )
        .cast("long")
        .alias("files_after"),
    )


def parquet_inventory(spark: SparkSession, path: str) -> DataFrame:
    """File inventory (partition, path, size_bytes) of a parquet
    directory tree — partition = the relative subdirectory ('' for flat
    layouts). Driver-side listing, same as any table-format manifest
    read; at lake scale the inventory comes from Iceberg metadata tables
    instead (`table.files`), with identical shape."""
    rows = []
    root = os.path.abspath(path)
    for dirpath, _dirs, names in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        rel = "" if rel == "." else rel
        for nm in sorted(names):
            if not nm.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, nm)
            rows.append((rel, full, os.path.getsize(full)))
    return spark.createDataFrame(
        rows or [("", "", 0)],
        "partition string, path string, size_bytes long",
    ).filter(F.col("path") != "")


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int,
    max_workers: int = 8,
) -> DataFrame:
    """Execute a bin-pack compaction of ``src`` into ``dst``: plan over
    the real file inventory, then rewrite each group as one file (one
    independent read→write job per group, thread-parallel — the same
    task decomposition a distributed rewrite uses; full-size files are
    copied through unchanged as their own groups). Returns the plan.
    Row-for-row content is preserved (tests pin equality)."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    s, d = os.path.abspath(src), os.path.abspath(dst)
    if s == d or s.startswith(d + os.sep) or d.startswith(s + os.sep):
        # dst == src / dst-ancestor-of-src: rmtree(dst) below would
        # delete the source before the inventory is even read. dst
        # INSIDE src: output groups land under the source tree, so any
        # later read or re-inventory of src double-counts them.
        raise ValueError(
            f"dst ({dst}) must not be src, an ancestor of src, or "
            f"inside src ({src})"
        )
    if os.path.isdir(dst):
        # a previous (differently-planned) compaction's groups must not
        # survive alongside this one's
        shutil.rmtree(dst)
    plan = compaction_plan(
        parquet_inventory(spark, src), target_bytes
    ).cache()
    rows = plan.collect()
    by_key: dict[tuple, list] = {}
    for r in rows:
        by_key.setdefault((r["partition"], r["grp"]), []).append(r["path"])
    groups = [(p, g, paths) for (p, g), paths in sorted(by_key.items())]
    plan.unpersist()

    def _rewrite(item):
        (part, grp, paths) = item
        sub = os.path.join(dst, part) if part else dst
        # 'grp-N', not 'grp=N': an '=' dir would be picked up as a
        # partition column by parquet directory discovery on read-back
        out = os.path.join(sub, f"grp-{grp}")
        spark.read.parquet(*paths).coalesce(1).write.mode(
            "overwrite"
        ).parquet(out)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        list(ex.map(_rewrite, groups))
    return plan


def compaction_plan_sql(
    table: str,
    target_bytes: int,
    part_col: str = "partition",
    path_col: str = "path",
    size_col: str = "size_bytes",
) -> str:
    """DuckDB replica of ``compaction_plan``."""
    t = int(target_bytes)
    return f"""
    SELECT {part_col} AS partition, {path_col} AS path,
           CAST({size_col} AS BIGINT) AS size_bytes,
           CAST(CASE WHEN {size_col} < {t} THEN
             coalesce(sum(CASE WHEN {size_col} < {t} THEN {size_col}
                          ELSE 0 END) OVER (
               PARTITION BY {part_col}
               ORDER BY {size_col} DESC, {path_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // {t}
           ELSE
             -sum(CASE WHEN {size_col} < {t} THEN 0 ELSE 1 END) OVER (
               PARTITION BY {part_col}
               ORDER BY {size_col} DESC, {path_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           END AS BIGINT) AS grp
    FROM {table}
    """


def compaction_stats_sql(plan_sql: str) -> str:
    """DuckDB replica of ``compaction_stats`` over a plan produced by
    ``compaction_plan_sql`` (pass that SQL in)."""
    return f"""
    WITH plan AS ({plan_sql})
    SELECT partition,
           count(*) AS n_files,
           CAST(sum(CASE WHEN grp >= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small,
           CAST(sum(CASE WHEN grp >= 0 THEN size_bytes ELSE 0 END)
               AS BIGINT) AS bytes_small,
           CAST(count(DISTINCT CASE WHEN grp >= 0 THEN grp END) AS BIGINT)
               AS n_groups,
           CAST(count(DISTINCT CASE WHEN grp >= 0 THEN grp END)
                + sum(CASE WHEN grp < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS files_after
    FROM plan GROUP BY 1
    """


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange operators in the (pre-AQE-execution) physical
    plan — the property bucketing exists to zero out."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    return plan.split("== Initial Plan ==")[0].count("Exchange")

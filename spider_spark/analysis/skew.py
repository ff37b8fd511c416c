"""Shuffle-skew diagnosis: hot-key detection + salt-factor planning.

The north rule requires partitioning / shuffle / skew "handled
explicitly". The engine already *consumes* skew handling (salted seen
buckets, `fifo_rank`'s range partitioning, AQE skew-join splits); this
module is the *diagnosis* side a 100-TB operator runs before picking
those knobs: given the key you are about to shuffle on, which keys
overflow their fair share of a P-partition exchange, by how much, and
what salt factor would level them.

Everything is exact integer arithmetic (the family determinism contract
— see analysis/importance.py / graph.pagerank_int), so the report is
bit-identical on any engine and DuckDB-oracle-checkable:

  - fair share of P partitions over N rows = the ideal per-partition
    load N/P; a key is HOT iff ``c_key * P > N`` (strictly above fair
    share — at most P-1 keys can satisfy this, so the hot-key report is
    bounded by the partition count no matter how many distinct keys the
    corpus has).
  - ``salt_factor`` = ceil(c_key * P / N) = the number of salt buckets
    that brings the key's per-bucket load back under fair share — the
    `S` to use in `repartition(concat(key, pmod(xxhash64(url), S)))`
    (SURVEY.md §4.1's salting recipe).
  - ``load_ppm`` = c_key * P * 1_000_000 DIV N — the key's load as
    parts-per-million of one fair partition share (1_000_000 = exactly
    fair).

Plan shape at 100 TB: one combine-heavy groupBy(key) (the shuffle
carries <= distinct-keys rows per upstream partition, with map-side
partial aggregation), then a scan-side filter that bounds the output by
P rows. The total-row scalar is collected and inlined as a literal —
the idiom search_bm25 documents (a 1-row crossJoin plans a
BroadcastNestedLoopJoin; a literal does not). ``partition_load``
projects the post-shuffle partition histogram (<= P rows) using the
portable md5_u32 router so DuckDB reproduces the exact assignment; the
engine's real router is xxhash64-based but any uniform hash gives the
same *load* statistics for the non-hot mass, and hot keys dominate
either way.

The reference has no skew concept (one actor per host IS its partition
scheme, Supervisor.scala:181-199); this is added scale tooling, same
tier as analysis/sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_u32_duckdb, md5_u32_sql


def _total_rows(df: DataFrame) -> int:
    """Collected scalar, inlined as a literal by callers (see module
    docstring for why not a 1-row join)."""
    return df.count()


def hot_keys(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 32,
    total: int | None = None,
) -> DataFrame:
    """(key, n_rows, load_ppm, salt_factor) for every key strictly above
    the fair per-partition share of an ``n_partitions``-way shuffle —
    at most n_partitions - 1 rows, however many distinct keys exist.

    ``salt_factor`` (= ceil(load)) is the salt bucket count that levels
    the key; non-hot keys (not returned) would report 1. Null keys count
    like any other key (they hash to one partition too).
    """
    if n_partitions <= 0:
        raise ValueError(f"n_partitions must be > 0, got {n_partitions}")
    n = total if total is not None else _total_rows(df)
    if n <= 0:
        raise ValueError("empty input has no skew")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    p = int(n_partitions)
    # load_ppm = floor(c*P*1e6 / N) computed as P*floor(c*1e6/N) +
    # floor((c*1e6 mod N)*P/N) — exact (a = qN+r ⇒ floor(aP/N) = qP +
    # floor(rP/N)) and overflow-free at the 10^10-row design point,
    # where the naive c*P*1e6 product exceeds int64 (c*1e6 <= ~1e16 and
    # (N-1)*P stay comfortably inside)
    load = (
        f"(n_rows * 1000000 DIV {n}) * {p} "
        f"+ ((n_rows * 1000000 % {n}) * {p}) DIV {n}"
    )
    return (
        counts.filter(F.col("n_rows") * p > n)
        .select(
            "key",
            "n_rows",
            F.expr(load).cast("long").alias("load_ppm"),
            F.expr(f"(n_rows * {p} + {n} - 1) DIV {n}")
            .cast("long")
            .alias("salt_factor"),
        )
    )


def partition_load(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 32,
    total: int | None = None,
) -> DataFrame:
    """(partition, n_keys, n_rows, load_ppm) — the projected load
    histogram of hash-partitioning ``df`` on ``key_col`` into
    ``n_partitions`` partitions (portable md5_u32 router, so the oracle
    reproduces the exact assignment). load_ppm = 1_000_000 ⇔ exactly the
    fair share; max(load_ppm) is the stage's straggler factor.

    Output <= n_partitions rows; one combine-heavy groupBy(key) feeding
    a second bounded groupBy(partition).
    """
    if n_partitions <= 0:
        raise ValueError(f"n_partitions must be > 0, got {n_partitions}")
    n = total if total is not None else _total_rows(df)
    if n <= 0:
        raise ValueError("empty input has no load to partition")
    # NULL keys route like any other key (a real hash partitioner sends
    # them to one concrete partition): coalesce to '' before hashing —
    # mirrored in the SQL replica; the ''-key collision is documented
    part = (
        F.expr(
            md5_u32_sql(f"coalesce(cast({key_col} as string), '')")
        )
        % n_partitions
    ).cast("long")
    p = int(n_partitions)
    load = (
        f"(n_rows * 1000000 DIV {n}) * {p} "
        f"+ ((n_rows * 1000000 % {n}) * {p}) DIV {n}"
    )
    return (
        df.select(part.alias("partition"), F.col(key_col).alias("_k"))
        .groupBy("partition", "_k")
        .agg(F.count("*").cast("long").alias("_c"))
        .groupBy("partition")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("_c").cast("long").alias("n_rows"),
        )
        .withColumn("load_ppm", F.expr(load).cast("long"))
    )


def hot_keys_sql(
    table: str, key_col: str, n_partitions: int, total: int | str
) -> str:
    """DuckDB replica of ``hot_keys``. ``total`` is the same N the Spark
    side inlined — an int literal, or a SQL snippet (e.g. a scalar
    subquery ``(SELECT count(*) FROM t)``) that evaluates to it."""
    p = int(n_partitions)
    n = f"({total})"
    load = (
        f"(count(*) * 1000000 // {n}) * {p} "
        f"+ ((count(*) * 1000000 % {n}) * {p}) // {n}"
    )
    return f"""
    SELECT {key_col} AS key,
           count(*) AS n_rows,
           CAST({load} AS BIGINT) AS load_ppm,
           CAST((count(*) * {p} + {n} - 1) // {n} AS BIGINT)
               AS salt_factor
    FROM {table}
    GROUP BY 1
    HAVING count(*) * {p} > {n}
    """


def partition_load_sql(
    table: str, key_col: str, n_partitions: int, total: int | str
) -> str:
    """DuckDB replica of ``partition_load`` (``total`` as in
    ``hot_keys_sql``)."""
    p = int(n_partitions)
    n = f"({total})"
    h = md5_u32_duckdb(f"coalesce(CAST({key_col} AS VARCHAR), '')")
    load = (
        f"(sum(c) * 1000000 // {n}) * {p} "
        f"+ ((sum(c) * 1000000 % {n}) * {p}) // {n}"
    )
    return f"""
    WITH per_key AS (
        SELECT CAST(({h}) % {p} AS BIGINT) AS partition,
               {key_col} AS k, count(*) AS c
        FROM {table} GROUP BY 1, 2
    )
    SELECT partition,
           count(*) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST({load} AS BIGINT) AS load_ppm
    FROM per_key GROUP BY 1
    """

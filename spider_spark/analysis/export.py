"""Training-data export: sharded corpus writes with a verifiable manifest.

The last step of a crawl→training pipeline is handing the corpus to a
data loader as a fixed set of shard files plus a manifest the loader can
trust (the reference stops at its Elasticsearch sink — Indexer.scala
upserts documents one-by-one; a training consumer instead wants
immutable shard files and per-shard accounting). Three pieces:

  - ``shard_assign``: deterministic, growth-stable shard assignment —
    ``shard = md5_u32('sh:' || id) % n_shards``. Pure projection (zero
    shuffle); the same contract as ``sampling.split_assign``: a document
    never changes shards as the corpus grows, so incremental re-exports
    only rewrite shards whose membership changed.
  - ``shard_manifest``: per-shard accounting — doc count, whitespace
    token count, char count, and an ORDER-INDEPENDENT content checksum
    (sum of a second, independent md5-u32 of ``id || ':' || n_chars``,
    plain int64 — commutative, so engine- and summation-order-exact,
    unlike any float or concat-based digest). One combine-heavy groupBy
    producing exactly ``n_shards`` rows: at 100 TB the shuffle moves
    per-partition partials, and the manifest stays driver-tiny.
  - ``export_text_shards``: the write itself — ``partitionBy('shard')``
    JSONL (optionally gzip), one directory per shard, embarrassingly
    parallel, no global ordering requirement. Returns the manifest of
    what was written; tests re-read the files and re-derive the manifest
    to prove write/read round-trip fidelity.

The checksum key hashes ``n_chars`` alongside the id so content edits
(not just membership churn) flip the manifest row — the loader-side
validation is ``recompute(manifest) == manifest``, one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.hashing import (
    md5_u32_duckdb,
    md5_u32_sql,
)

from .dedup import _tokens_expr


def shard_assign(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a deterministic ``shard`` column in [0, n_shards)."""
    assert n_shards > 0
    h = md5_u32_sql(f"concat('sh:', cast({id_col} as string))")
    return df.withColumn("shard", (F.expr(h) % n_shards).cast("int"))


def _manifest_agg(
    d: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The manifest aggregation over rows that already carry ``shard``."""
    n_chars = F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long")
    d = d.select(
        "shard",
        F.col(id_col).alias("_id"),
        n_chars.alias("_nc"),
        F.size(F.expr(_tokens_expr(text_col))).cast("long").alias("_nt"),
    )
    ck = md5_u32_sql("concat('ck:', cast(_id as string), ':', cast(_nc as string))")
    return (
        d.withColumn("_ck", F.expr(ck))
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.sum("_nc").alias("n_chars"),
            F.sum("_ck").alias("checksum"),
        )
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shard, n_docs, n_tokens, n_chars, checksum) — one row per
    non-empty shard, exact int64 everywhere.

    checksum = sum(md5_u32('ck:' || id || ':' || n_chars)): order- and
    partitioning-independent (commutative int64 sum, max n_docs·2^32 ≪
    2^63), recomputable by any engine from the shard files alone.
    """
    return _manifest_agg(shard_assign(df, n_shards, id_col), id_col, text_col)


def export_text_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    compression: str | None = "gzip",
) -> DataFrame:
    """Write (id, text, shard) as shard-partitioned JSONL under ``path``
    and return the manifest OF THE FILES — re-read from ``path``, not
    recomputed from ``df``, so the returned accounting describes what a
    loader will actually see even if ``df`` re-reads a source that
    changed between the two jobs.

    The write itself is one shuffle-free job: partitionBy routes rows by
    the already-computed shard column. Callers that need exactly one file
    per shard repartition by shard first — at scale multiple files per
    shard directory is the correct default (writers stay parallel within
    a hot shard). The manifest read-back is a second scan of the written
    data — the same scan the loader-side ``recompute == manifest``
    validation performs.
    """
    d = shard_assign(df, n_shards, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        "shard",
    )
    w = d.write.mode("overwrite").partitionBy("shard")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    written = df.sparkSession.read.schema(
        "doc_id string, text string, shard int"
    ).json(path)
    return _manifest_agg(written, "doc_id", "text")


def shard_manifest_sql(
    table: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replica of ``shard_manifest`` (independent engine check)."""
    sid = f"CAST({id_col} AS VARCHAR)"
    sh = md5_u32_duckdb(f"'sh:' || {sid}")
    nc = f"length(coalesce({text_col}, ''))"
    ck = md5_u32_duckdb(f"'ck:' || {sid} || ':' || CAST({nc} AS VARCHAR)")
    nt = (
        f"len(list_filter(string_split_regex(lower(coalesce({text_col}, '')),"
        f" '\\s+'), x -> x <> ''))"
    )
    return f"""
    SELECT CAST(({sh}) % {n_shards} AS INT) AS shard,
           count(*) AS n_docs,
           CAST(sum({nt}) AS BIGINT) AS n_tokens,
           CAST(sum({nc}) AS BIGINT) AS n_chars,
           CAST(sum({ck}) AS BIGINT) AS checksum
    FROM {table}
    GROUP BY 1
    """

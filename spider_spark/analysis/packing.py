"""Sequence packing — assigning documents to fixed-token-budget training
sequences, the step between a cleaned corpus and a tokenized training run.

``pack_sequences`` implements deterministic greedy contiguous packing:
documents are sharded by a portable md5 hash of their id, ordered within
the shard (binary string order on the unique id — identical in Spark and
DuckDB for the ASCII ids used here), and assigned to packs by cumulative
token count: ``pack_id = (cum_tokens_before_doc) div window``. A document
therefore lands in the pack where its first token would fall — packs fill
to at least ``window`` tokens (the last doc of a pack may straddle the
boundary), matching the common "greedy concat-and-chunk" pretraining
packer rather than bin-packing (which is neither order-stable nor
SQL-expressible).

Every step is exact integer arithmetic — token counts, cumulative sums,
integer division — so pack assignment can never drift between engines on
a float ULP, and the whole operator is two window functions over a
shard-partitioned frame: embarrassingly parallel across shards, no
global sort, no driver state. At 100 TB, shards map 1:1 onto partitions
(`n_shards` ≈ corpus partitions) and each pack's docs are co-located for
the downstream tokenizer by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_spark.functions.hashing import md5_u32_sql

from .dedup import _tokens_expr


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """(doc_id, shard, n_tokens, pack_id, pos_in_pack) — greedy contiguous
    pack assignment per shard (see module docstring). ``window`` is the
    token budget per pack; ``n_shards`` the parallelism unit (a shard's
    packs are independent of every other shard's)."""
    assert window > 0 and n_shards > 0
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"size({_tokens_expr(text_col)})").cast("long").alias(
            "n_tokens"
        ),
        F.expr(
            f"{md5_u32_sql(f'cast({id_col} as string)')} % {n_shards}"
        ).cast("int").alias("shard"),
    )
    w_cum = Window.partitionBy("shard").orderBy("doc_id")
    d = d.withColumn("_cum", F.sum("n_tokens").over(w_cum)).withColumn(
        "pack_id", F.expr(f"(_cum - n_tokens) div {window}")
    )
    w_pos = Window.partitionBy("shard", "pack_id").orderBy("doc_id")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        "pack_id",
        F.row_number().over(w_pos).alias("pos_in_pack"),
    )


def pack_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """(shard, pack_id, n_docs, pack_tokens) — per-pack fill summary over
    the same assignment as pack_sequences (one extra combine-heavy
    groupBy; the fill ratio is the caller's division to make)."""
    packs = pack_sequences(df, text_col, id_col, window, n_shards)
    return packs.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 128,
    stride: int = 96,
) -> DataFrame:
    """(doc_id, chunk_id, n_chunk_tokens, chunk_text) — fixed-size
    overlapping token windows: chunk i covers tokens
    [i·stride, i·stride + chunk), the sliding-window chunker RAG indexing
    and long-document training both need. Every token is covered, the
    final window is the first one reaching the document's end (no empty
    trailing chunk), and documents with zero tokens emit nothing:
    n_chunks = 1 + ceil((n - chunk)/stride) for n > chunk, else 1.

    Zero shuffle: one narrow codegen pass (tokens → index sequence →
    slice → explode) emitting ~n/stride rows per document — the chunker
    runs at scan speed at 100 TB and never moves data. All arithmetic is
    integer, so chunk boundaries are engine-bit-identical."""
    assert chunk > 0 and 0 < stride <= chunk
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_tokens_expr(text_col)).alias("_ck_t"),
    )
    # last chunk index = ceil((n - chunk)/stride), as exact integer div;
    # guarded CASE because sequence(0, -1) would DESCEND, not be empty
    chunks = (
        f"CASE WHEN size(_ck_t) <= 0 THEN "
        f"CAST(array() AS ARRAY<STRUCT<chunk_id: INT, toks: ARRAY<STRING>>>) "
        f"ELSE transform(sequence(0, "
        f"(greatest(size(_ck_t) - {chunk}, 0) + {stride} - 1) div {stride}), "
        f"i -> struct(i AS chunk_id, "
        f"slice(_ck_t, i * {stride} + 1, {chunk}) AS toks)) END"
    )
    return (
        d.withColumn("_ck_c", F.expr(chunks))
        .select("doc_id", F.explode("_ck_c").alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").cast("long").alias("chunk_id"),
            F.size("c.toks").cast("long").alias("n_chunk_tokens"),
            F.array_join("c.toks", " ").alias("chunk_text"),
        )
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, pos): deterministic global training-order shuffle
    for one epoch — every epoch a different but REPRODUCIBLE permutation
    (the data-loader contract: re-running epoch 3 must read the same
    order, and no two epochs may share an order).

    Order key = md5(epoch || id): uniform, engine-portable, seeded by
    the epoch number. shard = key % n_shards (uniform shard sizes,
    ±binomial), pos = rank within shard. A training job reads shards in
    shard order, rows in pos order — a total order with NO global sort:
    the only wide operation is the per-shard rank window, and shards map
    1:1 onto partitions/files at lake scale (the pack_sequences layout
    convention)."""
    key = F.md5(
        F.concat(
            F.lit(f"e{int(epoch)}:"), F.col(id_col).cast("string")
        )
    )
    d = df.select(F.col(id_col).alias("doc_id"), key.alias("_k"))
    shard = F.expr(
        md5_u32_sql(f"concat('e{int(epoch)}:', cast(doc_id as string))")
    ) % n_shards
    w = Window.partitionBy("shard").orderBy("_k", "doc_id")
    return (
        d.withColumn("shard", shard.cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_k")
    )


def epoch_shuffle_sql(
    table: str,
    epoch: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> str:
    """DuckDB replica of ``epoch_shuffle``."""
    from spider_spark.functions.hashing import md5_u32_duckdb

    e = f"'e{int(epoch)}:' || CAST({id_col} AS VARCHAR)"
    h = md5_u32_duckdb(e)
    return f"""
    SELECT {id_col} AS doc_id,
           CAST(({h}) % {n_shards} AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY ({h}) % {n_shards}
               ORDER BY md5({e}), {id_col}) AS BIGINT) AS pos
    FROM {table}
    """

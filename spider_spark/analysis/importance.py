"""Data-selection importance scoring (DSIR-style hashed n-gram features).

``importance_score`` ranks raw-corpus documents by how much more typical
they are of a small *target* corpus than of the raw corpus itself — the
data-selection-for-LM recipe of Xie et al. 2023 ("Data Selection for
Language Models via Importance Resampling", DSIR): represent each document
as a bag of hashed word n-gram features, fit unigram bucket distributions
over the raw and target corpora, and score each document by its
log-importance weight  sum_f  log p_target(f) - log p_raw(f).

This implementation is deliberately **integer-exact** (the same determinism
contract as analysis/decontam.surprisal_score and analysis/graph.
pagerank_int): with Laplace smoothing over the B hash buckets
(p(b) = (c(b)+1) / (N+B) — add-one in every bucket, so an unseen feature
costs log2(N+B) bits, not log2(N)), per-bucket score

    s(b) = flog2(max((N_raw + B) DIV (c_raw(b)+1), 1))
         - flog2(max((N_tgt + B) DIV (c_tgt(b)+1), 1))

where flog2(x) = length(bin(x)) - 1 is floor(log2) for positive int64 —
i.e. the raw-corpus surprisal of the bucket minus its target-corpus
surprisal, a floor-log2 rendering of log(p_tgt/p_raw). A document's
log2_weight is the sum of s over its gram *occurrences* (not distinct
grams — DSIR weights by feature count). No floating point anywhere, so
results are bit-identical on any engine, partitioning, or summation order.

Plan shape at 100 TB: the two bucket tables are bounded by ``n_buckets``
(default 4096 rows) regardless of corpus size — each is ONE combine-heavy
groupBy whose shuffle carries at most n_buckets rows per upstream
partition. The per-bucket score table is built from their outer join
(tiny) and broadcast; the corpus is then scanned once more, grams
projected via HOFs, and joined map-side, ending in one combine-heavy
groupBy(doc_id). Two corpus scans, two bounded shuffles, zero UDFs.

The reference engine has no analysis tier (its dataflow ends at URL
indexing, Indexer.scala:75-101); this belongs to the added
training-pipeline surface, same as analysis/decontam.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hex_u32_sql, md5_u32_sql
from .dedup import _tokens_expr


def _gram_exprs(text_col: str, ns: tuple[int, ...]) -> str:
    """Spark-SQL expr: all word n-grams (space-joined, for each n in
    ``ns``) of the shared lowercase tokenization, as one concatenated
    array<string>. Occurrences are kept (no distinct) — DSIR features are
    counts."""
    parts = []
    for n in ns:
        if n == 1:
            parts.append("_iw_t")
        else:
            parts.append(
                f"CASE WHEN size(_iw_t) >= {n} THEN "
                f"transform(sequence(0, size(_iw_t) - {n}), "
                f"i -> array_join(slice(_iw_t, i + 1, {n}), chr(32))) "
                f"ELSE CAST(array() AS ARRAY<STRING>) END"
            )
    return "concat(" + ", ".join(parts) + ")"


def doc_feature_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """(doc_id, bucket) — one row per gram *occurrence*, hashed to
    md5_u32(gram) % n_buckets. The md5 hex binds once per gram as a lambda
    var (interpreted HOF lambdas have no common-subexpression
    elimination)."""
    # the md5 hex binds once per gram via the nested transform
    # (interpreted HOF lambdas have no common-subexpression elimination —
    # inlining md5(x) into the four substrings would hash each gram 4x)
    u32 = (
        f"transform(transform(_iw_g, x -> md5(x)), "
        f"h -> {md5_hex_u32_sql('h')})"
    )
    return (
        df.withColumn("_iw_t", F.expr(_tokens_expr(text_col)))
        .withColumn("_iw_g", F.expr(_gram_exprs(text_col, ns)))
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(F.expr(u32)).alias("_iw_h"),
        )
        .select(
            "doc_id",
            (F.col("_iw_h") % n_buckets).alias("bucket"),
        )
    )


def bucket_counts(feats: DataFrame) -> DataFrame:
    """(bucket, c) — occurrence counts per feature bucket. Bounded output
    (<= n_buckets rows); map-side partial aggregation keeps the shuffle
    at <= n_buckets rows per upstream partition."""
    return (
        feats.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def importance_score(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """(doc_id, n_feats, log2_weight, mean_weight_milli) for every doc in
    ``docs``: the integer DSIR log-importance weight of the doc under
    ``target`` vs the raw corpus, its feature count, and the milli-unit
    mean (1000 * log2_weight DIV n_feats; 0 for featureless docs).

    Positive log2_weight = the doc's hashed-gram profile is closer to the
    target distribution than to the raw corpus average — keep it when
    resampling toward the target domain."""
    from pyspark.sql import Window

    raw_feats = doc_feature_buckets(docs, text_col, id_col, n_buckets, ns)
    tgt_feats = doc_feature_buckets(target, text_col, id_col, n_buckets, ns)
    raw_c = bucket_counts(raw_feats)
    tgt_c = bucket_counts(tgt_feats)
    # per-bucket score table: <= n_buckets rows, broadcast to the scan.
    # Corpus totals come from a single-partition window over this already
    # bounded table (every raw/target bucket survives the outer join, so
    # sum(c_raw)/sum(c_tgt) ARE N_raw/N_tgt) — bounded by n_buckets no
    # matter the corpus size, and no nested-loop join enters the plan
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    score = (
        raw_c.withColumnRenamed("c", "c_raw")
        .join(tgt_c.withColumnRenamed("c", "c_tgt"), "bucket", "outer")
        .withColumn(
            "n_raw",
            F.sum(F.coalesce("c_raw", F.lit(0))).over(w_all).cast("long"),
        )
        .withColumn(
            "n_tgt",
            F.sum(F.coalesce("c_tgt", F.lit(0))).over(w_all).cast("long"),
        )
        .select(
            "bucket",
            (
                (
                    F.length(
                        F.bin(
                            F.expr(
                                f"greatest((n_raw + {n_buckets}) DIV "
                                "(coalesce(c_raw, 0) + 1), 1)"
                            )
                        )
                    )
                    - 1
                )
                - (
                    F.length(
                        F.bin(
                            F.expr(
                                f"greatest((n_tgt + {n_buckets}) DIV "
                                "(coalesce(c_tgt, 0) + 1), 1)"
                            )
                        )
                    )
                    - 1
                )
            )
            .cast("long")
            .alias("s"),
        )
    )
    per_doc = (
        raw_feats.filter(F.col("bucket").isNotNull())
        .join(F.broadcast(score), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("s").alias("log2_weight"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("log2_weight", F.lit(0))
            .cast("long")
            .alias("log2_weight"),
            # log2_weight can be negative; Spark DIV truncates toward zero
            # while other engines may floor — divide magnitudes and
            # re-apply the sign so truncation is symmetric everywhere
            F.when(
                F.coalesce("n_feats", F.lit(0)) > 0,
                F.expr(
                    "CAST(CASE WHEN coalesce(log2_weight, 0) >= 0 THEN "
                    "1000 * coalesce(log2_weight, 0) DIV "
                    "coalesce(n_feats, 1) ELSE "
                    "-((1000 * -coalesce(log2_weight, 0)) DIV "
                    "coalesce(n_feats, 1)) END AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("mean_weight_milli"),
        )
    )

"""Benchmark decontamination and corpus-statistics quality scoring.

Two operators a training-data pipeline runs before anything ships to a
trainer:

  - ``decontaminate``: flag training documents that share any word n-gram
    with a benchmark/eval set (the GPT-3 / PaLM "13-gram overlap" rule,
    here with a configurable n). The benchmark side of the join is tiny by
    construction (eval sets are thousands of docs, not billions), so it
    broadcasts; the corpus side never materializes more than its distinct
    gram *hashes* (md5_u32 -> 8-byte ints, not strings). Plan shape at
    100 TB: ONE scan + HOF gram projection, an explode, a broadcast-hash
    left join (map-side, no shuffle of the corpus), and one combine-heavy
    groupBy(doc_id) — the only shuffle, carrying ~one partially-aggregated
    row per doc per partition.

  - ``surprisal_score``: an IDF-style quality signal — per-token integer
    surprisal s(tok) = floor(log2(N / c_tok)) (corpus total N, token count
    c), per doc the sum and a milli-unit mean. Deliberately integer-exact
    (floor-log2 via ``length(bin(x)) - 1``, integer division throughout)
    so the score is bit-identical on any engine and any summation order —
    the same determinism contract as analysis/graph.pagerank_int. Plan
    shape: one combine-heavy groupBy(token) for the unigram table, a
    single-row total broadcast back, one shuffle join (occurrences x
    vocab, keyed by token), and a final combine-heavy groupBy(doc_id).
    The vocabulary join is the wide step; at lake scale bucket both sides
    by token (the unigram table is reusable across runs, so bucketing it
    amortizes).

The reference engine has no analysis tier (the crawl dataflow ends at URL
indexing, Indexer.scala:75-101); these belong to the added
training-pipeline surface, same as analysis/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hex_u32_sql

from .dedup import _tokens_expr


def gram_hash_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, grams: array<bigint>, n_grams) — distinct md5_u32 hashes
    of the doc's word n-grams (space-joined shingles of the shared
    lowercase tokenization); docs shorter than n words yield an empty
    array. Pure scan projection (HOF transforms, no shuffle); the md5 hex
    binds ONCE per gram as a lambda var (interpreted HOF lambdas have no
    common-subexpression elimination — inlining md5_u32_sql would hash
    each gram four times)."""
    hexes = (
        f"CASE WHEN size(_dg_t) >= {n} THEN "
        f"transform(sequence(0, size(_dg_t) - {n}), "
        f"i -> md5(array_join(slice(_dg_t, i + 1, {n}), chr(32)))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    u32 = (
        f"array_distinct(transform(_dg_hex, x -> {md5_hex_u32_sql('x')}))"
    )
    return (
        df.withColumn("_dg_t", F.expr(_tokens_expr(text_col)))
        .withColumn("_dg_hex", F.expr(hexes))
        .select(
            F.col(id_col).alias("doc_id"),
            F.expr(u32).alias("grams"),
        )
        .withColumn("n_grams", F.size("grams").cast("long"))
    )


def benchmark_gram_hashes(
    bench: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(gram,) — the distinct gram-hash blocklist of the benchmark set.
    Small by construction; callers broadcast it."""
    return (
        gram_hash_sets(bench, text_col, id_col, n)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(doc_id, n_grams, n_hit_grams, contaminated) for every doc in
    ``docs``: n_hit_grams = how many of the doc's distinct n-grams appear
    anywhere in ``bench``; contaminated = any hit.

    Single-pass: the corpus is scanned (and md5-gram-hashed) exactly once
    — explode_outer keeps gram-less docs as one null row, the broadcast
    left join marks hits map-side, and one combine-heavy groupBy(doc_id)
    counts grams and hits together (after map-side partial aggregation the
    shuffle carries ~one row per doc per partition). Docs with fewer than
    n words have n_grams = 0 and are clean."""
    grams = gram_hash_sets(docs, text_col, id_col, n)
    block = benchmark_gram_hashes(bench, text_col, id_col, n).withColumn(
        "_hit", F.lit(1).cast("long")
    )
    return (
        grams.select("doc_id", F.explode_outer("grams").alias("gram"))
        .join(F.broadcast(block), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias(
                "n_hit_grams"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hit_grams",
            (F.col("n_hit_grams") > 0).alias("contaminated"),
        )
    )


# adjacent-token pair projection over the shared _bl_t token array —
# ONE definition: training counts and the scoring occurrence stream must
# tokenize identically or surprisals silently desynchronize
_BIGRAM_PAIRS_EXPR = (
    "CASE WHEN size(_bl_t) >= 2 THEN "
    "transform(sequence(1, size(_bl_t) - 1), "
    "i -> named_struct('w1', element_at(_bl_t, i), "
    "'w2', element_at(_bl_t, i + 1))) "
    "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) END"
)


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, c12) — corpus bigram occurrence counts over the shared
    lowercase tokenization. One combine-heavy groupBy: after map-side
    partial aggregation the shuffle carries ~|bigram vocab| rows per
    partition, not the corpus. Docs shorter than 2 tokens contribute
    nothing."""
    return (
        df.withColumn("_bl_t", F.expr(_tokens_expr(text_col)))
        .select(F.explode(F.expr(_BIGRAM_PAIRS_EXPR)).alias("_bg"))
        .select("_bg.w1", "_bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, sum_surprisal, mean_surprisal_milli) — add-one-
    smoothed bigram language-model surprisal: the CCNet-style "train a
    small LM, keep documents the model finds unsurprising" quality filter,
    in exact integer arithmetic.

    Train on ``ref`` (default: the corpus itself — self-scoring flags the
    corpus's own outliers): c12(w1,w2) bigram counts and the derived
    prefix counts c1(w1) = Σ_w2 c12 (occurrences of w1 as a bigram
    prefix), plus the prefix-vocabulary size V. Per bigram occurrence the
    conditional surprisal is

        s(w1,w2) = floor(log2( (c1(w1) + V) DIV (c12(w1,w2) + 1) ))

    — Laplace smoothing over the prefix vocabulary, so unseen bigrams of
    a seen prefix cost ~log2(c1+V) bits and fully unseen prefixes cost
    floor(log2(V)). c1 >= c12 and V >= 1 make the ratio >= 1, so s >= 0.
    floor(log2(x)) is length(bin(x)) - 1 — exact for any positive int64;
    no floating point anywhere, so the score is bit-identical on any
    engine and any summation order (the pagerank_int determinism
    contract). mean_surprisal_milli = 1000 * sum DIV n_bigrams is the
    integer log2-perplexity proxy CCNet buckets on.

    Plan shape at 100 TB: training is one scan + HOF bigram projection and
    ONE combine-heavy groupBy(w1, w2) (|bigram vocab| rows), the prefix
    table a second groupBy over that (not the corpus); scoring is the
    occurrence stream left-joined to the (w1,w2)-keyed score table and the
    w1-keyed prefix table — both vocab-sized, broadcastable when they fit,
    bucketable by w1 otherwise — and one final combine-heavy
    groupBy(doc_id). The reference crawl has no analysis tier
    (Indexer.scala:75-101 ends at URL indexing); this belongs to the added
    training-pipeline surface."""
    train = df if ref is None else ref
    big = bigram_counts(train, text_col)
    pre = big.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    # V is ONE scalar over the (already vocab-sized) prefix table —
    # collected and inlined as a literal. The alternatives both lose: a
    # crossJoin attach plans as a nested-loop join over the corpus-side
    # occurrence stream (the plan-audit smell), and a constant-key
    # equi-join constant-folds back into the same nested loop.
    v = int(pre.agg(F.count("*").cast("long").alias("v")).first()["v"])

    occ = (
        df.withColumn("_bl_t", F.expr(_tokens_expr(text_col)))
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.expr(_BIGRAM_PAIRS_EXPR)).alias("_bg"),
        )
        .select("doc_id", "_bg.w1", "_bg.w2")
    )
    per_doc = (
        occ.join(big, ["w1", "w2"], "left")
        .join(pre, ["w1"], "left")
        .withColumn(
            "s",
            (
                F.length(
                    F.bin(
                        F.expr(
                            f"(coalesce(c1, 0) + {v}) DIV"
                            " (coalesce(c12, 0) + 1)"
                        )
                    )
                )
                - 1
            ).cast("long"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("s").alias("sum_surprisal"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_surprisal", F.lit(0))
            .cast("long")
            .alias("sum_surprisal"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.expr(
                    "CAST(1000 * coalesce(sum_surprisal, 0) DIV "
                    "coalesce(n_bigrams, 1) AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("mean_surprisal_milli"),
        )
    )


def unigram_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(token, c) — corpus unigram occurrence counts. One combine-heavy
    groupBy: the shuffle carries |vocab| rows per partition, not the
    corpus."""
    toks = F.expr(_tokens_expr(text_col))
    return (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )


def surprisal_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, sum_surprisal, mean_surprisal_milli) — integer
    IDF/surprisal quality score.

    Per occurrence of token t: s = floor(log2(N div c_t)) with N = total
    corpus token occurrences (so the corpus's most frequent filler words
    score low, rare informative tokens high); per doc the exact integer
    sum and mean in milli-units (1000 * sum div n_tokens). floor(log2(x))
    is computed as length(bin(x)) - 1 — exact for any positive int64, no
    floating point anywhere, so results are independent of partitioning,
    summation order, and engine libm."""
    toks = F.expr(_tokens_expr(text_col))
    occ = df.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("token")
    )
    uni = unigram_counts(df, text_col)
    total = uni.agg(F.sum("c").cast("long").alias("n_total"))
    scored = (
        uni.crossJoin(F.broadcast(total))
        .withColumn(
            "s",
            (F.length(F.bin(F.expr("n_total DIV c"))) - 1).cast("long"),
        )
        .select("token", "s")
    )
    per_doc = (
        occ.join(scored, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("s").alias("sum_surprisal"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("sum_surprisal", F.lit(0))
            .cast("long")
            .alias("sum_surprisal"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.expr(
                    "CAST(1000 * coalesce(sum_surprisal, 0) DIV "
                    "coalesce(n_tokens, 1) AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("mean_surprisal_milli"),
        )
    )

"""Corpus search — inverted postings, conjunctive match, integer-scored
ranked retrieval.

A training-data pipeline searches its own corpus constantly: targeted
selection ("all docs mentioning X and Y"), leakage hunts, curriculum
slicing, and eval-set mining. Three operators, scale-ranked:

  - ``posting_pairs`` / ``inverted_postings``: the index build. The flat
    (token, doc_id) pair stream is the lake-scale shape — bucket/partition
    it by token and a term lookup is partition-pruned. The array form
    (one row per token with its sorted doc list) is the per-token
    aggregation view; a stopword's posting row is unbounded, so the
    ``min_df``/``max_df`` gates are the scale knobs (drop hapaxes and
    stopwords before materializing).
  - ``search_conjunctive``: docs containing ALL query terms. The query
    term set is a literal array, so the whole operator is one scan
    projection (array_intersect against per-doc distinct tokens) — zero
    shuffle, no join, trivially parallel at any corpus size.
  - ``search_topk``: ranked retrieval with an integer tf·idf score:
    score(d) = sum_t tf(d,t) · w(t), w(t) = floor(log2(N div df_t)) — the
    surprisal weight of analysis/decontam.py, so scoring is exact int64
    arithmetic, bit-identical on any engine or summation order (no BM25
    floats to drift). One scan filtered to query terms (tiny selectivity),
    one combine-heavy (doc, term) count, term weights derived from that
    same small table (no second corpus pass) and broadcast back, top-k via
    TakeOrderedAndProject (per-partition partial top-k).

The reference engine has no search tier (its dataflow ends at URL
indexing, Indexer.scala:75-101); this belongs to the added
training-pipeline surface, same as analysis/decontam.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens_expr


def posting_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, doc_id) — the flat inverted-index stream, one row per
    distinct (token, doc) pair (per-doc dedupe happens JVM-side via
    array_distinct before the explode, so no distinct shuffle). At lake
    scale this is the table you bucket by token."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(F.expr(_tokens_expr(text_col)))
        ).alias("token"),
    ).select("token", "doc_id")


def inverted_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """(token, n_docs, doc_ids) — per-token posting lists with document
    frequency; ``min_df``/``max_df`` gate hapaxes and stopwords out before
    the list materializes. One combine-heavy groupBy(token)."""
    posts = (
        posting_pairs(df, text_col, id_col)
        .groupBy("token")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") >= min_df)
    )
    if max_df is not None:
        posts = posts.filter(F.col("n_docs") <= max_df)
    return posts


def search_conjunctive(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id) — documents containing ALL ``terms`` (lowercased token
    match). The term set is a literal array, so this is a pure scan
    filter: per-doc distinct tokens ∩ terms counted JVM-side, no join,
    no shuffle."""
    uniq = sorted({t.lower() for t in terms})
    assert uniq, "empty term set"
    lit_terms = F.array(*[F.lit(t) for t in uniq])
    toks = F.array_distinct(F.expr(_tokens_expr(text_col)))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.array_intersect(toks, lit_terms)).alias("_hits"),
        )
        .filter(F.col("_hits") == len(uniq))
        .select("doc_id")
    )


def _idf_weights(tf: DataFrame, n_docs: int) -> DataFrame:
    """(token, w): floor-log2 idf weight from a per-(doc, token) tf
    table — ONE definition shared by the tf-idf and BM25 rankers so the
    two can never silently disagree on term weighting. Derives from the
    already-tiny tf table (<= matching-docs x |terms| rows)."""
    return (
        tf.groupBy("token")
        .agg(F.count("*").alias("_df"))
        .withColumn(
            "w",
            (
                F.length(F.bin(F.expr(f"greatest({n_docs} div _df, 1)"))) - 1
            ).cast("long"),
        )
        .select("token", "w")
    )


def search_topk(
    df: DataFrame,
    terms: Sequence[str],
    n_docs: int,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_terms_hit, score) — top-k documents by the integer
    tf·idf score (see module docstring). ``n_docs`` is the corpus size
    (the one corpus-level constant; pass ``df.count()`` or the catalog
    row count — a literal keeps the plan free of nested-loop joins).
    Ties break by doc_id ascending."""
    uniq = sorted({t.lower() for t in terms})
    assert uniq and n_docs > 0
    lit_terms = F.array(*[F.lit(t) for t in uniq])
    tf = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.expr(_tokens_expr(text_col))).alias("token"),
        )
        .filter(F.array_contains(lit_terms, F.col("token")))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    # df_t and the floor-log2 weight derive from the already-tiny tf
    # table (<= matching-docs x |terms| rows); broadcast back by token
    wt = _idf_weights(tf, n_docs)
    return (
        tf.join(F.broadcast(wt), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum(F.col("tf") * F.col("w")).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("doc_id"))
        .limit(k)
    )


def search_bm25(
    df: DataFrame,
    terms: Sequence[str],
    n_docs: int,
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_terms_hit, score_milli) — top-k by BM25 (Robertson/
    Sparck Jones), entirely in fixed-point int64 milli-units so ranking is
    bit-identical on any engine/summation order (the family's determinism
    contract; float BM25 can't be oracle-checked value-exactly):

        norm_m  = 1000 - b_m + (b_m * dl * 1000) DIV avgdl_m
        denom_m = tf * 1000 + (k1_m * norm_m) DIV 1000
        part_m  = (tf * (1000 + k1_m) * 1000) DIV denom_m
        score_milli(d) = Σ_t floor(log2(N div df_t)) * part_m

    with dl = doc token count and avgdl_m the corpus milli-average
    (computed in-plan and broadcast). Saturation (diminishing tf returns)
    and length normalization — the two things tf·idf lacks — survive the
    fixed-point floor because part_m is in milli-units (rounding error
    <= 1/1000 of one term's contribution).

    Plan shape: dl rides the SAME scan as the term filter (size() of the
    token array before the HOF filter + explode — grouping by the
    functionally-dependent dl is free), so matching docs never join back
    to a corpus-sized length table; the corpus stats pass is one
    columnar scan aggregating to a single broadcast row; weights derive
    from the tiny tf table; top-k compiles to TakeOrderedAndProject.
    Ties break by doc_id ascending."""
    uniq = sorted({t.lower() for t in terms})
    assert uniq and n_docs > 0
    assert k1_milli >= 0 and 0 <= b_milli <= 1000
    lit_terms = F.array(*[F.lit(t) for t in uniq])
    toks = F.expr(_tokens_expr(text_col))

    # avgdl is ONE scalar over the corpus — collected and inlined as a
    # literal (same single pass the broadcast attach would run, without
    # the nested-loop join a 1-row crossJoin plans as; a constant-key
    # equi-join constant-folds back into the same nested loop)
    avgdl_m = int(
        df.select(F.size(toks).alias("_dl"))
        .agg(
            F.expr(
                "greatest(cast(1000 * sum(_dl) div count(*) as bigint), 1)"
            ).alias("avgdl_m")
        )
        .first()["avgdl_m"]
    )
    tf = (
        df.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("_toks"),
        )
        .withColumn("dl", F.size("_toks").cast("long"))
        .select(
            "doc_id",
            "dl",
            F.explode(
                F.filter("_toks", lambda x: F.array_contains(lit_terms, x))
            ).alias("token"),
        )
        .groupBy("doc_id", "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    wt = _idf_weights(tf, n_docs)
    return (
        tf.join(F.broadcast(wt), "token")
        .withColumn(
            "_norm_m",
            F.expr(
                f"1000 - {b_milli} + ({b_milli} * dl * 1000) div {avgdl_m}"
            ),
        )
        .withColumn(
            "_part_m",
            F.expr(
                f"(tf * {1000 + k1_milli} * 1000) div "
                f"(tf * 1000 + ({k1_milli} * _norm_m) div 1000)"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum(F.col("w") * F.col("_part_m"))
            .cast("long")
            .alias("score_milli"),
        )
        .orderBy(F.desc("score_milli"), F.col("doc_id"))
        .limit(k)
    )

"""End-to-end training-corpus cleaning: the composition a real pipeline
runs, as one declarative plan.

``clean_corpus`` = language-ID gate + token-count floor + punctuation
ceiling + near-duplicate cluster resolution, keeping one canonical
document per cluster. Every stage is the already-verified operator
(text.lang_id, dedup.duplicate_clusters); this module only composes
them — the point is that the composition itself is oracle-checkable as
a single SQL statement, not just each stage in isolation.

Filter predicates are exact integer arithmetic (token counts; the
punctuation ceiling is ``(len - len_nopunct) * 100 <= len * pct``) so
corpus membership can never drift between engines on a float ULP.

At scale this is: one codegen scan-projection for the gates (filters
push to the parquet scan), then the dedup pipeline's bounded shuffles
(fingerprint groupBy, banded LSH join, O(diameter) label rounds), then
one broadcast-size join of canonical clusters back onto the kept docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import duplicate_clusters
from .text import lang_id


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_ws_tokens: int = 5,
    max_punct_pct: int = 10,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_w: int = 2,
) -> DataFrame:
    """Gate documents, resolve near-dup clusters among the survivors,
    and emit one row per canonical kept document:
    (doc_id, lang_guess, bpe_tokens, cluster_size)."""
    t = F.col(text_col)
    n = F.length(t)
    nopunct = F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(
        F.regexp_extract_all(
            text_col, F.lit(r"[A-Za-z]{1,4}|[0-9]+|[^\sA-Za-z0-9]"), 0
        )
    )
    kept = (
        lang_id(df, text_col)
        .withColumn("ws_tokens", ws)
        .withColumn("bpe_tokens", bpe.cast("long"))
        .where(
            (F.col("lang_guess") != "unknown")
            & (F.col("ws_tokens") >= min_ws_tokens)
            & ((n - nopunct) * 100 <= n * max_punct_pct)
        )
    )
    # kept feeds BOTH the cluster resolution and the final join; without
    # a checkpoint Catalyst plans two independent copies of the gate
    # subtree (lang-id rlike probes + token/punct regexes over the whole
    # corpus — ReuseExchange does not dedupe identical scan+filter
    # subtrees). Materializing the gated survivors once halves the
    # regex-heavy corpus scans (measured 1.7x at sf0.1).
    kept = kept.localCheckpoint(eager=False)
    clusters = duplicate_clusters(
        kept.select(F.col(id_col), t),
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_w=shingle_w,
    )
    canon = clusters.where(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id", "cluster_size"
    )
    return kept.select(
        F.col(id_col).alias("doc_id"), "lang_guess", "bpe_tokens"
    ).join(canon, "doc_id")

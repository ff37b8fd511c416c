"""Text analysis for large-scale training-data pipelines.

All column-expression based (JVM-side, whole-stage-codegen-friendly) so the
same logic is expressible as ANSI SQL for the DuckDB oracle:

  - language-ID (stopword-hit heuristic, deterministic rule chain)
  - quality scoring (length / punctuation ratio / stopword ratio)
  - token counting (whitespace + BPE-ish regex token count)
  - document fingerprinting (whitespace-normalized md5)

Operate on the ``documents`` test table (doc_id, text, lang, source,
n_chars). At 100 TB these are embarrassingly parallel scan-projections: no
shuffle, pushdown-friendly, and the md5/regexp work stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny deterministic stopword sets per language for the heuristic
EN_STOPS = ("the", "and", "of", "to", "is")
DE_STOPS = ("der", "die", "und", "nicht", "ist")
ES_STOPS = ("el", "la", "que", "de", "los")


def _hits(col, words) -> "F.Column":
    expr = F.lit(0)
    for w in words:
        expr = expr + F.when(col.rlike(rf"\b{w}\b"), 1).otherwise(0)
    return expr


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stopword-majority language guess (en/de/es/unknown)."""
    t = F.lower(F.col(text_col))
    en, de, es = _hits(t, EN_STOPS), _hits(t, DE_STOPS), _hits(t, ES_STOPS)
    return df.withColumn(
        "lang_guess",
        F.when((en >= de) & (en >= es) & (en > 0), "en")
        .when((de >= es) & (de > 0), "de")
        .when(es > 0, "es")
        .otherwise("unknown"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword quality features + a composite score."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    n_nopunct = F.length(F.regexp_replace(t, r"[^\w\s]", "")).cast("double")
    punct_ratio = F.when(n > 0, (n - n_nopunct) / n).otherwise(F.lit(0.0))
    words = F.size(F.split(t, r"\s+"))
    stop_hits = _hits(F.lower(t), EN_STOPS).cast("double")
    stop_ratio = F.when(words > 0, stop_hits / words.cast("double")).otherwise(
        F.lit(0.0)
    )
    score = (
        F.least(n / F.lit(500.0), F.lit(1.0)) * F.lit(0.5)
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * F.lit(0.3)
        + F.least(stop_ratio * 10, F.lit(1.0)) * F.lit(0.2)
    )
    return (
        df.withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("quality", F.round(score, 6))
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword-regex token estimate."""
    # null/empty-safe: null text counts 0 tokens (Spark's size(NULL) is
    # -1 by default and split('') yields [''] — both would corrupt sums)
    t = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.size(F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != ""))
    # BPE-ish: word pieces of <=4 chars, digits, punctuation each count
    bpe = F.size(
        F.regexp_extract_all(t, F.lit(r"[A-Za-z]{1,4}|[0-9]+|[^\sA-Za-z0-9]"), 0)
    )
    return df.withColumn("ws_tokens", ws).withColumn("bpe_tokens", bpe)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized lowercase md5 — the exact-dup fingerprint
    (the shared dedup.norm_fingerprint definition)."""
    from spider_spark.analysis.dedup import norm_fingerprint

    return df.withColumn("fp", norm_fingerprint(text_col))


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """(token, n_occurrences, n_docs, rank) — the corpus's top-K vocabulary
    by occurrence count (ties broken lexicographically, so the cut is
    deterministic). The tokenizer-training prep step: explode lowercase
    whitespace tokens, one combine-heavy groupBy (map-side partial counts
    shrink the shuffle to |vocab| per partition), then a top-K that
    compiles to a single-partition limit over pre-aggregated rows — at
    100 TB the shuffled state is the vocabulary, not the corpus."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    counts = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    docs = (
        df.select(F.explode(F.array_distinct(toks)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_docs"))
    )
    top = (
        counts.join(docs, "token")
        .filter(F.col("n_occurrences") >= min_count)
        # orderBy+limit compiles to TakeOrderedAndProject — a DISTRIBUTED
        # top-K (per-partition heaps, K-row merge on the driver), so the
        # full vocabulary never funnels through one partition the way a
        # global row_number window would
        .orderBy(F.desc("n_occurrences"), F.col("token"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def corpus_rollup(
    df: DataFrame,
    dims: tuple = ("lang", "source"),
    text_col: str = "text",
    grouping: str = "rollup",
) -> DataFrame:
    """Hierarchical corpus report: docs / whitespace tokens / chars per
    (lang, source) with ROLLUP (or CUBE) subtotals and a grand total —
    the dataset card every training-corpus release ships.

    One aggregation: Spark's Expand node replicates each input row once
    per grouping set BEFORE the exchange, and the map-side partial
    aggregation collapses them to |groups| rows per partition — the
    shuffle moves subtotal rows, not the corpus, at any scale. ``gid``
    is the grouping bitmask (first dim = most significant bit, the
    Postgres/DuckDB GROUPING() convention); dim values are
    ``'(all)'``-coalesced in subtotal rows, disambiguated by gid.
    Token/char sums are exact int64.
    """
    # null/empty-safe non-empty token count (0 for null/empty text;
    # without the coalesce Spark's size(split(NULL)) = -1 corrupts every
    # subtotal containing a null-text doc while DuckDB null-skips)
    toks = F.size(
        F.filter(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda x: x != "",
        )
    ).cast("long")
    base = df.select(
        *dims,
        toks.alias("_toks"),
        F.length(text_col).cast("long").alias("_chars"),
    )
    grouped = base.cube(*dims) if grouping == "cube" else base.rollup(*dims)
    return (
        grouped.agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("_toks").alias("n_tokens"),
            F.sum("_chars").alias("n_chars"),
        )
        .select(
            *[F.coalesce(F.col(d), F.lit("(all)")).alias(d) for d in dims],
            F.col("gid").cast("long").alias("gid"),
            "n_docs",
            "n_tokens",
            "n_chars",
        )
    )


def corpus_rollup_sql(
    docs_sql: str,
    dims: tuple = ("lang", "source"),
    text_col: str = "text",
    grouping: str = "rollup",
) -> str:
    """DuckDB replica of ``corpus_rollup`` (GROUP BY ROLLUP/CUBE with
    the same GROUPING() bitmask convention)."""
    dsel = ", ".join(
        f"coalesce({d}, '(all)') AS {d}" for d in dims
    )
    dlist = ", ".join(dims)
    kw = "CUBE" if grouping == "cube" else "ROLLUP"
    return f"""
    SELECT {dsel},
           GROUPING({dlist})::BIGINT AS gid,
           count(*)::BIGINT AS n_docs,
           sum(len(list_filter(string_split_regex(
                 trim(coalesce({text_col}, '')), '\\s+'),
               x -> x <> '')))::BIGINT
             AS n_tokens,
           sum(length({text_col}))::BIGINT AS n_chars
    FROM ({docs_sql})
    GROUP BY {kw}({dlist})
    """


def length_histogram(
    df: DataFrame,
    bin_width: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """(bin_lo, n_docs): document-length histogram with fixed-width bins
    (bin_lo = (len // W) * W) — ONE combine-heavy groupBy whose shuffle
    carries at most #bins rows per partition, the dataset-card length
    distribution at any corpus size. Null text counts as length 0."""
    lo = F.expr(
        f"(length(coalesce({text_col}, '')) div {bin_width}) "
        f"* {bin_width}"
    ).cast("long")
    return df.groupBy(lo.alias("bin_lo")).agg(
        F.count("*").cast("long").alias("n_docs")
    )


def binned_quantiles(
    df: DataFrame,
    bin_width: int = 100,
    pcts: tuple = (50, 90, 99),
    text_col: str = "text",
) -> DataFrame:
    """(pct, len_lo): histogram-resolution length quantiles — len_lo is
    the lower bound of the first bin whose cumulative count reaches
    ceil(pct * N / 100). The scale path next to sampling.py's EXACT
    percentile: exact quantiles need a global sort of the corpus; this
    needs one combine-heavy histogram groupBy, after which every step
    (window cumsum, threshold probe) runs on #bins rows. All integer
    arithmetic — bit-identical on any engine.
    """
    from pyspark.sql import Window

    hist = length_histogram(df, bin_width, text_col)
    # both windows share one (single-partition) sort over the #bins-row
    # histogram — bounded small at any corpus size, so the global window
    # is safe here and keeps the plan free of scalar-join nested loops
    w = Window.orderBy("bin_lo")
    cum = hist.select(
        "bin_lo",
        F.sum("n_docs")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_cum"),
        F.sum("n_docs")
        .over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_n"),
    )
    pct_rows = F.explode(
        F.array(*[F.lit(int(p)) for p in pcts])
    ).alias("pct")
    return (
        cum.select(pct_rows, "bin_lo", "_cum", "_n")
        # ceil(p*N/100) in integers: (p*N + 99) div 100
        .filter(F.expr("_cum >= (pct * _n + 99) div 100"))
        .groupBy("pct")
        .agg(F.min("bin_lo").alias("len_lo"))
        .select(F.col("pct").cast("long").alias("pct"), "len_lo")
    )


def length_histogram_sql(
    table: str = "documents",
    bin_width: int = 100,
    text_col: str = "text",
) -> str:
    """DuckDB replica of ``length_histogram``."""
    return f"""
    SELECT ((length(coalesce({text_col}, '')) // {bin_width})
            * {bin_width})::BIGINT AS bin_lo,
           count(*)::BIGINT AS n_docs
    FROM {table}
    GROUP BY 1
    """


def binned_quantiles_sql(
    table: str = "documents",
    bin_width: int = 100,
    pcts: tuple = (50, 90, 99),
    text_col: str = "text",
) -> str:
    """DuckDB replica of ``binned_quantiles`` (same integer threshold)."""
    plist = ", ".join(f"({int(p)})" for p in pcts)
    return f"""
    WITH hist AS ({length_histogram_sql(table, bin_width, text_col)}),
    cum AS (
      SELECT bin_lo,
             sum(n_docs) OVER (ORDER BY bin_lo ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS c,
             (SELECT sum(n_docs) FROM hist) AS n
      FROM hist
    ),
    p(pct) AS (VALUES {plist})
    SELECT pct::BIGINT AS pct, min(bin_lo)::BIGINT AS len_lo
    FROM p JOIN cum ON c >= (pct * n + 99) // 100
    GROUP BY 1
    """


def corpus_pivot(
    df: DataFrame,
    pivot_col: str = "lang",
    pivot_values: tuple = ("de", "en", "es", "fr", "zh"),
    group_col: str = "source",
) -> DataFrame:
    """(group, n_<v>...): doc counts per group with one column per pivot
    value — the wide-format crosstab report. Uses Spark's native
    ``pivot`` WITH the value list pinned (so the plan needs no extra
    values-discovery job and the schema is stable — at 100 TB an
    unpinned pivot first runs a distinct over the corpus). Compiles to
    two map-side-combined aggregations ((group, pivot) counts, then
    pivotfirst on group) — both shuffles carry partial rows, never the
    corpus. Out-of-list values are dropped, matching the
    conditional-aggregation oracle."""
    piv = (
        df.groupBy(F.col(group_col).alias("grp"))
        .pivot(pivot_col, list(pivot_values))
        .count()
    )
    return piv.select(
        "grp",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(f"n_{v}")
            for v in pivot_values
        ],
    )


def corpus_pivot_sql(
    table: str = "documents",
    pivot_col: str = "lang",
    pivot_values: tuple = ("de", "en", "es", "fr", "zh"),
    group_col: str = "source",
) -> str:
    """DuckDB replica of ``corpus_pivot`` as conditional aggregation."""
    cols = ",\n           ".join(
        f"count(*) FILTER ({pivot_col} = '{v}')::BIGINT AS n_{v}"
        for v in pivot_values
    )
    return f"""
    SELECT {group_col} AS grp,
           {cols}
    FROM {table}
    GROUP BY 1
    """

"""Repetition- and rule-based corpus cleaning for training-data pipelines.

Three public-literature filter families (Gopher: Rae et al. 2021 §A1.1;
C4: Raffel et al. 2020 §2.2), re-expressed as Spark column pipelines:

  - ``repetition_stats``: duplicate-word / duplicate-n-gram / duplicate-line
    fractions plus the top-bigram occupancy — the signals repetition filters
    threshold on. Everything except the top-bigram mode is a pure
    higher-order-function scan projection (no shuffle); the top bigram
    needs a per-(doc, gram) count, one explode + two groupBys keyed by
    doc_id.
  - ``gopher_filter``: the structural keep/drop rules (word-count window,
    mean-word-length window, stopword evidence, symbol ratio, bullet /
    ellipsis line fractions). All predicates are EXACT integer arithmetic
    (``3*words <= chars`` instead of ``chars/words >= 3``) so corpus
    membership can never drift between engines on a float ULP.
  - ``c4_line_clean``: line-level cleaning — keep lines that end in
    terminal punctuation, have at least ``min_words`` words, and carry no
    boilerplate markers; re-assemble the survivors into the cleaned text.
    One codegen scan projection.

At 100 TB each is an embarrassingly parallel scan (filters and projections
push into the parquet scan); only the top-bigram aggregation shuffles, and
it shuffles (doc_id, gram, count) triples — already combine-reduced map-side.

``synth_multiline`` is fixture shaping, not an operator: the driver's
``documents`` table is single-line word soup, so line-level queries derive
a deterministic multi-line document from it (8 words per line; every third
line left unterminated, every fifth line bulleted, every seventh marked as
boilerplate) — a closed-form function of the text both engines compute
identically, the same pattern analysis/media_fixtures.py uses for binary
payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens_expr
from .text import EN_STOPS


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 3,
) -> DataFrame:
    """(doc_id, n_words, dup_word_frac, dup_ngram_frac, dup_line_frac,
    top_bigram_frac) — repetition signals, 6-dp rounded fractions.

    dup_*_frac = 1 - distinct/total (0.0 for empty docs); top_bigram_frac
    = occurrences-of-most-frequent-bigram × 2 / n_words (count-based, so
    ties between equally frequent bigrams cannot make it nondeterministic,
    unlike the character-occupancy variant)."""
    n = ngram_n
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_tokens_expr(text_col)).alias("_t"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n").alias("_lines"),
    )
    grams = F.expr(
        f"CASE WHEN size(_t) >= {n} THEN "
        f"transform(sequence(0, size(_t) - {n}), "
        f"i -> array_join(slice(_t, i + 1, {n}), chr(32))) "
        f"ELSE array() END"
    )
    frac = lambda tot, dis: F.round(
        F.when(tot > 0, (tot - dis) / tot.cast("double")).otherwise(F.lit(0.0)), 6
    )
    base = (
        d.withColumn("_g", grams)
        .select(
            "doc_id",
            "_t",
            F.size("_t").alias("n_words"),
            frac(F.size("_t"), F.size(F.array_distinct("_t"))).alias(
                "dup_word_frac"
            ),
            frac(F.size("_g"), F.size(F.array_distinct("_g"))).alias(
                "dup_ngram_frac"
            ),
            frac(
                F.size("_lines"), F.size(F.array_distinct("_lines"))
            ).alias("dup_line_frac"),
        )
    )
    bigrams = F.expr(
        "CASE WHEN size(_t) >= 2 THEN transform(sequence(0, size(_t) - 2), "
        "i -> concat(_t[i], chr(32), _t[i + 1])) ELSE array() END"
    )
    top = (
        base.select("doc_id", F.explode(bigrams).alias("_bg"))
        .groupBy("doc_id", "_bg")
        .agg(F.count("*").alias("_c"))
        .groupBy("doc_id")
        .agg(F.max("_c").alias("_topc"))
    )
    return (
        base.drop("_t")
        .join(top, "doc_id", "left")
        .withColumn(
            "top_bigram_frac",
            F.round(
                F.when(
                    F.col("n_words") > 0,
                    F.coalesce(F.col("_topc"), F.lit(0)) * 2
                    / F.col("n_words").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .drop("_topc")
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_per_10_words: int = 1,
    max_bullet_lines_pct: int = 90,
    max_ellipsis_lines_pct: int = 30,
    min_stop_hits: int = 1,
) -> DataFrame:
    """(doc_id, n_words, flag columns…, keep) — Gopher-style structural
    gates, every predicate exact integer arithmetic.

    Flags (true = passes): ``f_words`` word count in [min_words,
    max_words]; ``f_word_len`` mean word length in [min, max] (as
    ``min*n <= total_chars <= max*n``); ``f_symbols`` at most
    ``max_symbol_per_10_words`` hash/ellipsis marks per 10 words;
    ``f_bullets`` / ``f_ellipsis`` line-start-bullet / line-end-ellipsis
    fractions under their ceilings (``100*count <= pct*lines``);
    ``f_stops`` at least ``min_stop_hits`` distinct English stopwords.
    ``keep`` is the conjunction."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_x"),
        F.expr(_tokens_expr(text_col)).alias("_t"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n").alias("_lines"),
    )
    n_words = F.size("_t")
    sum_len = F.expr("aggregate(_t, 0L, (acc, x) -> acc + length(x))")
    n_sym = (
        F.size(F.split(F.col("_x"), "#", -1))
        - 1
        + F.size(F.split(F.col("_x"), r"\.\.\.", -1))
        - 1
    )
    n_lines = F.size("_lines")
    n_bullet = F.size(
        F.filter(F.col("_lines"), lambda x: F.trim(x).startswith("- "))
    ) + F.size(F.filter(F.col("_lines"), lambda x: F.trim(x).startswith("* ")))
    n_ellipsis = F.size(
        F.filter(F.col("_lines"), lambda x: F.trim(x).endswith("..."))
    )
    stop_hits = F.lit(0)
    for w in EN_STOPS:
        stop_hits = stop_hits + F.when(
            F.array_contains("_t", w), 1
        ).otherwise(0)
    out = d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("f_words"),
        (
            (F.lit(min_mean_word_len) * n_words <= sum_len)
            & (sum_len <= F.lit(max_mean_word_len) * n_words)
        ).alias("f_word_len"),
        (n_sym * 10 <= F.lit(max_symbol_per_10_words) * n_words).alias(
            "f_symbols"
        ),
        (n_bullet * 100 <= F.lit(max_bullet_lines_pct) * n_lines).alias(
            "f_bullets"
        ),
        (n_ellipsis * 100 <= F.lit(max_ellipsis_lines_pct) * n_lines).alias(
            "f_ellipsis"
        ),
        (stop_hits >= min_stop_hits).alias("f_stops"),
    )
    return out.withColumn(
        "keep",
        F.col("f_words")
        & F.col("f_word_len")
        & F.col("f_symbols")
        & F.col("f_bullets")
        & F.col("f_ellipsis")
        & F.col("f_stops"),
    )


# markers whose presence drops a line outright (lowercase match)
C4_BOILERPLATE = ("javascript", "lorem ipsum", "cookie policy", "{")


def c4_line_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
) -> DataFrame:
    """(doc_id, clean_text, n_lines, n_lines_kept) — C4-style line filter.

    A line survives iff its trimmed form ends in terminal punctuation
    (. ! ? or a closing double-quote), has >= min_words whitespace words,
    and contains no boilerplate marker (case-insensitive). Survivors are
    re-joined with newlines; documents whose every line drops yield
    clean_text = '' (kept as a row — dropping docs is the caller's
    thresholding decision, not this operator's)."""

    def line_ok(x):
        t = F.trim(x)
        ok = (
            t.endswith(".")
            | t.endswith("!")
            | t.endswith("?")
            | t.endswith('"')
        ) & (F.size(F.split(t, r"\s+")) >= min_words)
        for marker in C4_BOILERPLATE:
            ok = ok & ~F.contains(F.lower(t), F.lit(marker))
        return ok

    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    kept = F.filter(lines, line_ok)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
    )


def synth_multiline(
    df: DataFrame,
    text_col: str = "text",
    words_per_line: int = 8,
    out: str = "mtext",
) -> DataFrame:
    """Adds ``out``: a deterministic multi-line re-rendering of the
    single-line test text — every ``words_per_line`` words become a line;
    line i is terminated with '.' unless i % 3 == 2 (left bare), prefixed
    with '- ' when i % 5 == 0, and replaced by a boilerplate marker line
    when i % 7 == 3. Pure closed-form fixture shaping so line-level
    operators have structure to act on; DuckDB rebuilds the identical
    column arithmetically (see analysis/oracles.synth_multiline_cte)."""
    w = words_per_line
    return df.withColumn("_smt", F.expr(_tokens_expr(text_col))).withColumn(
        out,
        F.expr(
            # size 0 must yield array() — bare sequence(0, -1) would count
            # DOWN in Spark ([0, -1]) instead of being empty like DuckDB's
            # range(0, 0)
            f"""
            array_join(transform(
              CASE WHEN size(_smt) = 0 THEN CAST(array() AS ARRAY<INT>)
                   ELSE sequence(0, CAST(ceil(size(_smt) / {w}.0) AS INT) - 1)
              END,
              i -> CASE
                WHEN i % 7 = 3 THEN 'see our cookie policy for details.'
                ELSE concat(
                  CASE WHEN i % 5 = 0 THEN '- ' ELSE '' END,
                  array_join(slice(_smt, i * {w} + 1, {w}), chr(32)),
                  CASE WHEN i % 3 = 2 THEN '' ELSE '.' END)
              END), chr(10))
            """
        ),
    ).drop("_smt")


# PII patterns: kept deliberately simple/portable (same regex dialect
# subset in Spark's Java regex and DuckDB's RE2: no backrefs, no lookarounds)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_emails, n_phones, scrubbed) — count and redact email /
    international-phone matches ([EMAIL] / [PHONE] placeholders). One
    codegen scan projection; counts come from regexp_count so the text is
    scanned, never exploded."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # phones count AFTER email redaction: a phone-shaped substring inside
    # an email local part ('+1-555-123@x.com') is redacted as the email,
    # so counting it as a phone would disagree with the [PHONE]
    # placeholders actually present in scrubbed
    t_ne = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t_ne, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_replace(t_ne, PHONE_RE, "[PHONE]").alias("scrubbed"),
    )


def synth_pii(
    df: DataFrame,
    text_col: str = "text",
    id_key: str = "doc_id",
    out: str = "ptext",
) -> DataFrame:
    """Adds ``out``: text with deterministic synthetic PII appended —
    every doc whose md5_u32(doc_id) lands in a residue class gains an
    email, a phone, or both (closed-form, both engines rebuild it
    identically via functions/hashing's portable md5_u32 pair; see
    oracles.synth_pii_expr). Fixture shaping for pii_scrub queries: the
    test corpus carries no real PII."""
    from spider_spark.functions.hashing import md5_u32_sql

    h = F.expr(f"{md5_u32_sql(f'cast({id_key} as string)')} % 4")
    t = F.coalesce(F.col(text_col), F.lit(""))
    sid = F.col(id_key).cast("string")
    email = F.concat(F.lit(" reach me at user"), sid, F.lit("@example.com"))
    # pad short ids to 3+ digits so the synthetic phone always matches
    # PHONE_RE's final [0-9]{3,10} group (never truncates longer ids)
    pad = F.expr(
        f"lpad(cast({id_key} as string), "
        f"greatest(length(cast({id_key} as string)), 3), '0')"
    )
    phone = F.concat(F.lit(" call +1-555-"), pad)
    return df.withColumn(
        out,
        F.when(h == 0, F.concat(t, email))
        .when(h == 1, F.concat(t, phone))
        .when(h == 2, F.concat(t, email, phone))
        .otherwise(t),
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 2,
) -> DataFrame:
    """(doc_id, clean_text, n_lines, n_lines_kept) — corpus-level line
    deduplication (the CCNet / RefinedWeb boilerplate pass): a line that
    appears in MORE than ``max_doc_freq`` distinct documents is dropped
    from every document; survivors re-assemble in original order.

    Unlike c4_line_clean (per-doc rules), the drop decision here is a
    corpus aggregate — repeated nav bars / cookie banners / footers are
    exactly the lines whose document frequency explodes.

    Scale shape: one explode over lines, one combine-heavy groupBy(line)
    over (doc_id, line)-distinct rows to find frequent lines, then a
    BROADCAST anti-join of the exploded lines against that blocklist —
    under any useful threshold the frequent-line set is tiny relative to
    the corpus (it is the boilerplate), so the corpus-side join is
    map-side. Reassembly is one groupBy(doc_id) with an array_sort over
    (pos, line) structs — positions are per-doc unique, so the rebuild is
    deterministic. Docs whose every line drops keep a row with
    clean_text = '' (thresholding whole docs is the caller's decision)."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n").alias("_lines"),
    )
    ex = d.select(
        "doc_id", F.posexplode("_lines").alias("pos", "line")
    )
    hot = (
        ex.select("doc_id", "line")
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("line")
    )
    kept = ex.join(F.broadcast(hot), "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_ct"),
        F.count("*").alias("_nk"),
    )
    return (
        d.select("doc_id", F.size("_lines").cast("long").alias("n_lines"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_ct"), F.lit("")).alias("clean_text"),
            "n_lines",
            F.coalesce(F.col("_nk"), F.lit(0)).cast("long").alias(
                "n_lines_kept"
            ),
        )
    )

"""Main-content extraction (boilerplate removal) — jusText-style block
classification, the step between R13's raw fetched HTML and the text the
corpus operators (dedup, quality, packing) should actually see.

The reference stops at whole-page tag-stripping (SiteScraper.scala's
jsoup `.text()` — navigation chrome, footers and link farms all land in
the indexed text). This module implements the context-sensitive block
classifier of Pomikálek 2011 (jusText), simplified to the portable
regex/arithmetic subset both Spark and DuckDB execute identically:

  1. **Segment**: split the HTML on block-level tags (p/div/h*/li/…) —
     a narrow posexplode, one block row per non-empty segment.
  2. **Context-free classify** each block on three exact-integer
     signals (the jusText signals, ULP-proof thresholds):
       - link density: chars of anchor inner text vs block chars —
         ``3*link_chars > n_chars`` (> 1/3) ⇒ ``bad`` (link farm);
       - length: ``n_words < min_words`` ⇒ ``short`` (undecided);
       - stopword evidence: ``10*stop_hits >= 3*n_words`` (≥ 30%
         density against the caller's stoplist) ⇒ ``good``,
         else ``bad`` (prose carries function words; keyword stuffing,
         code and menus don't).
  3. **Context pass** (the jusText insight): a ``short`` block inherits
     ``good`` iff its nearest non-short neighbour above OR below is
     good — headings and stub paragraphs survive inside article flow
     and drop inside chrome. Two IGNORE-NULLS window functions over
     (doc, block order), no iteration.

``main_content`` reassembles the final-good blocks into the cleaned
document.

Scale: segmentation and signals are one codegen scan projection
(regexps compile once; no UDF, no Python). The context pass and the
reassembly are windows/groupBy over the SAME key (doc_id), so the whole
operator costs ONE hash partitioning of the block stream, reused across
both stages. At 100 TB that is a single shuffle of (doc_id, block)
rows — and blocks of one doc are never needed on two executors.

The stoplist defaults to the tiny shared EN_STOPS fixture list; real
deployments pass a full function-word list per language (the threshold
arithmetic is list-size-agnostic). Tags are matched with the same
RE2-safe dialect subset as cleaning.py (no backrefs/lookarounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import EN_STOPS

# block-level boundaries: consume the tag, keep everything between.
BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|br|hr|table|thead|tbody|"
    r"tr|td|th|section|article|aside|header|footer|nav|main|figure|"
    r"figcaption|blockquote|pre|form|fieldset|title|head|body|html)"
    r"[^>]*>"
)
TAG_RE = r"<[^>]*>"
# <a> or <a ...> only — never <abbr>/<article>; (?is) so inner text may
# span lines; non-greedy inner so sibling anchors don't merge.
ANCHOR_RE = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"
# script/style/noscript ELEMENTS drop wholesale (tag AND body) before
# segmentation — jusText removes them entirely; stopword-rich JS string
# literals / JSON-LD descriptions must never classify 'good'. RE2-safe
# (no backrefs: one alternative per tag); an UNCLOSED tag simply doesn't
# match, degrading to classify-the-body rather than eating the document.
DROP_CONTENT_RE = (
    r"(?is)<script\b[^>]*>.*?</script\s*>"
    r"|<style\b[^>]*>.*?</style\s*>"
    r"|<noscript\b[^>]*>.*?</noscript\s*>"
)


def _stop_lit_spark(stops: tuple[str, ...]) -> str:
    """Stoplist as Spark-SQL literals — backslash escaping, so
    contraction/apostrophe stopwords (don't, l') can't break the expr."""
    return ", ".join(
        "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'" for s in stops
    )


def _stop_lit_duck(stops: tuple[str, ...]) -> str:
    """Stoplist as standard-SQL literals (DuckDB: quote doubling)."""
    return ", ".join("'" + s.replace("'", "''") + "'" for s in stops)

_CLEAN = (
    "trim(regexp_replace(regexp_replace({x}, '{tag}', ' '), '\\\\s+', ' '))"
)


def _clean(x: str) -> str:
    return _CLEAN.format(x=x, tag=TAG_RE)


def html_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 3,
    stops: tuple[str, ...] = EN_STOPS,
) -> DataFrame:
    """(doc_id, block_id, text, n_chars, link_chars, n_words, stop_hits,
    cls, final_cls) — one row per non-empty block; block_id is the
    segment position in the original HTML (stable, possibly sparse)."""
    stop_lit = _stop_lit_spark(stops)
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(
                F.regexp_replace(
                    F.coalesce(F.col(html_col), F.lit("")),
                    DROP_CONTENT_RE,
                    " ",
                ),
                BLOCK_TAG_RE,
            )
        ).alias("block_id", "_raw"),
    )
    d = (
        d.withColumn("text", F.expr(_clean("_raw")))
        .filter(F.col("text") != "")
        .withColumn(
            "link_chars",
            # Spark SQL string literals consume one level of backslash,
            # so the regex's \s must be doubled here (DuckDB literals
            # keep backslashes verbatim and use ANCHOR_RE as-is)
            F.expr(
                f"aggregate(regexp_extract_all(_raw, "
                f"'{ANCHOR_RE.replace(chr(92), chr(92) * 2)}', 1), "
                f"0L, (acc, x) -> acc + length({_clean('x')}))"
            ),
        )
        .withColumn("_w", F.split(F.lower("text"), " "))
        .select(
            "doc_id",
            F.col("block_id").cast("long").alias("block_id"),
            "text",
            F.length("text").cast("long").alias("n_chars"),
            "link_chars",
            F.size("_w").cast("long").alias("n_words"),
            F.expr(
                f"cast(size(filter(_w, w -> w in ({stop_lit}))) as long)"
            ).alias("stop_hits"),
        )
        .withColumn(
            "cls",
            F.when(3 * F.col("link_chars") > F.col("n_chars"), "bad")
            .when(F.col("n_words") < min_words, "short")
            .when(10 * F.col("stop_hits") >= 3 * F.col("n_words"), "good")
            .otherwise("bad"),
        )
    )
    decided = F.when(F.col("cls") != "short", F.col("cls"))
    above = Window.partitionBy("doc_id").orderBy("block_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    below = Window.partitionBy("doc_id").orderBy("block_id").rowsBetween(
        1, Window.unboundedFollowing
    )
    prev_c = F.last(decided, ignorenulls=True).over(above)
    next_c = F.first(decided, ignorenulls=True).over(below)
    return d.withColumn(
        "final_cls",
        F.when(F.col("cls") != "short", F.col("cls")).otherwise(
            F.when(
                (prev_c == "good") | (next_c == "good"), "good"
            ).otherwise("bad")
        ),
    )


def main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 3,
    stops: tuple[str, ...] = EN_STOPS,
) -> DataFrame:
    """(doc_id, content, n_blocks_kept): final-good blocks rejoined in
    document order ('\\n'). Docs with no good block emit no row (the
    upstream filter decision stays with the caller)."""
    b = html_blocks(df, html_col, id_col, min_words, stops)
    return (
        b.filter(F.col("final_cls") == "good")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(block_id, text))), x -> x.text), "
                "chr(10))"
            ).alias("content"),
            F.count("*").cast("long").alias("n_blocks_kept"),
        )
    )


# ------------------------------------------------ driver-fixture shaping


def synth_page_expr(text_col: str = "text") -> str:
    """Spark-SQL expression: a deterministic HTML page derived from the
    driver's single-line word-soup ``text`` (the documents table carries
    no HTML), in the r13/synth_multiline closed-form-fixture idiom: a
    title, a link-farm nav over the first words, a two-word heading, a
    stopword-bearing main paragraph, a short trailing paragraph, and a
    footer — so every classifier branch fires on real corpus variety and
    DuckDB rebuilds the identical page arithmetically."""
    words = (
        f"slice(filter(split(lower(coalesce({text_col}, '')), '\\\\s+'), "
        f"w -> w rlike '^[a-z]+$'), 1, 12)"
    )
    return f"""
    concat(
      '<head><title>', coalesce(element_at({words}, 1), 'x'),
      '</title></head><body><nav>',
      array_join(transform(slice({words}, 1, 3),
        w -> concat('<a href="/', w, '">', w, '</a>')), ' '),
      '</nav><h2>', array_join(slice({words}, 1, 2), ' '),
      '</h2><p>', array_join({words}, ' '),
      ' the and of to is the and of to is</p><p>',
      array_join(slice({words}, 4, 2), ' '),
      '</p><footer><a href="/tos">terms</a></footer></body>')
    """


def synth_page_duckdb(text_col: str = "text") -> str:
    """DuckDB replica of ``synth_page_expr``."""
    words = (
        f"list_slice(list_filter(string_split_regex(lower(coalesce("
        f"{text_col}, '')), '\\s+'), w -> regexp_full_match(w, '[a-z]+')),"
        f" 1, 12)"
    )
    return f"""
      '<head><title>' || coalesce(({words})[1], 'x')
      || '</title></head><body><nav>'
      || array_to_string(list_transform(list_slice({words}, 1, 3),
           w -> '<a href="/' || w || '">' || w || '</a>'), ' ')
      || '</nav><h2>' || array_to_string(list_slice({words}, 1, 2), ' ')
      || '</h2><p>' || array_to_string({words}, ' ')
      || ' the and of to is the and of to is</p><p>'
      -- list_slice is (begin, end) — elements 4..5, Spark's slice(w,4,2)
      || array_to_string(list_slice({words}, 4, 5), ' ')
      || '</p><footer><a href="/tos">terms</a></footer></body>'
    """


# ------------------------------------------------------- DuckDB replicas


def _clean_duck(x: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace({x}, '{TAG_RE}', ' ', 'g'), "
        f"'\\s+', ' ', 'g'))"
    )


def _blocks_cte(
    table: str,
    html_expr: str,
    min_words: int,
    stops: tuple[str, ...],
    id_col: str = "doc_id",
) -> str:
    """CTE chain ending in ``cblocks`` = the html_blocks output."""
    stop_lit = _stop_lit_duck(stops)
    return f"""
    seg AS (
      SELECT {id_col} AS doc_id,
             regexp_split_to_array(
               regexp_replace(coalesce({html_expr}, ''),
                              '{DROP_CONTENT_RE}', ' ', 'g'),
               '{BLOCK_TAG_RE}') AS bs
      FROM {table}
    ),
    eb AS (
      SELECT doc_id, unnest(range(0, len(bs))) AS block_id,
             unnest(bs) AS raw
      FROM seg
    ),
    sig AS (
      SELECT doc_id, CAST(block_id AS BIGINT) AS block_id,
             {_clean_duck('raw')} AS text,
             CAST(coalesce(list_sum(list_transform(
                 regexp_extract_all(raw, '{ANCHOR_RE}', 1),
                 x -> length({_clean_duck('x')}))), 0) AS BIGINT)
               AS link_chars,
             string_split(lower({_clean_duck('raw')}), ' ') AS w
      FROM eb
      WHERE {_clean_duck('raw')} <> ''
    ),
    blocks AS (
      SELECT doc_id, block_id, text,
             CAST(length(text) AS BIGINT) AS n_chars, link_chars,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(len(list_filter(w,
                 x -> list_contains([{stop_lit}], x))) AS BIGINT)
               AS stop_hits
      FROM sig
    ),
    klass AS (
      SELECT *,
             CASE WHEN 3 * link_chars > n_chars THEN 'bad'
                  WHEN n_words < {min_words} THEN 'short'
                  WHEN 10 * stop_hits >= 3 * n_words THEN 'good'
                  ELSE 'bad' END AS cls
      FROM blocks
    ),
    cblocks AS (
      SELECT *,
             CASE WHEN cls <> 'short' THEN cls
                  WHEN last_value(CASE WHEN cls <> 'short' THEN cls END
                         IGNORE NULLS) OVER (
                         PARTITION BY doc_id ORDER BY block_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       = 'good'
                    OR first_value(CASE WHEN cls <> 'short' THEN cls END
                         IGNORE NULLS) OVER (
                         PARTITION BY doc_id ORDER BY block_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       = 'good'
                  THEN 'good' ELSE 'bad' END AS final_cls
      FROM klass
    )
    """


def html_blocks_sql(
    table: str,
    html_expr: str,
    min_words: int = 3,
    stops: tuple[str, ...] = EN_STOPS,
    id_col: str = "doc_id",
) -> str:
    """DuckDB replica of ``html_blocks`` over ``html_expr`` (an SQL
    expression synthesizing or naming the HTML column)."""
    return (
        "WITH "
        + _blocks_cte(table, html_expr, min_words, stops, id_col)
        + """
    SELECT doc_id, block_id, text, n_chars, link_chars, n_words,
           stop_hits, cls, final_cls
    FROM cblocks
    """
    )


def main_content_sql(
    table: str,
    html_expr: str,
    min_words: int = 3,
    stops: tuple[str, ...] = EN_STOPS,
    id_col: str = "doc_id",
) -> str:
    """DuckDB replica of ``main_content``."""
    return (
        "WITH "
        + _blocks_cte(table, html_expr, min_words, stops, id_col)
        + """
    SELECT doc_id,
           string_agg(text, chr(10) ORDER BY block_id) AS content,
           count(*) AS n_blocks_kept
    FROM cblocks
    WHERE final_cls = 'good'
    GROUP BY doc_id
    """
    )

"""Page-metadata extraction: title / description / og:title / lang / h1.

The corpus tier between R13's link extraction and the text operators: a
training pipeline wants each page's declared metadata (dataset cards,
dedup keys, titles for retrieval display) without a full DOM parse. The
reference's jsoup `Document` exposes these for free (SiteScraper parses
the page anyway, SiteScraper.scala:78-86) but the reference only ever
reads links/canonical (ContentFilter.scala:41-58) — this module is the
metadata complement, built like analysis/boilerplate.py: first-match
regexes in the RE2-safe dialect subset, so the DuckDB replica is the
full operator, not a stand-in.

Extraction contract (deliberately narrow, pinned by tests):
  - first occurrence wins for every field (both engines' regexp_extract);
  - tag names and attribute KEYS match case-insensitively (``(?i)``);
  - attribute values must be double-quoted (the single-quote/unquoted
    forms return NULL — a parser, not a regex, is the tool for full
    attribute grammar; at corpus scale the double-quote form dominates);
    meta attributes match in either order (name-first and content-first
    patterns, coalesced);
  - `h1` strips nested inline tags and collapses whitespace;
  - a missing field is NULL (never ''), via nullif.

Plan shape: ONE scan projection per call — no shuffle, no UDF; every
expression stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe (no backrefs, no lookaround); [\s\S] crosses newlines without
# needing a DOTALL flag in either engine
_TITLE = r"(?i)<title[^>]*>([^<]*)</title>"
# meta attributes appear in either order in real HTML — one pattern per
# order (RE2-safe; no backrefs), coalesced at extraction time
_DESC = r'(?i)<meta[^>]*name="description"[^>]*content="([^"]*)"'
_DESC_REV = r'(?i)<meta[^>]*content="([^"]*)"[^>]*name="description"'
_OG_TITLE = r'(?i)<meta[^>]*property="og:title"[^>]*content="([^"]*)"'
_OG_TITLE_REV = r'(?i)<meta[^>]*content="([^"]*)"[^>]*property="og:title"'
_LANG = r'(?i)<html[^>]*lang="([a-zA-Z-]+)"'
_H1 = r"(?i)<h1[^>]*>([\s\S]*?)</h1>"
_TAG = r"<[^>]+>"


def _clean_spark(x: str) -> str:
    """Strip inner tags, collapse whitespace, trim (Spark SQL)."""
    return (
        f"trim(regexp_replace(regexp_replace({x}, '{_TAG}', ' '), "
        f"'\\\\s+', ' '))"
    )


def page_metadata(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, title, description, og_title, html_lang, h1) — NULL for
    absent fields; single codegen scan."""
    h = f"coalesce({html_col}, '')"

    def first(pattern: str) -> str:
        # Spark SQL string literals process backslash escapes — double
        # them so the regex engine sees \s, not s
        p = pattern.replace("\\", "\\\\").replace("'", "\\'")
        return f"nullif(regexp_extract({h}, '{p}', 1), '')"

    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"nullif({_clean_spark(first(_TITLE))}, '')").alias("title"),
        F.expr(f"coalesce({first(_DESC)}, {first(_DESC_REV)})").alias(
            "description"
        ),
        F.expr(
            f"coalesce({first(_OG_TITLE)}, {first(_OG_TITLE_REV)})"
        ).alias("og_title"),
        F.expr(first(_LANG)).alias("html_lang"),
        F.expr(f"nullif({_clean_spark(first(_H1))}, '')").alias("h1"),
    )


def _clean_duck(x: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace({x}, '{_TAG}', ' ', 'g'), "
        f"'\\s+', ' ', 'g'))"
    )


def page_metadata_sql(
    table: str, html_expr: str, id_col: str = "doc_id"
) -> str:
    """DuckDB replica over ``html_expr`` (a SQL expression producing the
    page, e.g. a raw column or a synth-page expression)."""
    h = f"coalesce({html_expr}, '')"

    def first(pattern: str) -> str:
        p = pattern.replace("'", "''")
        return f"nullif(regexp_extract({h}, '{p}', 1), '')"

    return f"""
    SELECT {id_col} AS doc_id,
           nullif({_clean_duck(first(_TITLE))}, '') AS title,
           coalesce({first(_DESC)}, {first(_DESC_REV)}) AS description,
           coalesce({first(_OG_TITLE)}, {first(_OG_TITLE_REV)})
               AS og_title,
           {first(_LANG)} AS html_lang,
           nullif({_clean_duck(first(_H1))}, '') AS h1
    FROM {table}
    """


_JSONLD = (
    r'(?i)<script[^>]*type="application/ld\+json"[^>]*>([\s\S]*?)'
    r"</script>"
)


def jsonld_extract(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, ld_type, ld_name, ld_date) from the FIRST
    ``<script type="application/ld+json">`` block — the schema.org
    structured data most product/article pages declare (and most
    retrieval/dedup pipelines prefer over scraped fields when present).
    Block located by regexp, fields read with Spark's JSON path
    expressions (``get_json_object``) — a malformed block yields NULLs,
    never a task failure; single codegen scan, no UDF."""
    h = f"coalesce({html_col}, '')"
    p = _JSONLD.replace("\\", "\\\\").replace("'", "\\'")
    block = f"nullif(regexp_extract({h}, '{p}', 1), '')"
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"get_json_object({block}, '$[\\'@type\\']')").alias(
            "ld_type"
        ),
        F.expr(f"get_json_object({block}, '$.name')").alias("ld_name"),
        F.expr(f"get_json_object({block}, '$.datePublished')").alias(
            "ld_date"
        ),
    )


def jsonld_extract_sql(
    table: str, html_expr: str, id_col: str = "doc_id"
) -> str:
    """DuckDB replica of :func:`jsonld_extract` over ``html_expr``."""
    h = f"coalesce({html_expr}, '')"
    p = _JSONLD.replace("'", "''")
    # DuckDB's json functions RAISE on malformed JSON where Spark's
    # get_json_object returns NULL — json_valid gates the same degrade
    block = (
        f"nullif(CASE WHEN json_valid(regexp_extract({h}, '{p}', 1)) "
        f"THEN regexp_extract({h}, '{p}', 1) END, '')"
    )
    return f"""
    SELECT {id_col} AS doc_id,
           json_extract_string({block}, '$."@type"') AS ld_type,
           json_extract_string({block}, '$.name') AS ld_name,
           json_extract_string({block}, '$.datePublished') AS ld_date
    FROM {table}
    """


def jsonld_page_expr(text_col: str = "text", id_col: str = "doc_id") -> str:
    """Spark-SQL synth fixture: a page whose JSON-LD block is closed-form
    in the doc id — type alternates Article/Product, ids divisible by 7
    carry NO block (the NULL branch), ids divisible by 11 carry a
    MALFORMED block (the degrade-to-NULL branch)."""
    return f"""
    concat(
      '<html><head><title>t</title>',
      CASE
        WHEN {id_col} % 7 = 0 THEN ''
        WHEN {id_col} % 11 = 0 THEN
          '<script type="application/ld+json">not json at all</script>'
        ELSE concat(
          '<script type="application/ld+json">',
          '{{"@type":"',
          CASE WHEN {id_col} % 2 = 0 THEN 'Article' ELSE 'Product' END,
          '","name":"item ', cast({id_col} as string),
          '","datePublished":"2024-0',
          cast(1 + {id_col} % 9 as string), '-01"}}</script>')
      END,
      '</head><body><p>body</p></body></html>')
    """


def jsonld_page_duckdb(
    text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB replica of :func:`jsonld_page_expr`."""
    return f"""
      '<html><head><title>t</title>'
      || CASE
           WHEN {id_col} % 7 = 0 THEN ''
           WHEN {id_col} % 11 = 0 THEN
             '<script type="application/ld+json">not json at all</script>'
           ELSE
             '<script type="application/ld+json">'
             || '{{"@type":"'
             || CASE WHEN {id_col} % 2 = 0
                     THEN 'Article' ELSE 'Product' END
             || '","name":"item ' || CAST({id_col} AS VARCHAR)
             || '","datePublished":"2024-0'
             || CAST(1 + {id_col} % 9 AS VARCHAR) || '-01"}}</script>'
         END
      || '</head><body><p>body</p></body></html>'
    """


def metadata_page_expr(text_col: str = "text", id_col: str = "doc_id") -> str:
    """Spark-SQL synth fixture (the boilerplate.synth_page_expr idiom):
    an HTML head/body whose metadata fields vary deterministically with
    the doc id so every NULL branch fires — description only on even
    ids, og:title only on id % 3 = 0, an h1 with a nested <b> tag."""
    words = (
        f"slice(filter(split(lower(coalesce({text_col}, '')), '\\\\s+'), "
        f"w -> w rlike '^[a-z]+$'), 1, 8)"
    )
    return f"""
    concat(
      '<html lang="', chr(97 + cast({id_col} % 5 as int)), 'x">',
      '<head><title> ', array_join(slice({words}, 1, 2), ' '),
      ' </title>',
      CASE WHEN {id_col} % 2 = 0 THEN concat(
        '<meta name="description" content="',
        array_join(slice({words}, 2, 3), ' '), '">') ELSE '' END,
      CASE WHEN {id_col} % 3 = 0 THEN concat(
        '<meta property="og:title" content="',
        coalesce(try_element_at({words}, 1), 'x'), '">') ELSE '' END,
      '</head><body><h1>big <b>',
      coalesce(try_element_at({words}, 3), 'y'),
      '</b>  news</h1><p>body</p></body></html>')
    """


def metadata_page_duckdb(
    text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB replica of ``metadata_page_expr``."""
    words = (
        f"list_slice(list_filter(string_split_regex(lower(coalesce("
        f"{text_col}, '')), '\\s+'), w -> regexp_full_match(w, '[a-z]+')),"
        f" 1, 8)"
    )
    return f"""
      '<html lang="' || chr(97 + CAST({id_col} % 5 AS INT)) || 'x">'
      || '<head><title> ' || coalesce(array_to_string(list_slice({words}, 1, 2), ' '), '')
      || ' </title>'
      || CASE WHEN {id_col} % 2 = 0 THEN
           '<meta name="description" content="'
           || coalesce(array_to_string(list_slice({words}, 2, 4), ' '), '') || '">'
         ELSE '' END
      || CASE WHEN {id_col} % 3 = 0 THEN
           '<meta property="og:title" content="'
           || coalesce(({words})[1], 'x') || '">'
         ELSE '' END
      || '</head><body><h1>big <b>'
      || coalesce(({words})[3], 'y')
      || '</b>  news</h1><p>body</p></body></html>'
    """

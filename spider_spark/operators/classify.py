"""R11/R12/R15 fetch-response classification — shared column expressions.

One implementation used by BOTH the engine's round loop (engine.run_round)
and the driver-contract queries (__spark_entry__.r11/r12), so the
CORRECTNESS gate pins the exact predicates the crawl executes:

  - ``xrobots_noindex``  — R11: case-insensitive ``X-Robots-Tag`` header
    lookup; a value matching noindex|none drops the page from indexing
    (reference SiteScraper.scala:70-77 via FetchedValues.xRobotsTag).
  - ``response_class``   — the R11/R12/R15 decision tree: err (fetch
    failure), bad (non-200), noidx (R11), html (R12 content-type gate,
    ``text/html*`` → link extraction), plain (indexed, no extraction)
    (reference SiteScraper.scala:52-88, Supervisor.scala:119-131).

All pure JVM column expressions — whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def xrobots_noindex(headers_col: str) -> Column:
    """True when the headers map carries an X-Robots-Tag (any key case)
    whose value matches noindex|none; False when absent (fail-open)."""
    xro = F.try_element_at(
        F.expr(
            f"filter(map_entries({headers_col}), "
            "e -> lower(e.key) = 'x-robots-tag')"
        ),
        F.lit(1),
    )["value"]
    # substring CONTAINS, not token match, is the reference's exact
    # semantics (ResponseFilter.scala:21-22: tags.toLowerCase.contains),
    # so 'nonexistent-policy' counting as noindex is parity, not a bug
    return F.coalesce(F.lower(xro).rlike("noindex|none"), F.lit(False))


def response_class(
    status: Column, content_type: Column, noindex: Column, doc_id: Column
) -> Column:
    """'err' | 'bad' | 'noidx' | 'html' | 'plain' for a fetch-join row.

    ``doc_id`` is the fetch join's result key: null ⇒ the URL resolved to
    no document (fetch failure), like status < 0 (transport error)."""
    noindex = F.coalesce(noindex, F.lit(False))
    is_err = doc_id.isNull() | (status < 0)
    is_bad = (~is_err) & (status != 200)
    is_noidx = (~is_err) & (~is_bad) & noindex
    ok = (~is_err) & (~is_bad) & (~is_noidx)
    is_html = ok & content_type.startswith("text/html")
    return (
        F.when(is_err, "err")
        .when(is_bad, "bad")
        .when(is_noidx, "noidx")
        .when(is_html, "html")
        .otherwise("plain")
    )

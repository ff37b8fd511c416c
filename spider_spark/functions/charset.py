"""Charset detection + transcode at the fetch boundary.

A real crawl's fetch path yields BYTES; the corpus wants unicode text.
The reference leans on jsoup's charset handling when it parses a page
(SiteScraper.scala's Jsoup.parse path); at lake scale the decode is a
corpus operator in its own right — every downstream text op (cleaning,
dedup, tokenization) silently depends on it being deterministic.

Detection contract (pinned in tests/test_charset.py, deliberately
narrow — the HTML5 'encoding sniffing algorithm' prefix, not a
statistical guesser):

1. **BOM wins**: EF BB BF → utf-8, FF FE → utf-16-le, FE FF →
   utf-16-be (the BOM is consumed — it never leaks into the text).
2. Else a ``<meta charset=...>`` / ``http-equiv Content-Type`` scan of
   the first 1024 bytes (latin-1-decoded so the scan itself can't
   fail), label normalized through the alias table (utf8 → utf-8,
   iso-8859-1 → latin-1, windows-1252 → cp1252, ...).
3. Else **utf-8 by default**; decoding always uses
   ``errors="replace"`` so undecodable bytes degrade to U+FFFD —
   a mojibake capture never fails a 100-TB scan stage.

Scale shape: one Arrow-batched pandas-UDF projection (the decode is
inherently a Python/codec boundary — there is no JVM expression for
"decode cp1252"); no shuffle, no driver state.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BOMS: tuple[tuple[bytes, str], ...] = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

# normalization of the labels seen in real <meta> tags → python codecs
ALIASES: dict[str, str] = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "utf-16": "utf-16",
    "utf-16-le": "utf-16-le",
    "utf-16le": "utf-16-le",
    "utf-16-be": "utf-16-be",
    "utf-16be": "utf-16-be",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "euc-jp": "euc_jp",
    "gbk": "gbk",
    "gb2312": "gbk",
    "big5": "big5",
    "koi8-r": "koi8_r",
    "iso-8859-2": "iso8859-2",
    "iso-8859-15": "iso8859-15",
}

_META = re.compile(
    rb"(?i)<meta[^>]*charset\s*=\s*[\"']?([a-zA-Z0-9_-]+)"
)


def detect_charset(b: bytes | None) -> str:
    """Detected codec name for a payload (contract above). Returns a
    python codec label from ALIASES' value set, or 'utf-8'."""
    if not b:
        return "utf-8"
    for bom, name in _BOMS:
        if b.startswith(bom):
            return name
    m = _META.search(b[:1024])
    if m:
        label = m.group(1).decode("latin-1").lower()
        if label in ALIASES:
            return ALIASES[label]
    return "utf-8"


def decode_bytes(b: bytes | None) -> tuple[str, str]:
    """(charset, text): detect, strip the BOM if one fired, decode with
    errors='replace'. Never raises."""
    if b is None:
        return "utf-8", ""
    cs = detect_charset(b)
    for bom, name in _BOMS:
        if name == cs and b.startswith(bom):
            b = b[len(bom):]
            break
    try:
        return cs, b.decode(cs, errors="replace")
    except LookupError:  # alias table is closed, but belt-and-braces
        return "utf-8", b.decode("utf-8", errors="replace")


def decode_documents(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, charset, text) from raw fetched bytes — one Arrow-batched
    projection, no shuffle."""

    @F.pandas_udf("charset string, text string")
    def dec(p: pd.Series) -> pd.DataFrame:
        pairs = [
            decode_bytes(bytes(x) if x is not None else None) for x in p
        ]
        return pd.DataFrame(pairs, columns=["charset", "text"])

    out = df.select(
        F.col(id_col).alias("doc_id"), dec(F.col(payload_col)).alias("d")
    )
    return out.select("doc_id", "d.charset", "d.text")


# -------------------------------------------------------------- fixture


def charset_fix_text(i: int) -> str:
    """Closed-form page text for id ``i`` — non-ASCII on purpose (the
    decode has to do real work): 'héllo wörld {i} dès ünïcode'."""
    return f"héllo wörld {i} dès ünïcode"


_FIX_MODES: tuple[tuple[str, str], ...] = (
    # (python codec to ENCODE with, charset the detector should report)
    ("utf-8-sig", "utf-8"),      # BOM route
    ("utf-16-le", "utf-16-le"),  # BOM route (prepended below)
    ("latin-1", "latin-1"),      # meta-tag route
    ("cp1252", "cp1252"),        # meta-tag route
    ("utf-8", "utf-8"),          # default route (no BOM, no meta)
)


def charset_fix_payload(i: int) -> bytes:
    """Closed-form encoded page for id ``i``: mode rotates i%5 through
    BOM / meta-tag / default detection routes; the decoded text is
    ``charset_fix_text(i)`` wrapped in minimal HTML on the meta routes
    and bare on the others (so the oracle's text is closed-form too)."""
    enc, label = _FIX_MODES[i % 5]
    txt = charset_fix_text(i)
    if label in ("latin-1", "cp1252"):
        page = f'<html><head><meta charset="{label}"></head><body>{txt}</body></html>'
        return page.encode(enc)
    if enc == "utf-16-le":
        return b"\xff\xfe" + txt.encode(enc)
    return txt.encode(enc)  # utf-8-sig adds its own BOM; plain utf-8 none


def charset_fix_expected_text(i: int) -> str:
    """What decode_documents must return for fixture id ``i``."""
    enc, label = _FIX_MODES[i % 5]
    txt = charset_fix_text(i)
    if label in ("latin-1", "cp1252"):
        return (
            f'<html><head><meta charset="{label}"></head>'
            f"<body>{txt}</body></html>"
        )
    return txt


def synth_charset_docs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) → (doc_id, payload): the encoded fixture pages."""

    @F.pandas_udf("binary")
    def pay(ids: pd.Series) -> pd.Series:
        return ids.astype("int64").map(
            lambda i: charset_fix_payload(int(i))
        )

    ids = df.select(F.col(id_col).cast("long").alias("doc_id"))
    return ids.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).select("doc_id", pay("doc_id").alias("payload"))

"""URL canonicalization / filtering — vectorized pure functions.

Re-implements (Spark-first, over pandas Series so it runs inside Arrow-batched
pandas UDFs or plain driver code) the reference's URL surgery:

  - ``clean_url``      — reference R22: UrlCleaner.scala:12-50
        * strip fragment (``withFragment(None)``)
        * drop query params  nn, gtp, imgdownload, download, shoppingCart,
          cms_handOverParams  (UrlCleaner.scala:14-22)
        * strip ``;jsessionid=...`` from path segments (UrlCleaner.scala:24)
        * punycode non-ASCII hosts (``toStringPunycode``)
  - ``strip_trailing_slash`` — reference R23: Supervisor.scala:221
        (a SECOND normalizer applied at schedule/dedup time, composed with
        clean_url, which itself does NOT strip slashes)
  - ``wanted_url``     — reference R25: UrlFilter.scala:8-33
  - ``is_valid_url``   — reference R24: Apache commons UrlValidator as used
        at ContentFilter.scala:22,85,92,108,127 (scheme + registrable host)
  - ``url_host``       — reference R2: java.net.URL.getHost (Supervisor.scala:176)

Golden-tested against UrlCleanerTest.scala:15-106 and UrlFilterSpec.scala:15-60.

Everything is ``pd.Series -> pd.Series`` using compiled-regex ``str`` ops —
no per-row Python in the hot path. Scalar convenience wrappers exist for
tests and the oracle simulator.
"""

from __future__ import annotations

import re

import pandas as pd

UNWANTED_QUERY_PARAMS = (
    "cms_handOverParams",
    "imgdownload",
    "shoppingCart",
    "download",
    "gtp",
    "nn",
)

_PARAM_ALT = "|".join(UNWANTED_QUERY_PARAMS)  # longest-first alternation

# strip fragment
_FRAGMENT_RE = r"#.*$"
# ;jsessionid=... to end of the path segment (segment = up to next / ? #)
_JSESSIONID_RE = r";jsessionid=[^/?#]*"
# unwanted param in non-first position:  &name=value
_PARAM_MID_RE = rf"&(?:{_PARAM_ALT})=[^&#]*"
# unwanted param first with a successor:  ?name=value&  ->  ?
_PARAM_FIRST_RE = rf"\?(?:{_PARAM_ALT})=[^&#]*&"
# unwanted param as the only param:       ?name=value$  ->  (nothing)
_PARAM_ONLY_RE = rf"\?(?:{_PARAM_ALT})=[^&#]*$"

_HOST_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]*)")

# Apache-commons-UrlValidator-alike (default schemes http/https/ftp; host must
# be a dotted registrable name with an alphabetic TLD, or an IPv4 literal).
_VALID_URL_RE = re.compile(
    r"^(?:https?|ftp)://"
    r"(?:[^\s/?#@]+@)?"  # userinfo
    r"(?:"
    r"(?:[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?\.)+[A-Za-z]{2,}"  # domain
    r"|(?:\d{1,3}\.){3}\d{1,3}"  # ipv4
    r")"
    r"(?::\d{1,5})?"
    r"(?:[/?#][^\s<>\"{}|\\^\[\]`]*)?$"
)


# ---------------------------------------------------------------- clean (R22)


def clean_url_series(urls: pd.Series) -> pd.Series:
    """Vectorized R22 canonicalization (UrlCleaner.scala:28-33 pipeline)."""
    s = urls.astype("string")
    s = s.str.replace(_FRAGMENT_RE, "", regex=True)
    s = s.str.replace(_JSESSIONID_RE, "", regex=True)
    s = s.str.replace(_PARAM_MID_RE, "", regex=True)
    s = s.str.replace(_PARAM_FIRST_RE, "?", regex=True)
    s = s.str.replace(_PARAM_ONLY_RE, "", regex=True)
    # punycode hosts: fast path for pure-ASCII urls (the overwhelming case);
    # nulls stay null (na=True marks them "ascii" so they skip the slow path)
    nonascii = ~s.str.match(r"^[\x00-\x7f]*$", na=True).astype(bool)
    if nonascii.any():
        s = s.mask(nonascii, s[nonascii].map(_punycode_host))
    return s


def _punycode_host(url: str) -> str:
    m = _HOST_RE.match(url)
    if not m:
        return url
    host = m.group(1)
    try:
        puny = host.encode("idna").decode("ascii")
    except (UnicodeError, UnicodeDecodeError):
        return url
    return url[: m.start(1)] + puny + url[m.end(1) :]


def clean_url(url: str) -> str:
    """Scalar wrapper (tests / oracle)."""
    return str(clean_url_series(pd.Series([url])).iloc[0])


# ------------------------------------------------- trailing-slash strip (R23)


def strip_trailing_slash_series(urls: pd.Series) -> pd.Series:
    """Supervisor.scala:221 — stripSuffix("/") on the whole URL string."""
    return urls.astype("string").str.replace(r"/$", "", regex=True)


def strip_trailing_slash(url: str) -> str:
    return url[:-1] if url.endswith("/") else url


# ------------------------------------------------------------- wanted (R25)

_WANTED_REJECT_CONTAINS = (
    "!search?",            # UrlFilter.isSearchResultPage
    "/SiteGlobals/Forms/",  # UrlFilter.isForm
    "?show=image",          # UrlFilter.isImagePopup
    "&show=image",
    "!show=image",
)
# Scala ``String.matches`` is a FULL match; ``.*/warenkorb.*`` therefore means
# "contains /warenkorb", likewise /addToCart (UrlFilter.scala:26-31).
_WANTED_REJECT_RE = r"/warenkorb|/addToCart"
_WANTED_CONTAINS_RE = "|".join(re.escape(c) for c in _WANTED_REJECT_CONTAINS)


def wanted_url_series(urls: pd.Series) -> pd.Series:
    s = urls.astype("string")
    bad = s.str.contains(_WANTED_CONTAINS_RE, regex=True, na=False)
    bad |= s.str.contains(_WANTED_REJECT_RE, regex=True, na=False)
    return (~bad).fillna(False)


def wanted_url(url: str) -> bool:
    return bool(wanted_url_series(pd.Series([url])).iloc[0])


# -------------------------------------------------------------- valid (R24)


def is_valid_url_series(urls: pd.Series) -> pd.Series:
    return urls.astype("string").str.match(_VALID_URL_RE, na=False).fillna(False).astype(bool)


def is_valid_url(url: str) -> bool:
    return bool(_VALID_URL_RE.match(url))


# ---------------------------------------------------------------- host (R2)


def url_host_series(urls: pd.Series) -> pd.Series:
    return urls.astype("string").str.extract(_HOST_RE.pattern, expand=False)


def url_host(url: str) -> str | None:
    m = _HOST_RE.match(url)
    return m.group(1) if m else None

"""Hypothesis property tests for the pure-Python cores of the URL and
robots function modules.

These pin invariants (idempotence, scalar/vectorized agreement, fail-open
robustness on arbitrary input) that example-based goldens can't cover:
the vectorized pandas paths run inside Arrow-batched UDFs on the hot path,
so a scalar/series divergence would be a silent engine-vs-oracle split.

No Spark session needed — everything here is pandas/regex, so the suite
runs in milliseconds per example.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from spider_spark.functions.robots import (
    RobotsRules,
    _path_of,
    parse_robots,
)
from spider_spark.functions.urlnorm import (
    UNWANTED_QUERY_PARAMS,
    clean_url,
    clean_url_series,
    is_valid_url,
    is_valid_url_series,
    strip_trailing_slash,
    strip_trailing_slash_series,
    url_host,
    url_host_series,
    wanted_url,
    wanted_url_series,
)

# --------------------------------------------------------------- strategies

_host_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))

hosts = st.lists(_host_label, min_size=1, max_size=3).map(".".join)

_path_seg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._~%-", max_size=10
)

paths = st.lists(_path_seg, max_size=4).map(lambda segs: "/" + "/".join(segs))

_param = st.one_of(
    st.sampled_from(sorted(UNWANTED_QUERY_PARAMS)),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6),
)
_kv = st.tuples(_param, st.text(alphabet="abc123", max_size=5))

queries = st.lists(_kv, max_size=4).map(
    lambda kvs: ("?" + "&".join(f"{k}={v}" for k, v in kvs)) if kvs else ""
)

fragments = st.one_of(
    st.just(""), st.text(alphabet="abc/?&=#", max_size=8).map(lambda s: "#" + s)
)

urls = st.builds(
    lambda h, p, q, f: f"https://{h}{p}{q}{f}", hosts, paths, queries, fragments
)

# arbitrary garbage the functions must survive without raising
wild_text = st.text(max_size=64)


# ------------------------------------------------------------------ urlnorm


@given(urls)
def test_clean_url_idempotent(u):
    once = clean_url(u)
    assert clean_url(once) == once


@given(urls)
def test_clean_url_drops_fragment_and_session(u):
    c = clean_url(u)
    assert "#" not in c
    assert ";jsessionid=" not in c


@given(urls)
def test_clean_url_drops_unwanted_params(u):
    c = clean_url(u)
    qs = c.split("?", 1)[1] if "?" in c else ""
    got = {kv.split("=", 1)[0] for kv in qs.split("&") if kv}
    assert not (got & set(UNWANTED_QUERY_PARAMS)), c


@given(st.lists(wild_text, min_size=1, max_size=8))
def test_clean_series_matches_scalar(batch):
    got = clean_url_series(pd.Series(batch)).tolist()
    want = [clean_url(u) for u in batch]
    assert got == want


@given(st.lists(wild_text, min_size=1, max_size=8))
def test_strip_series_matches_scalar(batch):
    got = strip_trailing_slash_series(pd.Series(batch)).tolist()
    want = [strip_trailing_slash(u) for u in batch]
    assert got == want


@given(wild_text)
def test_strip_removes_exactly_one_slash(u):
    s = strip_trailing_slash(u)
    if u.endswith("/"):
        assert s == u[:-1]
    else:
        assert s == u


@given(st.lists(wild_text, min_size=1, max_size=8))
def test_wanted_and_valid_series_match_scalar(batch):
    s = pd.Series(batch)
    assert wanted_url_series(s).tolist() == [wanted_url(u) for u in batch]
    assert is_valid_url_series(s).tolist() == [is_valid_url(u) for u in batch]


@given(st.lists(wild_text, min_size=1, max_size=8))
def test_host_series_matches_scalar(batch):
    got = url_host_series(pd.Series(batch))
    for g, u in zip(got, batch):
        want = url_host(u)
        assert (want is None and pd.isna(g)) or g == want


@given(urls)
def test_host_is_substring(u):
    h = url_host(u)
    if h is not None:
        assert h in u




# ------------------------------------------------------------------- robots

_directive = st.one_of(
    st.just("User-agent: *"),
    st.just("User-agent: spider"),
    st.builds(lambda p: f"Disallow: {p}", paths),
    st.builds(lambda p: f"Allow: {p}", paths),
    st.builds(lambda d: f"Crawl-delay: {d}", st.integers(0, 60)),
    st.builds(lambda u: f"Sitemap: {u}", urls),
    wild_text,  # junk lines must be skipped, not crash
)

robots_bodies = st.lists(_directive, max_size=12).map("\n".join)


@given(robots_bodies)
def test_parse_robots_never_raises(body):
    rules = parse_robots(body, "spider")
    assert rules.mode in ("rules", "allow_all", "disallow_all")


def test_parse_robots_none_is_allow_all():
    assert parse_robots(None, "spider").is_allowed("https://x.de/a")


@given(robots_bodies, st.lists(urls, min_size=1, max_size=6))
def test_allowed_series_matches_scalar(body, batch):
    rules = parse_robots(body, "spider")
    got = rules.allowed_series(pd.Series(batch)).tolist()
    want = [rules.is_allowed(u) for u in batch]
    assert got == want


@given(st.lists(urls, min_size=1, max_size=4))
def test_no_matching_rule_allows(batch):
    rules = parse_robots("User-agent: *\nDisallow: /zzzznope", "spider")
    for u in batch:
        if not _path_of(u).startswith("/zzzznope"):
            assert rules.is_allowed(u)


@given(urls)
def test_disallow_root_blocks_everything(u):
    rules = parse_robots("User-agent: *\nDisallow: /", "spider")
    assert not rules.is_allowed(u)


@given(urls, paths)
def test_allow_beats_disallow_on_longer_match(u, p):
    # Allow rule strictly longer than the Disallow prefix it refines
    body = f"User-agent: *\nDisallow: /\nAllow: {p}" if len(p) > 1 else None
    if body is None:
        return
    rules = parse_robots(body, "spider")
    path = _path_of(u)
    if path.startswith(p):
        assert rules.is_allowed(u)


_wildcard_directive = st.one_of(
    st.just("User-agent: *"),
    st.builds(lambda p: f"Disallow: {p}", paths),
    st.builds(lambda p: f"Allow: {p}", paths),
)


@settings(max_examples=30)
@given(st.lists(_wildcard_directive, max_size=8).map("\n".join))
def test_specific_ua_group_overrides_wildcard(body):
    # a spider-specific group replaces the wildcard group entirely (REP:
    # most-specific UA group wins), so appending a spider disallow-all makes
    # every url disallowed regardless of the wildcard rules above it.
    # An equal-length spider-specific Allow would win the tie (Allow sorts
    # first), so the strategy only generates wildcard-group bodies.
    combined = body + "\nUser-agent: spider\nDisallow: /"
    rules = parse_robots(combined, "spider")
    assert not rules.is_allowed("https://h.example.com/any/path")

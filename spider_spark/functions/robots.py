"""robots.txt parsing + matching — reference R19/R20.

The reference fetches ``<proto>://<host>/robots.txt`` once per host and
parses it with crawler-commons' SimpleRobotRulesParser
(RobotsTxtInspector.scala:18-32); any fetch/parse failure fails OPEN to
ALLOW_ALL (HostCrawler.scala:77-91). Rules are then consulted at three
places (R20): link extraction (ContentFilter.scala:75), frontier enqueue
(HostCrawler.scala:146) and sitemap intake (HostCrawler.scala:135).

This is an independent implementation of the same public REP semantics
(Google robots.txt spec, which crawler-commons also follows):

  - groups selected by User-agent token; a token matches if it is a
    (lowercased) substring of the crawler's UA product name; ``*`` groups
    apply only when no specific group matched
  - longest-match-wins between Allow/Disallow, Allow wins length ties
  - ``*`` wildcard and ``$`` end-anchor supported in rule paths
  - empty Disallow value = allow-all; no matching rule = allowed
  - ``Sitemap:`` directives collected globally; ``Crawl-delay`` per group

In the engine the robots table is tiny (one row per crawled host) → parsed
once on the driver, broadcast, and applied batch-wise inside pandas UDFs
(`RobotsTable.allowed_batch`), vectorized per rule with compiled regexes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

_URL_SPLIT_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*")


def _path_of(url: str) -> str:
    """path+query of a URL, '/' when empty (what rules match against)."""
    m = _URL_SPLIT_RE.match(url)
    rest = url[m.end() :] if m else url
    rest = rest.split("#", 1)[0]
    return rest if rest.startswith("/") else "/" + rest


def _rule_regex(path_pattern: str) -> re.Pattern:
    anchored = path_pattern.endswith("$")
    if anchored:
        path_pattern = path_pattern[:-1]
    parts = [re.escape(p) for p in path_pattern.split("*")]
    rx = "^" + ".*".join(parts) + ("$" if anchored else "")
    return re.compile(rx)


@dataclass
class RobotsRules:
    """Parsed per-host rules. mode: 'rules' | 'allow_all' | 'disallow_all'."""

    mode: str = "allow_all"
    # (is_allow, pattern_length, compiled_regex, raw_pattern), pre-sorted:
    # longest first, Allow before Disallow on equal length
    rules: list = field(default_factory=list)
    sitemaps: list = field(default_factory=list)
    crawl_delay: float | None = None

    def is_allowed(self, url: str) -> bool:
        if self.mode == "allow_all":
            return True
        if self.mode == "disallow_all":
            return False
        path = _path_of(url)
        for is_allow, _ln, rx, _raw in self.rules:
            if rx.match(path):
                return is_allow
        return True

    def allowed_series(self, urls: pd.Series) -> pd.Series:
        """Vectorized matching: one pass per rule over the whole batch."""
        urls = urls.astype("string")
        # disallow_all FIRST: it is rule-less by construction, so the
        # `not self.rules` shortcut below would otherwise allow everything
        # — the exact opposite of the scalar is_allowed
        if self.mode == "disallow_all":
            return pd.Series(False, index=urls.index)
        if self.mode == "allow_all" or not self.rules:
            return pd.Series(True, index=urls.index)
        paths = urls.str.replace(_URL_SPLIT_RE.pattern, "", regex=True)
        paths = paths.str.replace(r"#.*$", "", regex=True)
        paths = paths.mask(~paths.str.startswith("/"), "/" + paths)
        decided = pd.Series(False, index=urls.index)
        verdict = pd.Series(True, index=urls.index)
        for is_allow, _ln, rx, _raw in self.rules:
            hit = paths.str.match(rx.pattern, na=False).astype(bool) & ~decided
            if hit.any():
                verdict = verdict.mask(hit, is_allow)
                decided |= hit
            if decided.all():
                break
        return verdict


ALLOW_ALL = RobotsRules(mode="allow_all")


def parse_robots(body: str | None, user_agent: str) -> RobotsRules:
    """Parse robots.txt text for the given UA. None/unparseable → ALLOW_ALL
    (fail-open, HostCrawler.scala:77-91)."""
    if body is None:
        return RobotsRules(mode="allow_all")
    ua = user_agent.lower()
    sitemaps: list[str] = []
    # group state
    specific: list[tuple[bool, str]] = []
    wildcard: list[tuple[bool, str]] = []
    specific_delay: float | None = None
    wildcard_delay: float | None = None
    cur_tokens: list[str] = []
    seen_directive_since_ua = True
    # REP group selection keys on whether a specific-UA group MATCHED,
    # not on whether it contributed path rules: a matched group whose
    # only directive is an empty Disallow (= allow everything) must
    # shadow the * group entirely, not fall back to its rules/delay
    specific_matched = False

    def target_lists():
        lists = []
        if any(t != "*" and t in ua for t in cur_tokens):
            lists.append("s")
        if "*" in cur_tokens:
            lists.append("w")
        return lists

    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_directive_since_ua:
                cur_tokens = []
                seen_directive_since_ua = False
            tok = val.lower()
            cur_tokens.append(tok)
            if tok != "*" and tok in ua:
                specific_matched = True
        elif key in ("allow", "disallow"):
            seen_directive_since_ua = True
            for t in target_lists():
                lst = specific if t == "s" else wildcard
                if key == "disallow" and val == "":
                    continue  # empty disallow = allow everything
                if val:
                    lst.append((key == "allow", val))
        elif key == "crawl-delay":
            seen_directive_since_ua = True
            try:
                d = float(val)
            except ValueError:
                continue
            for t in target_lists():
                if t == "s":
                    specific_delay = d
                else:
                    wildcard_delay = d
        elif key == "sitemap":
            seen_directive_since_ua = True
            if val:
                sitemaps.append(val)

    chosen = specific if specific_matched else wildcard
    delay = specific_delay if specific_matched else wildcard_delay
    rules = sorted(
        (
            (is_allow, len(pat), _rule_regex(pat), pat)
            for is_allow, pat in chosen
        ),
        key=lambda r: (-r[1], not r[0]),
    )
    return RobotsRules(
        mode="rules" if rules else "allow_all",
        rules=rules,
        sitemaps=sitemaps,
        crawl_delay=delay,
    )


# ---------------------------------------------------------------- rules table
#
# Scale path: at a 10^10-URL frontier the web has O(10^6+) hosts, so the
# robots dimension can never be parsed on (or fully collected to) the
# driver. The parse runs as a Spark job (``parse_rules_rows`` inside
# mapInPandas) into a *rules table* of pre-compiled-rule rows — only hosts
# whose rules actually RESTRICT anything (non-allow-all mode, declared
# sitemaps, or a Crawl-delay) need a row; every absent host fails open to
# ALLOW_ALL exactly as the reference does for unfetchable robots.txt
# (HostCrawler.scala:77-91). Per crawl round the engine semi-joins this
# table to the round's active hosts and broadcasts only that slice into
# the gate/extraction UDFs (the same pattern as its hyld/herr sidecars).

RULES_ROW_SCHEMA = (
    "host string, mode string, "
    "rules array<struct<allow:boolean,pattern:string>>, "
    "sitemaps array<string>, crawl_delay double"
)
_RULES_COLS = ["host", "mode", "rules", "sitemaps", "crawl_delay"]


def rules_to_row(host: str, rr: RobotsRules) -> dict:
    """Serialize parsed rules to a rules-table row. Rule order (longest
    first, Allow wins ties) is preserved positionally in the array."""
    return {
        "host": host,
        "mode": rr.mode,
        "rules": [
            {"allow": bool(a), "pattern": pat} for a, _ln, _rx, pat in rr.rules
        ],
        "sitemaps": list(rr.sitemaps),
        "crawl_delay": rr.crawl_delay,
    }


def rules_from_row(mode, pairs, sitemaps, crawl_delay) -> RobotsRules:
    """Rebuild RobotsRules from a rules-table row (regexes recompiled;
    the stored order IS the match order — no re-sort)."""
    return RobotsRules(
        mode=mode,
        rules=[
            (bool(p["allow"]), len(p["pattern"]), _rule_regex(p["pattern"]), p["pattern"])
            for p in (pairs or [])
        ],
        sitemaps=list(sitemaps or []),
        crawl_delay=crawl_delay,
    )


def make_parse_rules_udf(user_agent: str):
    """mapInPandas generator: (host, body) batches → RULES_ROW_SCHEMA rows.
    The parse itself (parse_robots) is identical to the driver-side path —
    one implementation, two deployment shapes."""

    def parse_rules_rows(batches):
        for pdf in batches:
            rows = [
                # Arrow→pandas renders string nulls as NaN: normalize to
                # None so the fail-open branch of parse_robots applies
                rules_to_row(
                    h, parse_robots(b if isinstance(b, str) else None, user_agent)
                )
                for h, b in zip(pdf["host"], pdf["body"])
            ]
            yield pd.DataFrame(rows, columns=_RULES_COLS)

    return parse_rules_rows


class RobotsTable:
    """host → RobotsRules map; absent host = ALLOW_ALL (fail-open).

    A broadcast-sized dict shipped to executors inside pandas-UDF
    closures. At scale this is never the FULL robots dimension — the
    engine builds one per active-host slice of the distributed rules
    table (``from_rule_rows``); small crawls broadcast one global table."""

    def __init__(self, host_rules: dict[str, RobotsRules]):
        self.host_rules = host_rules

    @staticmethod
    def from_rows(rows, user_agent: str) -> "RobotsTable":
        """rows: iterable of (host, body)."""
        return RobotsTable(
            {host: parse_robots(body, user_agent) for host, body in rows}
        )

    @staticmethod
    def from_rule_rows(rows) -> "RobotsTable":
        """rows: iterable of RULES_ROW_SCHEMA rows (Row or dict)."""
        return RobotsTable(
            {
                r["host"]: rules_from_row(
                    r["mode"], r["rules"], r["sitemaps"], r["crawl_delay"]
                )
                for r in rows
            }
        )

    def rules_for(self, host: str) -> RobotsRules:
        return self.host_rules.get(host, ALLOW_ALL)

    def is_allowed(self, host: str, url: str) -> bool:
        return self.rules_for(host).is_allowed(url)

    def allowed_batch(self, urls: pd.Series, hosts: pd.Series) -> pd.Series:
        """Vectorized: group the batch by rules-host, one vectorized pass
        per (host, rule). ``hosts`` selects WHICH host's rules apply (for
        extraction that's the fetched page's host — ContentFilter.scala:75)."""
        out = pd.Series(True, index=urls.index)
        if not self.host_rules:
            return out
        hosts = hosts.astype("string")
        for host, grp_idx in hosts.groupby(hosts).groups.items():
            rules = self.rules_for(str(host))
            if rules.mode == "allow_all":
                continue
            out.loc[grp_idx] = rules.allowed_series(urls.loc[grp_idx])
        return out

    def sitemaps_for(self, host: str) -> list[str]:
        return self.rules_for(host).sitemaps

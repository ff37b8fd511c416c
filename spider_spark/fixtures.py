"""Deterministic synthetic-web fixtures (FIXTURES.md schemas).

Builds the four input tables the engine crawls *instead of* the live web
(the reference's HTTP surface — SiteScraper.scala:78-86 — becomes a batch
lookup join against ``documents``):

  documents(doc_id, spans:array<struct<kind,text,media_ref,offset>>,
            host, status, content_type, headers)
  sources(source_id, name, url)
  robots(host, body)
  sitemaps(sitemap_url, kind, urls)

Everything is seeded and pure-Python (small scale); ``write_web`` persists
to parquet for the Spark engine, ``Web`` is consumed directly by the
oracle simulator. ``synth_web`` scales to arbitrary page counts for
benchmarks.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)


@dataclass
class Doc:
    spans: list  # list[dict(kind,text,media_ref,offset)]
    status: int = 200
    content_type: str = "text/html"
    headers: dict = field(default_factory=dict)


@dataclass
class Web:
    documents: dict  # url -> Doc
    sources: list  # [(source_id, name, url)]
    robots: dict = field(default_factory=dict)  # host -> body
    sitemaps: dict = field(default_factory=dict)  # sitemap_url -> (kind, [urls])


def text_span(text: str, offset: int) -> dict:
    return {"kind": "text", "text": text, "media_ref": None, "offset": offset}


def media_span(ref: str, offset: int) -> dict:
    return {"kind": "media", "text": None, "media_ref": ref, "offset": offset}


def page_doc(
    links: list[str],
    canonical: str | None = None,
    hreflang: list[str] | None = None,
    body_canonicals: list[str] | None = None,
    media: list[str] | None = None,
    status: int = 200,
    content_type: str = "text/html",
    headers: dict | None = None,
    filler: str = "",
) -> Doc:
    """Build an interleaved text+media span page embedding link markup the
    way the reference fixtures do (ContentFilterSpec.scala:35-56)."""
    spans = []
    off = 0
    head = "<html>\n<head>\n"
    if canonical:
        head += f'    <link rel="canonical" href="{canonical}">\n'
    for h in hreflang or []:
        head += f'    <link rel="alternate" hreflang="en" href="{h}">\n'
    head += "</head>\n<body>\n"
    spans.append(text_span(head, off))
    off += 1
    for i, link in enumerate(links):
        spans.append(text_span(f'  <a href="{link}">link {i}</a>\n', off))
        off += 1
        if media and i < len(media):
            spans.append(media_span(media[i], off))
            off += 1
    for c in body_canonicals or []:
        spans.append(text_span(f'  <link rel="canonical" href="{c}">\n', off))
        off += 1
    if filler:
        spans.append(text_span(filler, off))
        off += 1
    spans.append(text_span("</body>\n</html>\n", off))
    return Doc(
        spans=spans,
        status=status,
        content_type=content_type,
        headers=headers or {},
    )


# --------------------------------------------------------------- demo webs


def demo_web() -> Web:
    """Small hand-built two-host web exercising every behavior class from
    FIXTURES.md §7 — the engine-vs-oracle integration fixture."""
    h1, h2, h3 = "www.example1.com", "www.example2.com", "www.other.org"
    u = lambda h, p: f"https://{h}/{p}"

    documents = {
        # seed of h1 (doc_id is the slash-stripped form the scheduler uses)
        f"https://{h1}": page_doc(
            links=[
                u(h1, "a.html"),
                u(h1, "a.html"),  # in-page duplicate
                u(h1, "b.html?nn=7#frag"),  # needs cleaning
                u(h2, "x.html"),  # cross-host, in namespace
                u(h3, "n.html"),  # out of namespace -> dropped
                u(h1, "private/p.html"),  # robots-disallowed
                u(h1, "warenkorb/add"),  # unwanted
                u(h1, "missing.html"),  # transient error -> retry
                u(h1, "gone.html"),  # 404
                u(h1, "noidx.html"),  # X-Robots-Tag
                u(h1, "doc.pdf"),  # non-html
                u(h1, "dir/"),  # trailing slash -> dir
            ],
            media=["img://logo.png"],
        ),
        u(h1, "a.html"): page_doc(
            links=[u(h1, "b.html")],
            canonical=u(h1, "a-canonical.html"),
        ),
        u(h1, "b.html"): page_doc(links=[f"https://{h1}"]),  # back-link (seen)
        u(h1, "missing.html"): Doc(spans=[], status=-1),  # IO error both tries
        u(h1, "gone.html"): page_doc(links=[u(h1, "never.html")], status=404),
        u(h1, "noidx.html"): page_doc(
            links=[u(h1, "never2.html")],
            headers={"X-RoBoTs-TaG": "NOINDEX, nofollow"},
        ),
        u(h1, "doc.pdf"): Doc(
            spans=[media_span("pdf://doc", 0)], content_type="application/pdf"
        ),
        u(h1, "dir"): page_doc(links=[]),
        u(h1, "sm1.html"): page_doc(links=[u(h1, "sm2.html")]),
        u(h1, "sm2.html"): page_doc(links=[]),
        # h2
        f"https://{h2}": page_doc(links=[u(h2, "x.html"), u(h2, "y.html")]),
        u(h2, "x.html"): page_doc(links=[u(h2, "y.html")]),
        u(h2, "y.html"): page_doc(
            links=[u(h1, "a.html")]  # cross-host back, already seen by then
        ),
    }
    sources = [
        ("1", "example1", f"https://{h1}/"),
        ("2", "example2", f"https://{h2}/"),
    ]
    robots = {
        h1: (
            "User-agent: *\n"
            "Disallow: /private/\n"
            f"Sitemap: https://{h1}/sitemap_news.xml\n"
        ),
        # h2 has no robots row -> fail-open ALLOW_ALL
    }
    sitemaps = {
        f"https://{h1}/sitemap.xml": ("index", [f"https://{h1}/sitemap_sub.xml"]),
        f"https://{h1}/sitemap_sub.xml": ("urlset", [u(h1, "sm1.html")]),
        f"https://{h1}/sitemap_news.xml": ("urlset", [u(h1, "sm2.html")]),
        # h2 has no sitemap.xml -> probe fails silently
    }
    return Web(documents, sources, robots, sitemaps)


def synth_web(
    n_hosts: int = 4,
    pages_per_host: int = 200,
    links_per_page: int = 8,
    cross_host_frac: float = 0.1,
    error_frac: float = 0.02,
    notfound_frac: float = 0.02,
    media_frac: float = 0.3,
    seed: int = 42,
    filler_chars: int = 200,
    sitemap_frac: float = 0.0,
) -> Web:
    """Seeded scale-parameterizable web. Link graph: page i links to ~U
    pages of the same host (skewed toward low ids so the graph is
    connected from the seed) + occasional cross-host links. Host 0 gets
    2x pages (mild skew)."""
    rng = random.Random(seed)
    hosts = [f"host{i}.example.com" for i in range(n_hosts)]
    npages = {
        h: pages_per_host * (2 if i == 0 else 1) for i, h in enumerate(hosts)
    }
    url_of = lambda h, i: f"https://{h}/p{i}.html" if i else f"https://{h}"
    documents: dict[str, Doc] = {}
    for hi, h in enumerate(hosts):
        n = npages[h]
        for i in range(n):
            url = url_of(h, i)
            r = rng.random()
            if i > 0 and r < error_frac:
                documents[url] = Doc(spans=[], status=-1)
                continue
            if i > 0 and r < error_frac + notfound_frac:
                documents[url] = page_doc(links=[], status=404)
                continue
            links = []
            for _ in range(links_per_page):
                if rng.random() < cross_host_frac and n_hosts > 1:
                    h2 = hosts[(hi + 1 + rng.randrange(n_hosts - 1)) % n_hosts]
                    links.append(url_of(h2, rng.randrange(npages[h2])))
                else:
                    # skew target ids low so BFS from page 0 reaches most
                    j = min(int(rng.random() ** 2 * n), n - 1)
                    links.append(url_of(h, j))
            media = (
                [f"img://{h}/{i}/{k}" for k in range(2)]
                if rng.random() < media_frac
                else None
            )
            filler = "x" * filler_chars
            documents[url] = page_doc(links=links, media=media, filler=filler)
    sources = [(str(i + 1), h, f"https://{h}/") for i, h in enumerate(hosts)]
    robots = {
        hosts[0]: "User-agent: *\nDisallow: /p13.html\nDisallow: /p17*\n",
    }
    sitemaps = {
        f"https://{hosts[0]}/sitemap.xml": (
            "urlset",
            [url_of(hosts[0], i) for i in range(1, 6)],
        ),
    }
    if sitemap_frac > 0:
        # sitemap-driven seeding (fresh RNG so the page/link stream above is
        # unchanged for a given seed): each host publishes a urlset listing
        # sitemap_frac of its pages -> round 1 starts wide, like a real
        # sitemap-aware crawl (SitemapInspector queues these before the seed)
        smrng = random.Random(seed + 1)
        for hi, h in enumerate(hosts):
            listed = [
                url_of(h, i)
                for i in range(1, npages[h])
                if smrng.random() < sitemap_frac
            ]
            sitemaps[f"https://{h}/sitemap.xml"] = ("urlset", listed)
    return Web(documents, sources, robots, sitemaps)


def sitemap_heavy_web(
    n_hosts: int = 8,
    fanout: int = 6,
    depth: int = 2,
    urls_per_leaf: int = 1000,
    seed: int = 42,
) -> Web:
    """Sitemap-INDEX-heavy web: each host publishes a ``depth``-level
    sitemap index tree (root index → fanout sub-indexes → … → fanout
    urlsets of ``urls_per_leaf`` URLs each), so the round-0 seed frontier
    is ``n_hosts × fanout^depth × urls_per_leaf`` URLs — the workload
    SitemapInspector.scala:47-49 recurses through driver-side and the
    R21 distributed expansion (operators/expand.py) exists for. Only the
    seed page exists as a document; this web seeds, it doesn't crawl."""
    documents: dict[str, Doc] = {}
    sources = []
    robots: dict[str, str] = {}
    sitemaps: dict[str, tuple] = {}
    for hi in range(n_hosts):
        h = f"smhost{hi}.example.com"
        documents[f"https://{h}"] = page_doc(links=[])
        sources.append((str(hi + 1), h, f"https://{h}/"))
        # real rules so seeding exercises the robots gate (leaf 0 blocked)
        robots[h] = "User-agent: *\nDisallow: /page_0_\n"
        # level 0 = root index; levels 1..depth-1 = sub-indexes;
        # level depth = urlsets
        level_nodes = [[f"https://{h}/sitemap.xml"]]
        for lvl in range(1, depth + 1):
            nodes = [
                f"https://{h}/sm_{lvl}_{i}.xml"
                for i in range(fanout ** lvl)
            ]
            level_nodes.append(nodes)
            for pi, parent in enumerate(level_nodes[lvl - 1]):
                kids = nodes[pi * fanout : (pi + 1) * fanout]
                sitemaps[parent] = ("index", kids)
        for li, leaf in enumerate(level_nodes[depth]):
            sitemaps[leaf] = (
                "urlset",
                [
                    f"https://{h}/page_{li}_{j}.html"
                    for j in range(urls_per_leaf)
                ],
            )
    return Web(documents, sources, robots, sitemaps)


# ------------------------------------------------------------- parquet IO


def web_to_tables(web: Web) -> dict[str, pa.Table]:
    from spider_spark.functions.urlnorm import url_host

    doc_rows = {
        "doc_id": [],
        "spans": [],
        "host": [],
        "status": [],
        "content_type": [],
        "headers": [],
    }
    for url, d in web.documents.items():
        doc_rows["doc_id"].append(url)
        doc_rows["spans"].append(d.spans)
        doc_rows["host"].append(url_host(url) or "")
        doc_rows["status"].append(d.status)
        doc_rows["content_type"].append(d.content_type)
        doc_rows["headers"].append(d.headers)
    documents = pa.table(
        {
            "doc_id": pa.array(doc_rows["doc_id"], pa.string()),
            "spans": pa.array(doc_rows["spans"], SPAN_TYPE),
            "host": pa.array(doc_rows["host"], pa.string()),
            "status": pa.array(doc_rows["status"], pa.int32()),
            "content_type": pa.array(doc_rows["content_type"], pa.string()),
            "headers": pa.array(
                doc_rows["headers"], pa.map_(pa.string(), pa.string())
            ),
        }
    )
    sources = pa.table(
        {
            "source_id": pa.array([s[0] for s in web.sources], pa.string()),
            "name": pa.array([s[1] for s in web.sources], pa.string()),
            "url": pa.array([s[2] for s in web.sources], pa.string()),
        }
    )
    robots = pa.table(
        {
            "host": pa.array(list(web.robots.keys()), pa.string()),
            "body": pa.array(list(web.robots.values()), pa.string()),
        }
    )
    sitemaps = pa.table(
        {
            "sitemap_url": pa.array(list(web.sitemaps.keys()), pa.string()),
            "kind": pa.array([v[0] for v in web.sitemaps.values()], pa.string()),
            "urls": pa.array(
                [v[1] for v in web.sitemaps.values()], pa.list_(pa.string())
            ),
        }
    )
    return {
        "documents": documents,
        "sources": sources,
        "robots": robots,
        "sitemaps": sitemaps,
    }


def write_web(web: Web, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for name, table in web_to_tables(web).items():
        # small row groups: a parquet row group is Spark's minimum split
        # granularity, so one giant group would serialize the documents scan
        pq.write_table(
            table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=4096
        )
    return out_dir

"""WARC source/sink: record codec round-trips (plain + gzip-member),
byte-exact random access, corrupt-payload degradation + resync, the SURT
urlkey contract, Spark read/write round-trips over the deterministic
fixture, and full Spark≡DuckDB equality for the CDX index the driver
gate replays.

Reference scope note: the reference crawler persists captures directly
into its own store (SiteScraper.scala fetch → Supervisor index); WARC is
the interchange boundary a lake-scale crawl adds on top."""

from __future__ import annotations

import hashlib
import time
import zlib

import duckdb
import pytest

from spider_spark.sources import warc


def _resp(url="http://a.example/x", date="2023-11-14T22:13:20Z",
          status=200, body=b"hello"):
    return warc.response_record(url, date, status, "OK", "text/html", body)


# ---------------------------------------------------------------- codec


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip(gz):
    recs = [warc.warcinfo_record("2023-01-01T00:00:00Z"),
            _resp(body=b"hello world"), _resp(url="http://b.example/",
                                              status=404, body=b"")]
    out = warc.parse_warc_bytes(warc.encode_warc(recs, gz))
    assert [r["warc_type"] for r in out] == ["warcinfo", "response",
                                             "response"]
    assert all(r["err"] is None for r in out)
    assert out[1]["body"] == b"hello world"
    assert out[1]["http_status"] == 200
    assert out[1]["mime"] == "text/html"
    assert out[1]["url"] == "http://a.example/x"
    assert out[2]["http_status"] == 404
    assert out[2]["body"] == b""


@pytest.mark.parametrize("gz", [True, False])
def test_random_access_spans(gz):
    """payload[offset:offset+length] is a complete single record — the
    property CDX replay depends on."""
    recs = [_resp(body=bytes([65 + i]) * (10 + i)) for i in range(5)]
    blob = warc.encode_warc(recs, gz)
    out = warc.parse_warc_bytes(blob)
    assert [r["rec_idx"] for r in out] == list(range(5))
    # spans tile the blob exactly
    assert out[0]["offset"] == 0
    for a, b in zip(out, out[1:]):
        assert a["offset"] + a["length"] == b["offset"]
    assert out[-1]["offset"] + out[-1]["length"] == len(blob)
    for i, r in enumerate(out):
        seg = blob[r["offset"]:r["offset"] + r["length"]]
        raw = zlib.decompress(seg, 16 + zlib.MAX_WBITS) if gz else seg
        one = warc.parse_warc_bytes(raw)
        assert len(one) == 1 and one[0]["body"] == bytes([65 + i]) * (10 + i)


def test_corrupt_member_resyncs():
    blob = warc.encode_warc([_resp(body=b"first"), _resp(body=b"second")])
    first_len = warc.parse_warc_bytes(blob)[0]["length"]
    bad = blob[:10] + b"XX" + blob[12:]
    out = warc.parse_warc_bytes(bad)
    assert out[0]["err"] is not None
    assert out[0]["length"] == first_len  # resynced on the next magic
    assert out[1]["err"] is None and out[1]["body"] == b"second"


def test_corrupt_plain_stream_degrades_once():
    blob = warc.encode_warc([_resp(body=b"first"), _resp(body=b"second")],
                            gzip_members=False)
    out = warc.parse_warc_bytes(b"GARBAGE " + blob)
    assert len(out) == 1 and out[0]["err"] is not None


def test_hostile_payloads():
    # truncated member
    blob = warc.encode_warc([_resp()])[: 20]
    out = warc.parse_warc_bytes(blob)
    assert len(out) == 1 and out[0]["err"] is not None
    # truncated block in a plain record
    raw = warc.encode_record("response", {"WARC-Target-URI": "u"}, b"abc")
    cut = raw[: raw.rfind(b"abc") + 1]
    out = warc.parse_warc_bytes(cut)
    assert out[0]["err"] is not None and "truncated" in out[0]["err"]
    # empty blob
    assert warc.parse_warc_bytes(b"") == []


def test_deterministic_encoding():
    assert warc.encode_warc([_resp()]) == warc.encode_warc([_resp()])


# ----------------------------------------------------------------- SURT


@pytest.mark.parametrize("url,key", [
    ("http://www.Example.com:80/a?b=2&a=1#f", "com,example)/a?a=1&b=2"),
    ("https://sub.host.org:8443/p", "org,host,sub:8443)/p"),
    ("http://example.com", "com,example)/"),
    ("http://EXAMPLE.com/Path/Is/CaseSensitive",
     "com,example)/Path/Is/CaseSensitive"),
    ("https://example.com:443/x", "com,example)/x"),
    ("http://h.example/x?", "example,h)/x"),
    (None, None),
    ("", None),
])
def test_surt_key(url, key):
    assert warc.surt_key(url) == key


# ---------------------------------------------------------------- spark


def test_spark_fixture_parse_matches_closed_form(spark):
    ids = spark.range(0, 40).selectExpr("id as event_id")
    rows = warc.read_warc_records(warc.synth_warc(ids)).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.ref, []).append(r)
    assert len(by_ref) == 40
    for i in range(40):
        recs = sorted(by_ref[f"warc://{i}"], key=lambda r: r.rec_idx)
        p = warc.warc_params(i)
        assert [r.warc_type for r in recs] == (
            ["warcinfo"] + ["response"] * p["n_responses"])
        for j, r in enumerate(recs[1:]):
            assert r.err is None
            assert r.url == f"http://{p['host']}/p/{i}/{j}"
            assert r.http_status == warc._fix_status(i, j)
            assert bytes(r.body) == warc._fix_body(i, j)
            assert r.warc_date == warc._fix_date(i, j)


def test_spark_write_read_roundtrip(spark):
    docs = spark.range(0, 30).selectExpr(
        "concat('http://h', id % 3, '.example/d/', id) as url",
        "'2024-02-02T02:02:02Z' as warc_date",
        "case when id % 7 = 0 then 404 else 200 end as http_status",
        "'text/plain' as mime",
        "cast(concat('body-', id) as binary) as body",
    ).repartition(3)
    blobs = warc.write_warc(docs, gzip_members=True)
    back = warc.read_warc_records(
        blobs.selectExpr("cast(n_records as string) as ref",
                         "warc as payload"),
        payload_col="payload",
    )
    got = back.where("warc_type = 'response'").selectExpr(
        "url", "http_status", "cast(body as string) as body"
    ).collect()
    assert len(got) == 30
    exp = {(f"http://h{i % 3}.example/d/{i}",
            404 if i % 7 == 0 else 200, f"body-{i}") for i in range(30)}
    assert {(r.url, r.http_status, r.body) for r in got} == exp
    # warcinfo framing: one per partition blob
    n_info = back.where("warc_type = 'warcinfo'").count()
    assert n_info == blobs.count()


def test_to_documents_shape_and_gates(spark):
    ids = spark.range(0, 25).selectExpr("id as event_id")
    docs = warc.to_documents(warc.synth_warc(ids)).collect()
    # only 200s survive (404s gated), all text/html with bodies
    exp_n = sum(
        1 for i in range(25)
        for j in range(warc.warc_params(i)["n_responses"])
        if warc._fix_status(i, j) == 200
    )
    assert len(docs) == exp_n
    for r in docs:
        assert r.http_status == 200 and r.mime == "text/html"
        assert r.doc_id.endswith("@" + r.fetched_ts14)
        assert r.doc_id.startswith("org,example,w")
        assert r.text.startswith("doc ")


def test_streaming_warc_ingest_equals_batch(spark, tmp_path):
    """read_warc_records/to_documents are plain transformations — the
    same operator over a file-source stream (AvailableNow) must emit
    exactly the batch rows."""
    from spider_spark.streaming.ingest import run_available_now

    ids = spark.range(0, 20).selectExpr("id as event_id")
    src = str(tmp_path / "warcblobs")
    warc.synth_warc(ids).write.parquet(src)
    batch = sorted(
        (r.doc_id, r.text)
        for r in warc.to_documents(spark.read.parquet(src)).collect()
    )
    stream_in = spark.readStream.schema(
        "ref string, payload binary"
    ).option("maxFilesPerTrigger", "2").parquet(src)
    run_available_now(
        warc.to_documents(stream_in), "warc_docs_stream",
        str(tmp_path / "ckpt"),
    )
    got = sorted(
        (r.doc_id, r.text)
        for r in spark.sql("select * from warc_docs_stream").collect()
    )
    assert got == batch and len(got) > 0


def test_crawl_to_warc_roundtrip(spark):
    """A crawled web exported as WARC replays byte-for-byte: every
    indexed url appears once, bodies equal the span-reconstructed
    markup, capture dates derive from the round."""
    from spider_spark import fixtures
    from spider_spark.functions.extract import spans_to_html

    web = fixtures.demo_web()
    tables = fixtures.web_to_tables(web)
    docs = spark.createDataFrame(tables["documents"].to_pandas())
    urls = docs.selectExpr(
        "doc_id as url", "cast(doc_id like '%/a%' as int) as round"
    )
    blobs = warc.crawl_to_warc(urls, docs, epoch0=1700000000)
    back = warc.read_warc_records(
        blobs.selectExpr("'x' as ref", "warc as payload")
    ).where("warc_type = 'response'").collect()
    exp = {
        d["doc_id"]: spans_to_html(d["spans"])
        for d in tables["documents"].to_pylist()
    }
    assert {r.url for r in back} == set(exp)
    assert len(back) == len(exp)
    for r in back:
        assert bytes(r.body).decode() == exp[r.url]
        rnd = 1 if "/a" in r.url else 0
        assert r.warc_date == time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime(1700000000 + rnd * 60)
        )


def test_cdx_index_spark_vs_duckdb(spark):
    """Full engine-vs-oracle equality on the CDX rows (the driver-gate
    query's local twin): DuckDB reconstructs urlkey/ts14/digest from the
    closed forms while Spark walks real gzip members."""
    n = 60
    ids = spark.range(0, n).selectExpr("id as event_id")
    got = sorted(
        warc.cdx_index(warc.synth_warc(ids))
        .selectExpr("urlkey", "ts14", "url", "mime", "http_status",
                    "digest")
        .collect()
    )
    con = duckdb.connect()
    exp = sorted(con.execute(f"""
        WITH ev AS (SELECT unnest(generate_series(0, {n - 1})) AS id),
        g AS (
            SELECT id, j FROM ev
            JOIN (SELECT unnest(generate_series(0, 2)) AS j) s
              ON s.j < 1 + id % 3
        )
        SELECT 'org,example,w' || (id % 7) || ')/p/' || id || '/' || j
                 AS urlkey,
               strftime(epoch_ms((1700000000 + id * 60 + j) * 1000),
                        '%Y%m%d%H%M%S') AS ts14,
               'http://w' || (id % 7) || '.example.org/p/' || id || '/'
                 || j AS url,
               'text/html' AS mime,
               CASE WHEN (id + j) % 5 = 0 THEN 404 ELSE 200 END
                 AS http_status,
               sha256(repeat('doc ' || id || ' ' || j || ' ',
                             3 + (id + j) % 7)) AS digest
        FROM g
    """).fetchall())
    assert [tuple(r) for r in got] == exp
    # and the digest really is the body hash
    i, j = 5, 1
    assert (hashlib.sha256(warc._fix_body(i, j)).hexdigest()
            == [r.digest for r in got
                if r.url == f"http://w5.example.org/p/5/1"][0])


# -------------------------------------------------------------- WET/WAT


def test_wet_roundtrip_and_gate(spark):
    ids = spark.range(0, 40).selectExpr("id as event_id")
    wet_rows = warc.to_wet(warc.synth_warc_html(ids))
    got = {r.url: r for r in wet_rows.collect()}
    # conversion gate: 404s (id%5==0) dropped
    assert len(got) == sum(1 for i in range(40) if i % 5 != 0)
    for i in range(40):
        if i % 5 == 0:
            continue
        u = f"http://w{i % 7}.example.org/p/{i}"
        toks = [f"t {i}", f"doc {i} text"] + [
            f"l{k}" for k in range(1 + i % 4)
        ]
        assert got[u].text == " ".join(toks)
        assert got[u].refers_to.startswith("<urn:uuid:")
    # sink → reader round-trip: conversion records surface text as body
    blobs = warc.write_wet(wet_rows)
    back = warc.read_warc_records(
        blobs.selectExpr("'b' as ref", "wet as payload")
    ).where("warc_type = 'conversion'")
    back_rows = back.selectExpr(
        "url", "cast(body as string) as text", "refers_to", "mime"
    ).collect()
    assert len(back_rows) == len(got)
    for r in back_rows:
        assert r.text == got[r.url].text
        assert r.refers_to == got[r.url].refers_to
        assert r.mime == "text/plain"


def test_wat_fields_and_roundtrip(spark):
    ids = spark.range(0, 30).selectExpr("id as event_id")
    wat = warc.to_wat(warc.synth_warc_html(ids))
    got = {r.url: r for r in wat.collect()}
    assert len(got) == 30  # WAT covers 404 captures too
    for i in range(30):
        u = f"http://w{i % 7}.example.org/p/{i}"
        r = got[u]
        assert r.title == f"t {i}"
        assert r.n_links == 1 + i % 4
        assert list(r.links) == [
            f"http://w{(i + k) % 7}.example.org/p/{i}/{k}"
            for k in range(1 + i % 4)
        ]
        assert r.http_status == (404 if i % 5 == 0 else 200)
        assert r.body_len == len(warc._fix_html_body(i))
    # metadata-record sink round-trip: JSON envelope parses back
    import json as _json

    blobs = warc.write_wat(wat)
    back = warc.read_warc_records(
        blobs.selectExpr("'b' as ref", "wat as payload")
    ).where("warc_type = 'metadata'")
    for r in back.selectExpr(
        "url", "cast(body as string) as env", "mime"
    ).collect():
        assert r.mime == "application/json"
        env = _json.loads(r.env)
        i = int(r.url.rsplit("/", 1)[1])
        pm = env["Payload-Metadata"]
        assert pm["Title"] == f"t {i}"
        assert len(pm["Links"]) == 1 + i % 4
        assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == r.url


def test_wet_wat_deterministic(spark):
    ids = spark.range(0, 12).selectExpr("id as event_id")
    a = warc.synth_warc_html(ids).orderBy("ref").collect()
    b = warc.synth_warc_html(ids).orderBy("ref").collect()
    assert [bytes(r.payload) for r in a] == [bytes(r.payload) for r in b]


def test_streaming_wet_equals_batch(spark, tmp_path):
    """to_wet is a plain transformation too — the WET derivation over a
    file-source stream (AvailableNow) must emit exactly the batch rows
    (the shape a continuous crawl uses to ship WET alongside WARC)."""
    from spider_spark.streaming.ingest import run_available_now

    ids = spark.range(0, 25).selectExpr("id as event_id")
    src = str(tmp_path / "warchtml")
    warc.synth_warc_html(ids).write.parquet(src)
    batch = sorted(
        (r.url, r.text)
        for r in warc.to_wet(spark.read.parquet(src)).collect()
    )
    stream_in = spark.readStream.schema(
        "ref string, payload binary"
    ).option("maxFilesPerTrigger", "3").parquet(src)
    run_available_now(
        warc.to_wet(stream_in), "wet_stream", str(tmp_path / "ckpt")
    )
    got = sorted(
        (r.url, r.text)
        for r in spark.sql("select * from wet_stream").collect()
    )
    assert got == batch and len(got) > 0


def test_crawl_to_wet_equals_warc_derived_wet(spark):
    """The direct crawl→WET path must equal to_wet over the crawl's own
    WARC export, row for row — including refers_to, which pins the JVM
    _record_id_col as the exact twin of the writer's _record_id."""
    from spider_spark import fixtures

    web = fixtures.demo_web()
    tables = fixtures.web_to_tables(web)
    docs = spark.createDataFrame(tables["documents"].to_pandas())
    urls = docs.selectExpr(
        "doc_id as url", "cast(doc_id like '%/a%' as int) as round"
    )
    # direct path: spans → markup → tag-strip → conversion records
    direct = warc.crawl_to_wet(urls, docs, epoch0=1700000000)
    d_rows = warc.read_warc_records(
        direct.selectExpr("'d' as ref", "wet as payload")
    ).where("warc_type = 'conversion'")
    d = sorted(
        (r.url, r.warc_date, r.refers_to, bytes(r.body).decode())
        for r in d_rows.collect()
    )
    # round-trip path: crawl → WARC blobs → to_wet → conversion records
    blobs = warc.crawl_to_warc(urls, docs, epoch0=1700000000)
    wet2 = warc.write_wet(
        warc.to_wet(blobs.selectExpr("'x' as ref", "warc as payload"))
    )
    w_rows = warc.read_warc_records(
        wet2.selectExpr("'w' as ref", "wet as payload")
    ).where("warc_type = 'conversion'")
    w = sorted(
        (r.url, r.warc_date, r.refers_to, bytes(r.body).decode())
        for r in w_rows.collect()
    )
    assert d == w and len(d) > 0


def test_crawl_to_wat_equals_warc_derived_wat(spark):
    """The direct crawl→WAT path must equal to_wat over the crawl's
    WARC export — same envelopes (title, links, lengths, status),
    same refers_to record ids."""
    import json as _json

    from spider_spark import fixtures

    web = fixtures.demo_web()
    tables = fixtures.web_to_tables(web)
    docs = spark.createDataFrame(tables["documents"].to_pandas())
    urls = docs.selectExpr(
        "doc_id as url", "cast(doc_id like '%/a%' as int) as round"
    )

    def envelopes(blob_df, col):
        recs = warc.read_warc_records(
            blob_df.selectExpr("'x' as ref", f"{col} as payload")
        ).where("warc_type = 'metadata'")
        out = []
        for r in recs.collect():
            env = _json.loads(bytes(r.body).decode())
            out.append(
                (r.url, r.warc_date, r.refers_to,
                 _json.dumps(env, sort_keys=True))
            )
        return sorted(out)

    direct = envelopes(
        warc.crawl_to_wat(urls, docs, epoch0=1700000000), "wat"
    )
    blobs = warc.crawl_to_warc(urls, docs, epoch0=1700000000)
    derived = envelopes(
        warc.write_wat(
            warc.to_wat(blobs.selectExpr("'x' as ref", "warc as payload"))
        ),
        "wat",
    )
    assert direct == derived and len(direct) > 0


def test_streaming_wat_equals_batch(spark, tmp_path):
    """to_wat over a file-source stream equals batch (plain
    transformation, like to_wet/to_documents)."""
    from spider_spark.streaming.ingest import run_available_now

    ids = spark.range(0, 20).selectExpr("id as event_id")
    src = str(tmp_path / "warchtml2")
    warc.synth_warc_html(ids).write.parquet(src)
    batch = sorted(
        (r.url, r.title, r.n_links)
        for r in warc.to_wat(spark.read.parquet(src)).collect()
    )
    stream_in = spark.readStream.schema(
        "ref string, payload binary"
    ).option("maxFilesPerTrigger", "3").parquet(src)
    run_available_now(
        warc.to_wat(stream_in), "wat_stream", str(tmp_path / "ckpt")
    )
    got = sorted(
        (r.url, r.title, r.n_links)
        for r in spark.sql("select * from wat_stream").collect()
    )
    assert got == batch and len(got) > 0


def test_wet_to_documents_matches_warc_derived_corpus(spark):
    """A corpus ingested from WET alone must carry the same capture
    identities and extracted text as the WET derivation itself — and
    its text must equal wet_text over the WARC-derived documents."""
    ids = spark.range(0, 30).selectExpr("id as event_id")
    blobs = warc.synth_warc_html(ids)
    wet_rows = warc.to_wet(blobs)
    wet_blobs = warc.write_wet(wet_rows)
    docs = {
        r.doc_id: r
        for r in warc.wet_to_documents(
            wet_blobs.selectExpr("'w' as ref", "wet as payload")
        ).collect()
    }
    exp = {r.url: r.text for r in wet_rows.collect()}
    assert len(docs) == len(exp) > 0
    for d in docs.values():
        assert d.text == exp[d.url]
        assert d.doc_id.endswith("@" + d.fetched_ts14)
        assert d.doc_id.startswith("org,example,w")

"""WARC (ISO 28500) web-archive source/sink + CDX indexing.

The reference crawler persists fetched pages straight into its own store
(SiteScraper.scala fetch path feeding the Supervisor's index); a
production crawl at lake scale instead interchanges captures as WARC —
the Common-Crawl/Wayback container every downstream training-data
pipeline ingests. This module is that boundary for the Spark engine:

* ``encode_record`` / ``encode_warc`` — build WARC/1.0 records and whole
  files (optionally as the standard per-record-gzip-member ``.warc.gz``
  layout, which is what makes single-record random access possible).
* ``parse_warc_bytes`` — pure-Python record walker: per-gzip-member (or
  plain-stream) splitting, WARC header parse, HTTP response-block parse
  (status / headers / body). Corrupt members degrade to ``err`` rows and
  the walker re-syncs on the next gzip magic — one bad capture never
  fails a 100-TB scan task.
* ``read_warc_records`` — the Arrow-batched ``mapInPandas`` scan stage:
  (ref, payload) → one row per record with byte-exact (offset, length)
  so ``payload[offset:offset+length]`` is a self-contained record — the
  property CDX random access depends on (pinned in tests).
* ``cdx_index`` — the (urlkey, ts14, url, mime, status, digest, ...)
  capture index: SURT url key in Python (pinned contract below), sha-256
  body digest computed JVM-side (``F.sha2``) so the only Python work is
  the parse itself.
* ``write_warc`` — documents → WARC blobs, one blob per Arrow batch
  (embarrassingly parallel; no shuffle), round-trippable through the
  reader.

Scale shape: both directions are single ``mapInPandas`` scan stages over
an already-partitioned payload table — zero shuffles; the CDX digest and
any downstream grouping stay JVM-side. At 10^10 captures the cost is the
decompression itself, which is exactly the cost any WARC consumer pays.

SURT contract (pinned in tests/test_warc.py): lowercase scheme+host,
strip one leading ``www.``, reverse host labels comma-joined, ``)/`` +
path, ``?`` + ampersand-joined SORTED query params; fragments dropped;
default ports dropped. This is the classic pywb/OpenWayback key shape.
"""

from __future__ import annotations

import hashlib
import time
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b\x08"

# ---------------------------------------------------------------- writer


def _record_id(url: str, date: str) -> str:
    """Deterministic urn:uuid record id (md5 of url+date folded into the
    uuid shape) — reproducible runs produce byte-identical archives."""
    h = hashlib.md5(f"{url} {date}".encode()).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def encode_record(
    warc_type: str, headers: dict[str, str], block: bytes
) -> bytes:
    """One plain WARC/1.0 record: version line, headers (Content-Length
    computed here), blank line, block, two CRLFs."""
    out = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
    for k, v in headers.items():
        out.append(f"{k}: {v}".encode())
    out.append(f"Content-Length: {len(block)}".encode())
    head = _CRLF.join(out) + _CRLF + _CRLF
    return head + block + _CRLF + _CRLF


def http_response_block(
    status: int, reason: str, mime: str, body: bytes
) -> bytes:
    """An application/http;msgtype=response block."""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {mime}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def response_record(
    url: str, date: str, status: int, reason: str, mime: str, body: bytes
) -> bytes:
    return encode_record(
        "response",
        {
            "WARC-Record-ID": _record_id(url, date),
            "WARC-Date": date,
            "WARC-Target-URI": url,
            "Content-Type": "application/http;msgtype=response",
        },
        http_response_block(status, reason, mime, body),
    )


def warcinfo_record(date: str, software: str = "spider-spark/1.0") -> bytes:
    return encode_record(
        "warcinfo",
        {
            "WARC-Record-ID": _record_id("warcinfo", date),
            "WARC-Date": date,
            "Content-Type": "application/warc-fields",
        },
        f"software: {software}\r\n".encode(),
    )


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime=0, no name) — standard
    .warc.gz stores each record as its own member."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def encode_warc(records: list[bytes], gzip_members: bool = True) -> bytes:
    if gzip_members:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


# ---------------------------------------------------------------- reader


def _parse_one(raw: bytes) -> dict:
    """Parse ONE plain record's bytes → field dict (raises ValueError on
    malformed input; callers convert to err rows)."""
    sep = raw.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("no header terminator")
    head = raw[:sep].decode("latin-1")
    lines = head.split("\r\n")
    if not lines[0].startswith("WARC/"):
        raise ValueError(f"bad version line {lines[0][:20]!r}")
    hdrs: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        hdrs[k.strip().lower()] = v.strip()
    try:
        clen = int(hdrs["content-length"])
    except (KeyError, ValueError):
        raise ValueError("missing/bad Content-Length") from None
    block = raw[sep + 4 : sep + 4 + clen]
    if len(block) < clen:
        raise ValueError("truncated block")
    rec = {
        "warc_type": hdrs.get("warc-type"),
        "url": hdrs.get("warc-target-uri"),
        "warc_date": hdrs.get("warc-date"),
        "record_id": hdrs.get("warc-record-id"),
        "block_len": clen,
        "http_status": None,
        "mime": hdrs.get("content-type"),
        "body": None,
        "consumed": sep + 4 + clen,
    }
    ctype = (hdrs.get("content-type") or "").lower()
    if ctype.startswith("application/http") and block[:5] == b"HTTP/":
        hsep = block.find(_CRLF + _CRLF)
        if hsep < 0:
            raise ValueError("http block missing header terminator")
        hlines = block[:hsep].decode("latin-1").split("\r\n")
        parts = hlines[0].split(" ", 2)
        try:
            rec["http_status"] = int(parts[1])
        except (IndexError, ValueError):
            raise ValueError("bad http status line") from None
        for ln in hlines[1:]:
            k, _, v = ln.partition(":")
            if k.strip().lower() == "content-type":
                rec["mime"] = v.strip()
        rec["body"] = block[hsep + 4 :]
    elif rec["warc_type"] in ("conversion", "metadata"):
        # WET/WAT records carry their payload directly as the block
        # (text/plain extract, application/json envelope) — surface it
        # so the readers round-trip; refers_to links back to the capture
        rec["body"] = block
        rec["refers_to"] = hdrs.get("warc-refers-to")
    return rec


def parse_warc_bytes(blob: bytes) -> list[dict]:
    """Walk a WARC blob (plain or per-record gzip members) → one dict per
    record with byte-exact ``offset``/``length`` into ``blob``. A corrupt
    gzip member or record yields an ``err`` dict and the walk re-syncs on
    the next gzip magic; a corrupt PLAIN stream cannot be re-synced (no
    framing left) so the remainder degrades to one err row."""
    out: list[dict] = []
    off, n, idx = 0, len(blob), 0
    gz = blob[:3] == _GZ_MAGIC
    while off < n:
        if gz:
            do = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                raw = do.decompress(blob[off:])
                if not do.eof:
                    raise zlib.error("truncated member")
                consumed = (n - off) - len(do.unused_data)
                rec = _parse_one(raw)
            except (zlib.error, ValueError) as e:
                nxt = blob.find(_GZ_MAGIC, off + 1)
                length = (nxt if nxt > 0 else n) - off
                out.append(
                    {"rec_idx": idx, "offset": off, "length": length,
                     "err": f"{type(e).__name__}: {e}"}
                )
                off += length
                idx += 1
                continue
            rec.update(rec_idx=idx, offset=off, length=consumed, err=None)
            del rec["consumed"]
            out.append(rec)
            off += consumed
        else:
            try:
                rec = _parse_one(blob[off:])
            except ValueError as e:
                out.append(
                    {"rec_idx": idx, "offset": off, "length": n - off,
                     "err": f"ValueError: {e}"}
                )
                break
            consumed = rec.pop("consumed")
            # trailing record boundary: two CRLFs (tolerate EOF without)
            tail = blob[off + consumed : off + consumed + 4]
            consumed += 4 if tail == _CRLF + _CRLF else len(tail)
            rec.update(rec_idx=idx, offset=off, length=consumed, err=None)
            out.append(rec)
            off += consumed
        idx += 1
    return out


WARC_RECORD_SCHEMA = (
    "ref string, rec_idx int, offset bigint, length bigint, "
    "warc_type string, url string, warc_date string, record_id string, "
    "refers_to string, http_status int, mime string, block_len bigint, "
    "body binary, err string"
)

_REC_COLS = [
    "ref", "rec_idx", "offset", "length", "warc_type", "url",
    "warc_date", "record_id", "refers_to", "http_status", "mime",
    "block_len", "body", "err",
]


def read_warc_records(
    df: DataFrame, payload_col: str = "payload", ref_col: str = "ref"
) -> DataFrame:
    """(ref, payload=WARC blob) → one row per record. One scan stage,
    zero shuffles; err rows instead of task failures."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                if payload is None:
                    rows.append({"ref": ref, "rec_idx": 0,
                                 "err": "null payload"})
                    continue
                for rec in parse_warc_bytes(bytes(payload)):
                    rec["ref"] = ref
                    rows.append(rec)
            out = pd.DataFrame(rows)
            for c in _REC_COLS:
                if c not in out.columns:
                    out[c] = None
            yield out[_REC_COLS]

    return df.select(ref_col, payload_col).mapInPandas(
        gen, schema=WARC_RECORD_SCHEMA
    )


# ------------------------------------------------------------------ CDX


def surt_key(url: str) -> str | None:
    """SURT url key (contract pinned in the module docstring)."""
    if not url:
        return None
    u = url.strip()
    low = u.lower()
    for scheme in ("https://", "http://"):
        if low.startswith(scheme):
            u = u[len(scheme):]
            break
    u, _, _ = u.partition("#")
    hostport, sep, pathq = u.partition("/")
    pathq = sep + pathq if sep else "/"
    host, _, port = hostport.partition(":")
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split(".")))
    if port and port not in ("80", "443"):
        rev = f"{rev}:{port}"
    path, qsep, query = pathq.partition("?")
    key = rev + ")" + path
    if qsep and query:
        key += "?" + "&".join(sorted(query.split("&")))
    return key


def cdx_index(
    df: DataFrame, payload_col: str = "payload", ref_col: str = "ref"
) -> DataFrame:
    """(ref, payload) → CDX capture index rows
    (urlkey, ts14, url, mime, http_status, digest, offset, length, ref).

    ts14 is WARC-Date digits; digest is the sha-256 hex of the HTTP body
    computed JVM-side. offset/length are the byte-exact gzip-member (or
    plain-record) spans from the reader, so
    ``payload[offset:offset+length]`` replays the capture."""
    recs = read_warc_records(df, payload_col, ref_col)
    urlk = F.pandas_udf(
        lambda s: s.map(surt_key), "string"
    )
    return (
        recs.where(F.col("err").isNull()
                   & (F.col("warc_type") == "response"))
        .select(
            urlk(F.col("url")).alias("urlkey"),
            F.regexp_replace("warc_date", r"[^0-9]", "")
            .substr(1, 14).alias("ts14"),
            "url",
            "mime",
            "http_status",
            F.sha2(F.col("body"), 256).alias("digest"),
            "offset",
            "length",
            "ref",
        )
    )


# ------------------------------------------------------------------ sink


def write_warc(
    df: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    status_col: str = "http_status",
    mime_col: str = "mime",
    body_col: str = "body",
    gzip_members: bool = True,
    with_warcinfo: bool = True,
) -> DataFrame:
    """Documents → (warc binary, n_records int), ONE blob per Arrow
    batch — the embarrassingly-parallel export shape (partition count =
    file count; no shuffle). Round-trips through read_warc_records."""
    cols = [url_col, date_col, status_col, mime_col, body_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            recs = []
            if with_warcinfo:
                recs.append(warcinfo_record(str(pdf[date_col].iloc[0])))
            for url, date, status, mime, body in zip(
                *(pdf[c] for c in cols)
            ):
                body_b = bytes(body) if body is not None else b""
                reason = "OK" if int(status) == 200 else "X"
                recs.append(
                    response_record(
                        str(url), str(date), int(status), reason,
                        str(mime), body_b,
                    )
                )
            blob = encode_warc(recs, gzip_members)
            yield pd.DataFrame(
                {"warc": [blob], "n_records": [len(recs)]}
            )

    return df.select(*cols).mapInPandas(
        gen, schema="warc binary, n_records int"
    )


def to_documents(
    df: DataFrame, payload_col: str = "payload", ref_col: str = "ref"
) -> DataFrame:
    """WARC blobs → the documents-table shape the text pipeline eats:
    (doc_id, url, fetched_ts14, http_status, mime, text). doc_id is the
    capture identity ``urlkey@ts14`` (re-crawls of one URL stay distinct
    docs — the Wayback capture key). Only OK html/text responses with a
    body survive; everything else is the archive's concern, not the
    corpus's. Plain transformation — works on batch AND streaming
    inputs (the streaming-ness comes from the reader, like
    streaming/ingest.py's operators)."""
    recs = read_warc_records(df, payload_col, ref_col)
    urlk = F.pandas_udf(lambda s: s.map(surt_key), "string")
    ts14 = (
        F.regexp_replace("warc_date", r"[^0-9]", "").substr(1, 14)
    )
    return (
        recs.where(
            F.col("err").isNull()
            & (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("body").isNotNull()
            & F.col("mime").startswith("text/")
        )
        .select(
            F.concat(urlk(F.col("url")), F.lit("@"), ts14).alias("doc_id"),
            "url",
            ts14.alias("fetched_ts14"),
            "http_status",
            "mime",
            F.col("body").cast("string").alias("text"),
        )
    )


def crawl_to_warc(
    urls: DataFrame,
    documents: DataFrame,
    epoch0: int = 1700000000,
    round_seconds: int = 60,
    gzip_members: bool = True,
) -> DataFrame:
    """A finished crawl's index → WARC capture blobs: the archive export
    a production crawl ships alongside its parquet sinks (the reference
    stores pages directly — SiteScraper.scala fetch → Supervisor index —
    so this is the interchange layer on top).

    ``urls`` is the engine's urls sink shape (url, ..., round);
    ``documents`` the crawled web table (doc_id, spans, status,
    content_type). Page markup is reconstructed JVM-side from the span
    array (engine.html_from_spans — text spans in offset order), the
    capture date derives deterministically from the crawl round, and the
    whole export is the join plus one no-shuffle write_warc stage. Every
    indexed capture is exported — including the 404s the crawl recorded;
    an archive documents what was fetched, not what was kept."""
    from spider_spark.engine import html_from_spans

    docs = (
        urls.select("url", "round")
        .join(documents, urls["url"] == documents["doc_id"])
        .select(
            "url",
            F.date_format(
                F.timestamp_seconds(
                    F.lit(epoch0) + F.col("round") * round_seconds
                ),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ).alias("warc_date"),
            F.coalesce(F.col("status"), F.lit(200)).alias("http_status"),
            F.coalesce(F.col("content_type"), F.lit("text/html")).alias(
                "mime"
            ),
            html_from_spans("spans").cast("binary").alias("body"),
        )
    )
    return write_warc(docs, gzip_members=gzip_members)


# --------------------------------------------------------------- WET/WAT
#
# The two derived archives every Common-Crawl-style corpus ships next to
# its WARCs: WET (extracted plain text as WARC *conversion* records —
# what most LLM corpora actually ingest) and WAT (per-capture metadata
# JSON as WARC *metadata* records: title, outlinks, lengths). Both
# derivations are pure JVM column expressions (regexp tag-strip /
# regexp_extract_all link scan) over the parsed record table, so the
# only Python in the path is the WARC walk itself; the sinks are the
# same one-blob-per-Arrow-batch no-shuffle shape as write_warc.


def wet_text(col) -> "F.Column":
    """Extracted plain text of an HTML body column: drop tags, collapse
    whitespace, trim — the classic WET conversion. Pure JVM expression
    (replicated verbatim by the DuckDB oracle)."""
    s = F.regexp_replace(col.cast("string"), "<[^>]*>", " ")
    return F.trim(F.regexp_replace(s, "\\s+", " "))


def to_wet(
    df: DataFrame, payload_col: str = "payload", ref_col: str = "ref"
) -> DataFrame:
    """WARC blobs → WET rows (ref, url, warc_date, refers_to, text): one
    per OK text/html capture, text = tag-stripped body. The conversion
    gate matches Common Crawl's: only 200 HTML responses convert."""
    recs = read_warc_records(df, payload_col, ref_col)
    return (
        recs.where(
            F.col("err").isNull()
            & (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("body").isNotNull()
            & F.col("mime").startswith("text/html")
        )
        .select(
            "ref",
            "url",
            "warc_date",
            F.col("record_id").alias("refers_to"),
            wet_text(F.col("body")).alias("text"),
        )
    )


def conversion_record(
    url: str, date: str, refers_to: str, text: bytes
) -> bytes:
    """One WET conversion record pointing back at its capture."""
    return encode_record(
        "conversion",
        {
            "WARC-Record-ID": _record_id("conversion:" + url, date),
            "WARC-Refers-To": refers_to,
            "WARC-Date": date,
            "WARC-Target-URI": url,
            "Content-Type": "text/plain",
        },
        text,
    )


def metadata_record(
    url: str, date: str, refers_to: str, envelope_json: bytes
) -> bytes:
    """One WAT metadata record whose block is the JSON envelope."""
    return encode_record(
        "metadata",
        {
            "WARC-Record-ID": _record_id("metadata:" + url, date),
            "WARC-Refers-To": refers_to,
            "WARC-Date": date,
            "WARC-Target-URI": url,
            "Content-Type": "application/json",
        },
        envelope_json,
    )


def write_wet(
    df: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    refers_col: str = "refers_to",
    text_col: str = "text",
    gzip_members: bool = True,
) -> DataFrame:
    """WET rows (to_wet's shape) → (wet binary, n_records int), one blob
    per Arrow batch — no shuffle; round-trips through
    read_warc_records (conversion records surface their block as
    ``body``)."""
    cols = [url_col, date_col, refers_col, text_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            recs = [
                conversion_record(
                    str(u), str(d), str(r), str(t).encode()
                )
                for u, d, r, t in zip(*(pdf[c] for c in cols))
            ]
            yield pd.DataFrame(
                {"wet": [encode_warc(recs, gzip_members)],
                 "n_records": [len(recs)]}
            )

    return df.select(*cols).mapInPandas(
        gen, schema="wet binary, n_records int"
    )


def to_wat(
    df: DataFrame, payload_col: str = "payload", ref_col: str = "ref"
) -> DataFrame:
    """WARC blobs → WAT rows, one per parsed response capture:
    (ref, rec_idx, url, warc_date, refers_to=record_id, http_status,
    mime, body_len, title, links array, n_links). Title and outlinks
    come from JVM regexp expressions over the body (regexp_extract /
    regexp_extract_all) — no Python beyond the record walk."""
    recs = read_warc_records(df, payload_col, ref_col)
    body_s = F.col("body").cast("string")
    links = F.regexp_extract_all(body_s, F.lit('href="([^"]+)"'), 1)
    return (
        recs.where(
            F.col("err").isNull() & (F.col("warc_type") == "response")
        )
        .select(
            "ref",
            F.col("rec_idx").cast("int").alias("rec_idx"),
            "url",
            "warc_date",
            F.col("record_id").alias("refers_to"),
            "http_status",
            "mime",
            F.length("body").cast("bigint").alias("body_len"),
            F.regexp_extract(
                body_s, "<title>([^<]*)</title>", 1
            ).alias("title"),
            links.alias("links"),
            F.size(links).cast("int").alias("n_links"),
        )
    )


def write_wat(
    df: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    refers_col: str = "refers_to",
    gzip_members: bool = True,
) -> DataFrame:
    """WAT rows (to_wat's shape) → (wat binary, n_records int). The JSON
    envelope is built JVM-side (``F.to_json`` over a struct mirroring
    the WAT Envelope essentials); the sink only frames records."""
    env = F.to_json(
        F.struct(
            F.struct(
                F.col(url_col).alias("WARC-Target-URI"),
                F.col(date_col).alias("WARC-Date"),
            ).alias("WARC-Header-Metadata"),
            F.struct(
                F.col("http_status").alias("Response-Status"),
                F.col("mime").alias("Content-Type"),
                F.col("body_len").alias("Entity-Length"),
                F.col("title").alias("Title"),
                F.col("links").alias("Links"),
            ).alias("Payload-Metadata"),
        )
    )
    slim = df.select(
        url_col, date_col, refers_col, env.alias("envelope")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            recs = [
                metadata_record(str(u), str(d), str(r), str(e).encode())
                for u, d, r, e in zip(
                    pdf[url_col], pdf[date_col], pdf[refers_col],
                    pdf["envelope"],
                )
            ]
            yield pd.DataFrame(
                {"wat": [encode_warc(recs, gzip_members)],
                 "n_records": [len(recs)]}
            )

    return slim.mapInPandas(gen, schema="wat binary, n_records int")


def _record_id_col(url_col, date_col) -> "F.Column":
    """JVM twin of :func:`_record_id` (md5 of 'url date' folded into the
    urn:uuid shape) — lets WET/WAT rows point at the record ids the
    WARC export will write, without any Python."""
    h = F.md5(F.concat(url_col, F.lit(" "), date_col))
    return F.concat(
        F.lit("<urn:uuid:"),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"),
        F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12), F.lit(">"),
    )


def wet_to_documents(
    df: DataFrame, payload_col: str = "payload", ref_col: str = "ref"
) -> DataFrame:
    """WET blobs → the documents-table shape (doc_id, url,
    fetched_ts14, text) — the ingestion twin of ``to_documents`` for
    pipelines that receive WET instead of full WARC (most public-corpus
    consumers do: Common Crawl's WET is ~1/10 the bytes of its WARC).
    Same capture identity ``urlkey@ts14``; plain transformation, so it
    runs unchanged over batch and streaming inputs."""
    recs = read_warc_records(df, payload_col, ref_col)
    urlk = F.pandas_udf(lambda s: s.map(surt_key), "string")
    ts14 = F.regexp_replace("warc_date", r"[^0-9]", "").substr(1, 14)
    return (
        recs.where(
            F.col("err").isNull()
            & (F.col("warc_type") == "conversion")
            & F.col("body").isNotNull()
        )
        .select(
            F.concat(urlk(F.col("url")), F.lit("@"), ts14).alias(
                "doc_id"
            ),
            "url",
            ts14.alias("fetched_ts14"),
            F.col("body").cast("string").alias("text"),
        )
    )


def crawl_to_wet(
    urls: DataFrame,
    documents: DataFrame,
    epoch0: int = 1700000000,
    round_seconds: int = 60,
    gzip_members: bool = True,
) -> DataFrame:
    """The crawl's WET export, derived DIRECTLY from the span store —
    no WARC round trip: page markup reconstructs JVM-side
    (engine.html_from_spans), the text is the same wet_text tag-strip
    the WARC-derived path uses, and refers_to carries the record id the
    corresponding crawl_to_warc capture gets (``_record_id_col`` is the
    JVM twin of the writer's ``_record_id``), so the two exports
    cross-link without ever materializing each other. OK html captures
    only — the WET conversion gate."""
    from spider_spark.engine import html_from_spans

    date = F.date_format(
        F.timestamp_seconds(
            F.lit(epoch0) + F.col("round") * round_seconds
        ),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    ).alias("warc_date")
    rows = (
        urls.select("url", "round")
        .join(documents, urls["url"] == documents["doc_id"])
        .where(
            (F.coalesce(F.col("status"), F.lit(200)) == 200)
            & (
                F.coalesce(F.col("content_type"), F.lit("text/html"))
                .startswith("text/html")
            )
        )
        .select(
            "url",
            date,
            html_from_spans("spans").alias("_html"),
        )
        .select(
            "url",
            "warc_date",
            _record_id_col(F.col("url"), F.col("warc_date")).alias(
                "refers_to"
            ),
            wet_text(F.col("_html")).alias("text"),
        )
    )
    return write_wet(rows, gzip_members=gzip_members)


def crawl_to_wat(
    urls: DataFrame,
    documents: DataFrame,
    epoch0: int = 1700000000,
    round_seconds: int = 60,
    gzip_members: bool = True,
) -> DataFrame:
    """The crawl's WAT export, derived directly from the span store
    (crawl_to_wet's sibling): title/outlinks/lengths come from the same
    JVM regexps to_wat uses, over the span-reconstructed markup; every
    indexed capture is covered (including the 404s — WAT documents the
    archive, not the corpus). Pinned row-identical to to_wat over the
    crawl's own WARC export."""
    from spider_spark.engine import html_from_spans

    date = F.date_format(
        F.timestamp_seconds(
            F.lit(epoch0) + F.col("round") * round_seconds
        ),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    ).alias("warc_date")
    html = F.coalesce(html_from_spans("spans"), F.lit(""))
    links = F.regexp_extract_all(html, F.lit('href="([^"]+)"'), 1)
    rows = (
        urls.select("url", "round")
        .join(documents, urls["url"] == documents["doc_id"])
        .select(
            "url",
            date,
            F.coalesce(F.col("status"), F.lit(200)).alias("http_status"),
            F.coalesce(F.col("content_type"), F.lit("text/html")).alias(
                "mime"
            ),
            F.length(html.cast("binary")).cast("bigint").alias(
                "body_len"
            ),
            F.regexp_extract(html, "<title>([^<]*)</title>", 1).alias(
                "title"
            ),
            links.alias("links"),
            F.size(links).cast("int").alias("n_links"),
        )
        .withColumn(
            "refers_to",
            _record_id_col(F.col("url"), F.col("warc_date")),
        )
    )
    return write_wat(rows, gzip_members=gzip_members)


# -------------------------------------------------------------- fixture


_EPOCH0 = 1700000000


def warc_params(i: int) -> dict:
    """Closed-form fixture parameters for id ``i`` (mirrored in the
    driver oracle's SQL — see __spark_entry__.oracle_sql)."""
    return {"n_responses": 1 + i % 3, "host": f"w{i % 7}.example.org"}


def _fix_date(i: int, j: int) -> str:
    return time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime(_EPOCH0 + i * 60 + j)
    )


def _fix_body(i: int, j: int) -> bytes:
    return (f"doc {i} {j} " * (3 + (i + j) % 7)).encode()


def _fix_status(i: int, j: int) -> int:
    return 404 if (i + j) % 5 == 0 else 200


def synth_warc(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """(id) → (ref='warc://id', payload=.warc.gz): a warcinfo record then
    ``1 + id%3`` response records whose url/date/status/body are all
    closed-form in (id, j) — DuckDB rebuilds every parsed column (and the
    sha-256 digest, from the body string it reconstructs itself) while
    Spark walks real gzip members and HTTP blocks."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, blobs = [], []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                p = warc_params(i)
                recs = [warcinfo_record(_fix_date(i, 0))]
                for j in range(p["n_responses"]):
                    st = _fix_status(i, j)
                    recs.append(
                        response_record(
                            f"http://{p['host']}/p/{i}/{j}",
                            _fix_date(i, j),
                            st,
                            "OK" if st == 200 else "Not Found",
                            "text/html",
                            _fix_body(i, j),
                        )
                    )
                refs.append(f"warc://{i}")
                blobs.append(encode_warc(recs, gzip_members=True))
            yield pd.DataFrame({"ref": refs, "payload": blobs})

    # spread ids across full parallelism: a small parquet id table plans
    # 1-2 splits, serializing the gzip/encode Python onto 2 cores (the
    # media_fixtures._ids rationale; values are closed-form per id)
    ids = df.select(id_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    return ids.mapInPandas(gen, schema="ref string, payload binary")


def _fix_html_body(i: int) -> bytes:
    """Closed-form HTML page for id ``i``: a title, a text paragraph and
    ``1 + i%4`` anchors — every WET/WAT-derived field (extracted text,
    title, outlink list, lengths) is SQL-reconstructable from ``i``."""
    links = " ".join(
        f'<a href="http://w{(i + k) % 7}.example.org/p/{i}/{k}">l{k}</a>'
        for k in range(1 + i % 4)
    )
    return (
        f"<html><head><title>t {i}</title></head>"
        f"<body><p>doc {i} text</p> {links}</body></html>"
    ).encode()


def synth_warc_html(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """(id) → (ref='warch://id', payload=.warc.gz): a warcinfo record
    plus ONE text/html response whose body is ``_fix_html_body(id)``
    (status 404 when ``id%5==0`` — exercising the WET conversion gate),
    date ``_fix_date(id, 0)``, url ``http://w{id%7}.example.org/p/id``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, blobs = [], []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                st = 404 if i % 5 == 0 else 200
                recs = [
                    warcinfo_record(_fix_date(i, 0)),
                    response_record(
                        f"http://w{i % 7}.example.org/p/{i}",
                        _fix_date(i, 0),
                        st,
                        "OK" if st == 200 else "Not Found",
                        "text/html",
                        _fix_html_body(i),
                    ),
                ]
                refs.append(f"warch://{i}")
                blobs.append(encode_warc(recs, gzip_members=True))
            yield pd.DataFrame({"ref": refs, "payload": blobs})

    ids = df.select(id_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    return ids.mapInPandas(gen, schema="ref string, payload binary")

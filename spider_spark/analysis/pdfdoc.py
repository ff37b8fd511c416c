"""PDF text extraction — container-level, no PDF library.

The web's second-biggest text format after HTML; a crawl corpus that
can't read PDFs leaves a measurable slice of its training text on the
floor. Same scope rule as the MP3/MP4 parsers (codecs.parse_mp3/
parse_mp4): the CONTAINER layer is parsed for real — header, xref
table, object graph, page tree, content streams (FlateDecode via
zlib) and the text-showing operators — while font programs, glyph
metrics and layout reconstruction stay out of scope (a renderer's
concern, not a corpus extractor's).

Why xref matters at scale: the cross-reference table gives byte-exact
random access to every object, so reading page 7 of a 10,000-page PDF
is a handful of seeks, not a scan — the same seek-not-scan property
the MP4 stbl tables and WARC CDX spans provide. ``page_text`` uses it
directly; ``parse_pdf`` walks the page TREE order (not object order),
which is the document's true reading order.

Extraction contract (pinned in tests/test_pdfdoc.py):
  - pages come from /Root → /Pages → /Kids, in Kids order;
  - each page's text is its content stream's text-showing operators in
    stream order: ``(s) Tj`` contributes ``s``; ``[(a) k (b)] TJ``
    contributes the concatenation of its string parts (kerning numbers
    ignored); operators are joined with ``\\n``;
  - string escapes ``\\\\ \\( \\) \\n \\r \\t`` are decoded;
  - /FlateDecode streams are inflated; unknown filters, bad xref
    offsets or malformed structure raise ValueError — the Spark
    wrapper degrades those to ``err`` rows, never failing a scan task.

The Spark path is one Arrow-batched ``mapInPandas`` projection (one
row per page), no shuffle — the cost profile any PDF consumer pays.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ------------------------------------------------------------- encoder


def _esc(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    )


def _content_stream(ops: list[tuple[str, ...]]) -> bytes:
    """ops: ('Tj', s) → one Tj op; ('TJ', a, b, ...) → one TJ array op
    with -250 kerns between parts."""
    lines = ["BT", "/F1 12 Tf", "72 720 Td"]
    for op in ops:
        if op[0] == "Tj":
            lines.append(f"({_esc(op[1])}) Tj")
        else:
            parts = " -250 ".join(f"({_esc(p)})" for p in op[1:])
            lines.append(f"[{parts}] TJ")
        lines.append("0 -14 Td")
    lines.append("ET")
    return "\n".join(lines).encode("latin-1")


def encode_pdf(
    pages: list[list[tuple[str, ...]]], compress_page=lambda j: False
) -> bytes:
    """A complete deterministic PDF 1.4: catalog, page tree, one content
    stream per page (optionally FlateDecode'd), Helvetica font object,
    a correct xref table and trailer. ``pages[j]`` is the op list for
    page ``j`` (see _content_stream)."""
    n = len(pages)
    font_num = 3 + 2 * n
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + 2 * j} 0 R" for j in range(n))
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    for j, ops in enumerate(pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {4 + 2 * j} 0 R /Resources << /Font "
                f"<< /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        raw = _content_stream(ops)
        if compress_page(j):
            data = zlib.compress(raw, 6)
            head = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>"
            ).encode()
        else:
            data, head = raw, f"<< /Length {len(raw)} >>".encode()
        objs.append(head + b"\nstream\n" + data + b"\nendstream")
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free-list head
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# -------------------------------------------------------------- parser


_STR = re.compile(rb"\((?:\\.|[^\\()])*\)")
_TJ_OP = re.compile(
    rb"(\((?:\\.|[^\\()])*\)\s*Tj)|(\[[^\]]*\]\s*TJ)", re.S
)
_ESCAPES = {
    b"\\\\": b"\\", b"\\(": b"(", b"\\)": b")",
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t",
}


def _unesc(raw: bytes) -> str:
    out = re.sub(
        rb"\\[\\()nrt]", lambda m: _ESCAPES[m.group(0)], raw
    )
    return out.decode("latin-1")


def _stream_text(stream: bytes) -> str:
    """Text-showing ops of ONE decoded content stream, '\\n'-joined."""
    parts: list[str] = []
    for m in _TJ_OP.finditer(stream):
        if m.group(1) is not None:  # (s) Tj
            s = _STR.search(m.group(1)).group(0)
            parts.append(_unesc(s[1:-1]))
        else:  # [(a) k (b)] TJ — concat string parts
            parts.append(
                "".join(
                    _unesc(s[1:-1]) for s in _STR.findall(m.group(2))
                )
            )
    return "\n".join(parts)


def _xref_offsets(data: bytes) -> dict[int, int]:
    """object number → byte offset, from the xref table the trailer's
    startxref points at (the random-access map)."""
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", data[-256:])
    if not m:
        raise ValueError("no startxref")
    at = int(m.group(1))
    if not data[at : at + 4] == b"xref":
        raise ValueError("startxref does not point at an xref table")
    table: dict[int, int] = {}
    pos = at + 4
    while True:
        mh = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", data[pos : pos + 64])
        if not mh:
            break
        start, cnt = int(mh.group(1)), int(mh.group(2))
        pos += mh.end()
        for k in range(cnt):
            ent = data[pos : pos + 20]
            if len(ent) < 18:
                raise ValueError("truncated xref entry")
            if ent[17:18] == b"n":
                table[start + k] = int(ent[:10])
            pos += 20
    if not table:
        raise ValueError("empty xref")
    return table


def _obj_at(data: bytes, off: int, num: int) -> bytes:
    m = re.match(rb"(\d+)\s+\d+\s+obj\b", data[off : off + 32])
    if not m or int(m.group(1)) != num:
        raise ValueError(f"xref offset for obj {num} is wrong")
    end = data.find(b"endobj", off)
    if end < 0:
        raise ValueError(f"obj {num} has no endobj")
    return data[off + m.end() : end]


def _ref(body: bytes, key: bytes) -> int:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
    if not m:
        raise ValueError(f"missing /{key.decode()} reference")
    return int(m.group(1))


def _content_of(data: bytes, xref: dict[int, int], num: int) -> str:
    body = _obj_at(data, xref[num], num)
    ms = re.search(rb"stream\r?\n", body)
    if not ms:
        raise ValueError(f"obj {num} is not a stream")
    ml = re.search(rb"/Length\s+(\d+)", body)
    if not ml:
        raise ValueError(f"stream obj {num} has no /Length")
    raw = body[ms.end() : ms.end() + int(ml.group(1))]
    if re.search(rb"/Filter\s*/FlateDecode", body):
        try:
            raw = zlib.decompress(raw)
        except zlib.error as e:
            raise ValueError(f"bad FlateDecode stream: {e}") from None
    elif re.search(rb"/Filter", body):
        raise ValueError("unsupported stream filter")
    return _stream_text(raw)


def _kids(data: bytes, xref: dict[int, int]) -> list[int]:
    root_num = _trailer_root(data)
    root = _obj_at(data, xref[root_num], root_num)
    pages_num = _ref(root, b"Pages")
    pages = _obj_at(data, xref[pages_num], pages_num)
    mk = re.search(rb"/Kids\s*\[([^\]]*)\]", pages)
    if not mk:
        raise ValueError("page tree has no /Kids")
    return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", mk.group(1))]


def _trailer_root(data: bytes) -> int:
    m = re.search(rb"trailer(.*?)startxref", data[-1024:], re.S)
    if not m:
        raise ValueError("no trailer")
    return _ref(m.group(1), b"Root")


def parse_pdf(data: bytes) -> dict:
    """{version, n_pages, n_objects, pages: [text, ...]} — page texts in
    page-TREE order. Raises ValueError on malformed input."""
    mv = re.match(rb"%PDF-(\d\.\d)", data[:16])
    if not mv:
        raise ValueError("not a PDF (no %PDF header)")
    xref = _xref_offsets(data)
    kids = _kids(data, xref)
    pages: list[str] = []
    for num in kids:
        page = _obj_at(data, xref[num], num)
        pages.append(_content_of(data, xref, _ref(page, b"Contents")))
    return {
        "version": mv.group(1).decode(),
        "n_pages": len(kids),
        "n_objects": len(xref),
        "pages": pages,
    }


def page_text(data: bytes, page_idx: int) -> str:
    """ONE page's text via xref random access — trailer → root → kids →
    that kid's content stream only; never touches the other pages'
    streams (the seek-not-scan path for monster PDFs)."""
    xref = _xref_offsets(data)
    kids = _kids(data, xref)
    if not 0 <= page_idx < len(kids):
        raise ValueError(f"page {page_idx} out of range 0..{len(kids)-1}")
    num = kids[page_idx]
    page = _obj_at(data, xref[num], num)
    return _content_of(data, xref, _ref(page, b"Contents"))


# ---------------------------------------------------------- spark layer


PDF_PAGE_SCHEMA = (
    "media_ref string, page_idx int, version string, n_pages int, "
    "page_text string, err string"
)


def decode_pdf_pages(
    df: DataFrame, payload_col: str = "payload", ref_col: str = "media_ref"
) -> DataFrame:
    """(media_ref, payload=PDF bytes) → one row per page; malformed
    payloads yield a single err row for the document."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for ref, payload in zip(pdf_b[ref_col], pdf_b[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    meta = parse_pdf(bytes(payload))
                    for j, txt in enumerate(meta["pages"]):
                        rows.append(
                            {
                                "media_ref": ref,
                                "page_idx": j,
                                "version": meta["version"],
                                "n_pages": meta["n_pages"],
                                "page_text": txt,
                                "err": None,
                            }
                        )
                except (ValueError, KeyError) as e:
                    rows.append(
                        {
                            "media_ref": ref,
                            "page_idx": -1,
                            "version": None,
                            "n_pages": None,
                            "page_text": None,
                            "err": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "page_idx", "version", "n_pages",
                    "page_text", "err",
                ],
            )

    return df.select(ref_col, payload_col).mapInPandas(
        gen, schema=PDF_PAGE_SCHEMA
    )


# -------------------------------------------------------------- fixture


def pdf_fix_pages(i: int) -> list[list[tuple[str, ...]]]:
    """Closed-form fixture ops for id ``i``: ``1 + i%3`` pages; page j
    shows a Tj line ``Doc {i} page {j} (pdf)`` — parens exercising the
    escape path — and a TJ array concatenating ``A{i}`` + ``B{j}``.
    Pages with (i+j)%2==0 are FlateDecode'd (both stream paths fire)."""
    return [
        [("Tj", f"Doc {i} page {j} (pdf)"), ("TJ", f"A{i}", f"B{j}")]
        for j in range(1 + i % 3)
    ]


def synth_pdf(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """(id) → (media_ref='pdf://id', payload): real multi-page PDFs with
    correct xref tables; every parsed field closed-form in the id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            refs, blobs = [], []
            for i in pdf_b[id_col].astype("int64"):
                i = int(i)
                refs.append(f"pdf://{i}")
                blobs.append(
                    encode_pdf(
                        pdf_fix_pages(i),
                        compress_page=lambda j, i=i: (i + j) % 2 == 0,
                    )
                )
            yield pd.DataFrame({"media_ref": refs, "payload": blobs})

    ids = df.select(id_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    return ids.mapInPandas(gen, schema="media_ref string, payload binary")

"""Hypothesis property tests for the round-5 pure-Python codec cores:
PDF encode→parse round trips over adversarial text (parens,
backslashes, newlines — the escape grammar), WET charset decode over
every fixture route with arbitrary payload mutation never raising, and
feed XML round trips through the fixture generator's grammar.

No Spark session — pure Python, milliseconds per example."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from spider_spark.analysis import pdfdoc as P
from spider_spark.functions import charset as C

# latin-1-safe printable text (the PDF string codec is latin-1 inside
# the content stream); escapes are the interesting alphabet
_pdf_text = st.text(
    alphabet=list("abc XYZ01()\\\n\r\t"), min_size=0, max_size=40
)


@settings(max_examples=60, deadline=None)
@given(
    pages=st.lists(
        st.tuples(_pdf_text, _pdf_text, _pdf_text), min_size=1, max_size=4
    ),
    compress_mask=st.integers(min_value=0, max_value=15),
)
def test_pdf_roundtrip_arbitrary_text(pages, compress_mask):
    ops = [
        [("Tj", a), ("TJ", b, c)] for (a, b, c) in pages
    ]
    blob = P.encode_pdf(
        ops, compress_page=lambda j: bool(compress_mask >> (j % 4) & 1)
    )
    meta = P.parse_pdf(blob)
    assert meta["n_pages"] == len(pages)
    for j, (a, b, c) in enumerate(pages):
        assert meta["pages"][j] == f"{a}\n{b}{c}"
        assert P.page_text(blob, j) == meta["pages"][j]


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_pdf_parse_never_hangs_or_crashes(data):
    # arbitrary bytes: ValueError or a valid dict, never another error
    try:
        meta = P.parse_pdf(b"%PDF-1.4\n" + data)
        assert isinstance(meta["pages"], list)
    except ValueError:
        pass


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_charset_decode_total_function(data):
    # decode_bytes is total: any bytes in, (known charset, str) out
    cs, t = C.decode_bytes(data)
    assert isinstance(t, str)
    assert cs in set(C.ALIASES.values()) | {"utf-8"}


@settings(max_examples=60, deadline=None)
@given(
    txt=st.text(
        alphabet=st.characters(
            min_codepoint=32, max_codepoint=0xFF, blacklist_characters="<>\"&"
        ),
        min_size=1,
        max_size=30,
    ),
    mode=st.integers(min_value=0, max_value=4),
)
def test_charset_modes_roundtrip_latin1_plane(txt, mode):
    # any latin-1-plane text survives every fixture route bit-exact
    enc, label = C._FIX_MODES[mode]
    if label in ("latin-1", "cp1252"):
        page = (
            f'<html><head><meta charset="{label}"></head>'
            f"<body>{txt}</body></html>"
        )
        raw = page.encode(enc, errors="strict") if _encodable(
            page, enc
        ) else None
        if raw is None:
            return  # cp1252 has 5 unmapped codepoints; skip those draws
        cs, t = C.decode_bytes(raw)
        assert (cs, t) == (label, page)
    elif enc == "utf-16-le":
        cs, t = C.decode_bytes(b"\xff\xfe" + txt.encode(enc))
        assert (cs, t) == ("utf-16-le", txt)
    else:
        cs, t = C.decode_bytes(txt.encode(enc))
        assert (cs, t) == ("utf-8", txt)


def _encodable(s: str, enc: str) -> bool:
    try:
        s.encode(enc, errors="strict")
        return True
    except UnicodeEncodeError:
        return False

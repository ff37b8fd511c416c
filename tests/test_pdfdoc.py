"""PDF container parse (analysis/pdfdoc.py): encode→parse round-trips
over both stream paths (raw + FlateDecode), page-tree order, string
escapes, TJ concatenation, xref random access, hostile degradation,
and the Spark page-row projection over the closed-form fixture."""

from __future__ import annotations

import re

import pytest

from spider_spark.analysis import pdfdoc as P


def _expected(i: int, j: int) -> str:
    return f"Doc {i} page {j} (pdf)\nA{i}B{j}"


@pytest.mark.parametrize("i", [0, 1, 2, 5, 11])
def test_roundtrip_fixture(i):
    blob = P.encode_pdf(
        P.pdf_fix_pages(i), compress_page=lambda j, i=i: (i + j) % 2 == 0
    )
    meta = P.parse_pdf(blob)
    assert meta["version"] == "1.4"
    assert meta["n_pages"] == 1 + i % 3
    assert meta["pages"] == [_expected(i, j) for j in range(1 + i % 3)]


def test_page_tree_order_not_object_order():
    # kids order IS the contract — parse must follow /Kids, and the
    # fixture's kids are in object order, so shuffle a handmade one
    blob = P.encode_pdf([[("Tj", "first")], [("Tj", "second")]])
    # swap the kid refs in the /Kids array: page tree now reads 5,3
    swapped = blob.replace(b"/Kids [3 0 R 5 0 R]", b"/Kids [5 0 R 3 0 R]")
    # xref offsets unchanged (same byte length) — reparse follows kids
    assert P.parse_pdf(swapped)["pages"] == ["second", "first"]


def test_string_escapes_and_tj_concat():
    blob = P.encode_pdf(
        [[("Tj", "par(en)s \\ slash"), ("TJ", "x(", "y)", "z")]]
    )
    assert P.parse_pdf(blob)["pages"][0] == "par(en)s \\ slash\nx(y)z"


def test_page_text_random_access_matches_full_parse():
    blob = P.encode_pdf(P.pdf_fix_pages(8))  # 3 pages
    full = P.parse_pdf(blob)
    for j in range(3):
        assert P.page_text(blob, j) == full["pages"][j]
    with pytest.raises(ValueError):
        P.page_text(blob, 3)


def test_hostile_inputs_raise_value_error():
    blob = P.encode_pdf([[("Tj", "x")]])
    bads = [
        b"",
        b"\x00" * 64,
        b"%PDF-1.4\nno xref here",
        blob[:-40],  # trailer cut
        blob.replace(b"/Root 1 0 R", b"/Boot 1 0 R"),
        # corrupt an xref offset digit → wrong-object detection
        re.sub(rb"\n0000000009", b"\n0000000011", blob),
        # flate stream corrupted
        P.encode_pdf([[("Tj", "x")]], compress_page=lambda j: True)
        .replace(b"stream\n", b"stream\n\x00\x00", 1),
    ]
    for bad in bads:
        with pytest.raises(ValueError):
            P.parse_pdf(bad)


def test_unsupported_filter_raises():
    blob = P.encode_pdf([[("Tj", "x")]], compress_page=lambda j: True)
    bad = blob.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    with pytest.raises(ValueError):
        P.parse_pdf(bad)


def test_spark_pages_match_closed_form(spark):
    ids = spark.range(0, 30).selectExpr("id as event_id")
    rows = P.decode_pdf_pages(P.synth_pdf(ids)).collect()
    assert all(r.err is None for r in rows)
    got = {(r.media_ref, r.page_idx): r for r in rows}
    n = 0
    for i in range(30):
        for j in range(1 + i % 3):
            r = got[(f"pdf://{i}", j)]
            assert r.page_text == _expected(i, j)
            assert r.n_pages == 1 + i % 3 and r.version == "1.4"
            n += 1
    assert len(rows) == n


def test_spark_hostile_payload_degrades_to_err_row(spark):
    rows = [("pdf://bad", b"%PDF-1.4 truncated"), ("pdf://null", None)]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = P.decode_pdf_pages(df).collect()
    assert len(out) == 2
    assert all(r.err is not None and r.page_idx == -1 for r in out)

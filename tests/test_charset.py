"""Charset detection + transcode: the BOM / meta-tag / default
detection contract, BOM stripping, alias normalization, replace-mode
degradation on mojibake, and the Spark projection over the closed-form
rotating-encoding fixture."""

from __future__ import annotations

import pytest

from spider_spark.functions import charset as C


def test_bom_detection_and_strip():
    assert C.detect_charset("x".encode("utf-8-sig")) == "utf-8"
    assert C.detect_charset(b"\xff\xfeh\x00") == "utf-16-le"
    assert C.detect_charset(b"\xfe\xff\x00h") == "utf-16-be"
    # BOM consumed, never leaks into text
    cs, t = C.decode_bytes("héllo".encode("utf-8-sig"))
    assert (cs, t) == ("utf-8", "héllo")
    cs, t = C.decode_bytes(b"\xff\xfe" + "wörld".encode("utf-16-le"))
    assert (cs, t) == ("utf-16-le", "wörld")


@pytest.mark.parametrize(
    "label,codec",
    [("UTF-8", "utf-8"), ("utf8", "utf-8"), ("ISO-8859-1", "latin-1"),
     ("Windows-1252", "cp1252"), ("Shift_JIS", "shift_jis"),
     ("gb2312", "gbk")],
)
def test_meta_tag_detection_and_aliases(label, codec):
    page = f'<html><head><meta charset="{label}"></head>'.encode("ascii")
    assert C.detect_charset(page) == codec
    # http-equiv form (charset= appears inside the content attribute)
    page2 = (
        '<meta http-equiv="Content-Type" '
        f'content="text/html; charset={label}">'
    ).encode("ascii")
    assert C.detect_charset(page2) == codec


def test_meta_beyond_1024_bytes_ignored():
    page = b" " * 1025 + b'<meta charset="latin-1">'
    assert C.detect_charset(page) == "utf-8"


def test_default_and_hostile():
    assert C.detect_charset(None) == "utf-8"
    assert C.detect_charset(b"") == "utf-8"
    assert C.detect_charset(b"plain ascii") == "utf-8"
    # unknown label falls through to default
    assert C.detect_charset(b'<meta charset="klingon-9">') == "utf-8"
    # mojibake: invalid utf-8 degrades to U+FFFD, never raises
    cs, t = C.decode_bytes(b"ok \xff\xfe\x00\x00 bad" + b"\x80" * 5)
    assert "�" in t
    assert C.decode_bytes(None) == ("utf-8", "")


def test_fixture_round_trip_pure():
    for i in range(25):
        cs, t = C.decode_bytes(C.charset_fix_payload(i))
        assert t == C.charset_fix_expected_text(i), i
        assert cs == C._FIX_MODES[i % 5][1], i


def test_spark_decode_matches_closed_form(spark):
    ids = spark.range(0, 40).selectExpr("id as doc_id")
    out = {
        r.doc_id: r
        for r in C.decode_documents(C.synth_charset_docs(ids)).collect()
    }
    assert len(out) == 40
    for i in range(40):
        assert out[i].charset == C._FIX_MODES[i % 5][1], i
        assert out[i].text == C.charset_fix_expected_text(i), i

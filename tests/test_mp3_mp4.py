"""MP3 frame-walk and MP4/ISO-BMFF sample-table parsing: encoder→parser
round-trips (the encoders are the oracles — every parsed value is a
closed form of the spec fed in), corrupt-payload degradation, and the
Spark mapInPandas wrappers incl. err rows.

Reference scope note: the reference crawler fetches media bytes as
opaque entities (UrlHandler.scala's content pipeline); container-level
parsing is the training-data-pipeline layer this repo adds on top, per
the multimodal module docstring."""

from __future__ import annotations

import struct

import pytest

from spider_spark.analysis import codecs
from spider_spark.analysis import media_fixtures as MF


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------


def test_mp3_roundtrip_cbr():
    d = codecs.encode_mp3([(128, 44100, 0)] * 4)
    f = codecs.parse_mp3(d)
    assert f["n_frames"] == 4
    assert f["sample_rate"] == 44100
    assert f["bitrate_min"] == f["bitrate_max"] == f["bitrate_avg"] == 128
    assert f["vbr"] is False
    # 4 frames * 1152 samples at 44.1 kHz
    assert f["duration_ms"] == 4 * 1152 * 1000 // 44100
    # frame boundaries: 144*128000/44100 = 417 bytes, no padding
    assert [fr[1] for fr in f["frames"]] == [417] * 4
    assert f["frames"][0][0] == 0
    assert f["frames"][1][0] == 417


def test_mp3_vbr_and_padding():
    d = codecs.encode_mp3([(128, 44100, 0), (192, 44100, 1), (320, 44100, 0)])
    f = codecs.parse_mp3(d)
    assert f["vbr"] is True
    assert (f["bitrate_min"], f["bitrate_max"]) == (128, 320)
    assert f["bitrate_avg"] == (128 + 192 + 320) // 3
    # padded frame is one byte longer: 144*192000/44100 = 626 (+1)
    assert f["frames"][1][1] == 627


def test_mp3_id3v2_skip():
    plain = codecs.parse_mp3(codecs.encode_mp3([(128, 44100, 0)] * 2))
    tagged_b = codecs.encode_mp3([(128, 44100, 0)] * 2, id3_size=200)
    tagged = codecs.parse_mp3(tagged_b)
    assert tagged["n_frames"] == plain["n_frames"] == 2
    # frames shift by the 10-byte tag header + 200 payload bytes
    assert tagged["frames"][0][0] == 210


def test_mp3_trailing_garbage_tolerated():
    d = codecs.encode_mp3([(128, 44100, 0)] * 2) + b"TAGgarbage" * 3
    assert codecs.parse_mp3(d)["n_frames"] == 2


def test_mp3_truncated_last_frame_dropped():
    d = codecs.encode_mp3([(128, 44100, 0)] * 3)
    f = codecs.parse_mp3(d[:-10])  # last frame incomplete
    assert f["n_frames"] == 2


def test_mp3_corrupt_raises():
    with pytest.raises(ValueError):
        codecs.parse_mp3(b"\x00" * 64)
    with pytest.raises(ValueError):
        codecs.parse_mp3(b"ID3\x03\x00\x00\x00\x00\x00\x05hello")  # tag only


def test_mp3_sample_rate_change_ends_stream():
    a = codecs.encode_mp3([(128, 44100, 0)])
    b = codecs.encode_mp3([(128, 48000, 0)])
    f = codecs.parse_mp3(a + b)
    assert f["n_frames"] == 1 and f["sample_rate"] == 44100


# ---------------------------------------------------------------------------
# MP4
# ---------------------------------------------------------------------------


def _samples(n, base=0):
    return [bytes([(base + 11 * k) % 251]) * (3 + (base + 7 * k) % 9) for k in range(n)]


def test_mp4_roundtrip_metadata():
    d = codecs.encode_mp4(
        _samples(5), timescale=1000, sample_delta=40,
        width=64, height=48, kind="vide",
    )
    info = codecs.parse_mp4(d)
    assert info["major_brand"] == "isom"
    assert info["timescale"] == 1000
    assert info["duration_ms"] == 5 * 40
    t = info["tracks"][0]
    assert (t["kind"], t["width"], t["height"]) == ("vide", 64, 48)
    assert t["n_samples"] == 5
    assert t["duration_ms"] == 200


def test_mp4_sample_extraction_byte_exact():
    samples = _samples(7, base=5)
    d = codecs.encode_mp4(samples, sample_delta=40)
    t = codecs.parse_mp4(d)["tracks"][0]
    for k, (off, sz, ts) in enumerate(t["samples"]):
        assert d[off : off + sz] == samples[k]
        assert ts == 40 * k


def test_mp4_stride_sampling():
    samples = _samples(6)
    d = codecs.encode_mp4(samples, sample_delta=40, timescale=1000)
    got = list(codecs.sample_mp4(d, stride=2))
    assert [g[0] for g in got] == [0, 2, 4]
    assert [g[1] for g in got] == [0, 80, 160]
    assert all(g[2] == samples[g[0]] for g in got)
    assert len(list(codecs.sample_mp4(d, stride=2, limit=2))) == 2


def test_mp4_audio_kind():
    d = codecs.encode_mp4(_samples(2), kind="soun", width=0, height=0)
    t = codecs.parse_mp4(d)["tracks"][0]
    assert t["kind"] == "soun" and t["width"] == 0


def test_mp4_co64_offsets():
    """A hand-built stbl with co64 (64-bit chunk offsets) parses the
    same as stco — the path a >4 GiB fragment would take."""
    d = codecs.encode_mp4(_samples(3), sample_delta=40)
    # transplant: rewrite the stco box into co64 with identical offsets
    t = codecs.parse_mp4(d)["tracks"][0]
    offs = [s[0] for s in t["samples"]]
    stco_payload = struct.pack(">B3sI", 0, b"\x00\x00\x00", len(offs)) + b"".join(
        struct.pack(">I", o) for o in offs
    )
    stco = struct.pack(">I", 8 + len(stco_payload)) + b"stco" + stco_payload
    co64_payload = struct.pack(">B3sI", 0, b"\x00\x00\x00", len(offs)) + b"".join(
        struct.pack(">Q", o) for o in offs
    )
    co64 = struct.pack(">I", 8 + len(co64_payload)) + b"co64" + co64_payload
    assert stco in d
    d2 = d.replace(stco, co64)
    # co64 is 12 bytes longer; box sizes upstream are now wrong, so walk
    # tolerance matters: rebuild instead via the encoder's box helpers
    if len(d2) != len(d):
        # fix enclosing box sizes (stbl/minf/mdia/trak/moov grew by 12)
        d2 = bytearray(d2)
        grow = len(co64) - len(stco)
        pos = d2.find(co64)
        for btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            i = d2.find(btype)
            if 0 < i < pos:
                (old,) = struct.unpack_from(">I", d2, i - 4)
                struct.pack_into(">I", d2, i - 4, old + grow)
        d2 = bytes(d2)
    t2 = codecs.parse_mp4(d2)["tracks"][0]
    assert [s[0] for s in t2["samples"]] == offs


def test_mp4_corrupt_raises():
    with pytest.raises(ValueError):
        codecs.parse_mp4(b"\x00" * 32)
    d = codecs.encode_mp4(_samples(2))
    with pytest.raises(ValueError):
        codecs.parse_mp4(d[: len(d) // 2])  # moov truncated away


# ---------------------------------------------------------------------------
# Spark wrappers + fixtures
# ---------------------------------------------------------------------------


def test_mp3_fixture_params_match_parser():
    for i in (0, 1, 2, 3, 4, 7, 10, 123):
        p = MF.mp3_params(i)
        specs = [
            (192 if p["vbr"] and j % 2 == 1 else 128, p["rate"], 0)
            for j in range(p["n_frames"])
        ]
        f = codecs.parse_mp3(codecs.encode_mp3(specs, id3_size=p["id3"]))
        assert f["n_frames"] == p["n_frames"]
        assert f["vbr"] is p["vbr"]


def test_spark_mp3_and_mp4_wrappers(spark):
    from spider_spark.analysis import multimodal as M

    ids = spark.createDataFrame(
        [(i,) for i in range(20)], "event_id long"
    )
    mp3 = M.decode_mp3_features(MF.synth_mp3(ids)).collect()
    assert len(mp3) == 20
    by_ref = {r["media_ref"]: r for r in mp3}
    assert by_ref["mp3://3"]["vbr_int"] == 1
    assert by_ref["mp3://4"]["n_frames"] == 3 + 4 % 5
    assert all(r["err"] is None for r in mp3)

    mp4 = M.sample_mp4_payloads(MF.synth_mp4(ids), stride=2).collect()
    # one row per sampled k < 2 + id%6
    want_rows = sum(len(range(0, 2 + i % 6, 2)) for i in range(20))
    assert len(mp4) == want_rows
    r = next(
        x for x in mp4 if x["media_ref"] == "mp4://5" and x["sample_idx"] == 2
    )
    assert r["n_bytes"] == 3 + (5 + 7 * 2) % 9
    assert r["byte_val"] == (5 + 11 * 2) % 251
    assert r["ts_milli"] == 80


def test_spark_wrappers_degrade_on_corrupt_payload(spark):
    from spider_spark.analysis import multimodal as M

    df = spark.createDataFrame(
        [
            ("mp3://ok", bytearray(codecs.encode_mp3([(128, 44100, 0)]))),
            ("mp3://bad", bytearray(b"\x01\x02\x03")),
            ("mp3://null", None),
        ],
        "media_ref string, payload binary",
    )
    rows = {r["media_ref"]: r for r in M.decode_mp3_features(df).collect()}
    assert rows["mp3://ok"]["err"] is None
    assert rows["mp3://ok"]["n_frames"] == 1
    assert rows["mp3://bad"]["err"] is not None
    assert rows["mp3://null"]["err"] is not None

    df4 = spark.createDataFrame(
        [
            ("mp4://ok", bytearray(codecs.encode_mp4(_samples(2)))),
            ("mp4://bad", bytearray(b"\x00" * 16)),
        ],
        "media_ref string, payload binary",
    )
    rows4 = {
        r["media_ref"]: r
        for r in M.sample_mp4_payloads(df4, stride=1).collect()
    }
    assert rows4["mp4://ok"]["err"] is None
    assert rows4["mp4://bad"]["err"] is not None

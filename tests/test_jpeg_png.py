"""PNG + baseline JPEG codecs (pure stdlib-zlib/numpy, analysis/codecs).

PNG is lossless: round-trips must be byte-exact for every scanline
filter. JPEG is lossy: round-trips bound the reconstruction error —
near-zero at high quality for 4:4:4, chroma-limited for 4:2:0 — and the
structural paths (marker walk, canonical Huffman, byte unstuffing,
subsampled MCU interleave, padding) are what the assertions pin. An
externally-produced PNG vector guards against mirrored encode/decode
bugs; for JPEG the 4:2:0 encoder exercises the general Hi/Vi decode path
an own-format round-trip would otherwise never touch.
"""

import base64

import numpy as np
import pytest

from spider_spark.analysis import codecs

rng = np.random.default_rng(42)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    g = np.zeros((h, w, 3), np.uint8)
    g[..., 0] = (yy * 4) % 256
    g[..., 1] = (xx * 3) % 256
    g[..., 2] = ((yy + xx) * 2) % 256
    return g


# ------------------------------------------------------------------- PNG


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "mixed"])
def test_png_roundtrip_every_filter(ft):
    img = rng.integers(0, 256, (16, 11, 3), dtype=np.uint8)
    assert (codecs.decode_png(codecs.encode_png(img, ft)) == img).all()


def test_png_roundtrip_shapes():
    for h, w in [(1, 1), (5, 3), (31, 7), (48, 64)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = codecs.decode_any(codecs.encode_png(img))
        assert out.shape == (h, w, 3) and (out == img).all()


def test_png_external_vector():
    # 1x1 RGBA PNG produced by a standard encoder — structural
    # conformance (signature, chunk walk, zlib IDAT, filter byte) against
    # bytes this codec did not write
    b64 = (
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
        "AAAADUlEQVR42mNk+M9QDwADhgGAWjR9awAAAABJRU5ErkJggg=="
    )
    img = codecs.decode_png(base64.b64decode(b64))
    assert img.shape == (1, 1, 3)


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_png(b"not a png")
    # truncated signature must not be accepted by the sniffer either
    with pytest.raises(ValueError):
        codecs.decode_any(b"\x89PNG not the signature")


# ------------------------------------------------------------------ JPEG


def test_jpeg_uniform_dc_only_exact():
    img = np.full((16, 24, 3), [120, 64, 200], dtype=np.uint8)
    for sub in ("444", "420"):
        out = codecs.decode_jpeg(codecs.encode_jpeg(img, 95, sub))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1, sub


def test_jpeg_gradient_high_quality():
    g = _gradient(40, 56)
    out = codecs.decode_jpeg(codecs.encode_jpeg(g, 95))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2
    out420 = codecs.decode_jpeg(codecs.encode_jpeg(g, 95, "420"))
    # chroma is 2x2 box-averaged: smooth content stays within a few levels
    assert np.abs(out420.astype(int) - g.astype(int)).max() <= 8


def test_jpeg_noise_q100_near_lossless():
    n = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(n, 100))
    assert np.abs(out.astype(int) - n.astype(int)).max() <= 2


def test_jpeg_odd_dims_padding():
    for sub in ("444", "420"):
        o = rng.integers(0, 256, (13, 11, 3), dtype=np.uint8)
        out = codecs.decode_jpeg(codecs.encode_jpeg(o, 90, sub))
        assert out.shape == (13, 11, 3)


def test_jpeg_quality_monotone():
    g = _gradient(32, 32)
    errs = []
    for q in (30, 60, 95):
        out = codecs.decode_jpeg(codecs.encode_jpeg(g, q))
        errs.append(float(np.abs(out.astype(int) - g.astype(int)).mean()))
    assert errs[0] >= errs[1] >= errs[2]


def test_jpeg_dispatch_and_rejects():
    img = np.full((8, 8, 3), 50, np.uint8)
    assert codecs.decode_any(codecs.encode_jpeg(img)).shape == (8, 8, 3)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"\xff\xd8 garbage with no scan")
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"nope")
    # progressive (SOF2) now decodes; a frame with no scan still errors
    sof2 = b"\x08\x00\x08\x00\x08\x00"  # prec=8, 8x8, 0 components
    prog = b"\xff\xd8\xff\xc2\x00\x08" + sof2 + b"\xff\xd9"
    with pytest.raises(ValueError, match="no JPEG scan"):
        codecs.decode_jpeg(prog)
    # arithmetic coding stays an explicit unsupported error
    arith = b"\xff\xd8\xff\xc9\x00\x08" + sof2 + b"\xff\xd9"
    with pytest.raises(ValueError, match="progressive JPEG supported"):
        codecs.decode_jpeg(arith)


def test_jpeg_feeds_multimodal_features():
    from spider_spark.analysis.codecs import block_mean_features

    img = np.full((16, 16, 3), 80, np.uint8)
    data = codecs.encode_jpeg(img, 95)
    feats = block_mean_features(codecs.decode_any(data), 2)
    assert feats.shape == (12,)
    assert np.allclose(feats, 80 / 255.0, atol=2 / 255.0)


# ------------------------------------------------------- progressive JPEG


def _seq_prog_equal(img, quality=90, scans=None):
    seq = codecs.decode_jpeg(codecs.encode_jpeg(img, quality, "444"))
    prog = codecs.decode_jpeg(
        codecs.encode_jpeg_progressive(img, quality, scans=scans)
    )
    # same quant tables + coefficients -> progressive is purely an
    # entropy reordering; reconstruction must match the sequential
    # decode exactly
    assert np.array_equal(seq, prog)


def test_progressive_matches_sequential_gradient():
    _seq_prog_equal(_gradient(24, 17), 60)
    _seq_prog_equal(_gradient(24, 17), 90)


def test_progressive_matches_sequential_noise():
    img = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    for q in (30, 75, 95):
        _seq_prog_equal(img, q)


def test_progressive_eobrun_stress_flat():
    # large flat image at low quality -> nearly all AC bands zero ->
    # EOB runs fold across many blocks (and across successive-
    # approximation refinement scans with deferred correction bits)
    img = np.full((64, 64, 3), 77, np.uint8)
    img[0, 0] = 200  # one block with content so scans aren't empty
    _seq_prog_equal(img, 25)


def test_progressive_zrl_stress_sparse():
    # isolated bright pixels produce high-frequency coefficients with
    # long zero runs inside blocks -> ZRL paths in first AND refinement
    # scans
    img = np.zeros((32, 32, 3), np.uint8)
    img[::7, ::5] = 255
    _seq_prog_equal(img, 85)


def test_progressive_spectral_only_script():
    # pure spectral selection, no successive approximation
    scans = (
        ((0, 1, 2), 0, 0, 0, 0),
        ((0,), 1, 5, 0, 0),
        ((0,), 6, 63, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
    )
    _seq_prog_equal(_gradient(16, 24), 80, scans=scans)


def test_progressive_dc_only_stream_decodes():
    # DC scans alone are a legal (if blurry) progressive stream: AC
    # stays zero -> each 8x8 block reconstructs to its DC mean
    scans = (((0, 1, 2), 0, 0, 0, 1), ((0, 1, 2), 0, 0, 1, 0))
    img = np.full((16, 16, 3), 90, np.uint8)
    out = codecs.decode_jpeg(
        codecs.encode_jpeg_progressive(img, 95, scans=scans)
    )
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - 90).max() <= 2


def test_progressive_via_decode_any_and_batch():
    img = _gradient(12, 12)
    data = codecs.encode_jpeg_progressive(img, 90)
    want = codecs.decode_jpeg(data)
    assert np.array_equal(codecs.decode_any(data), want)
    imgs, errs = codecs.decode_batch([data, data, None])
    assert errs == [None, None, "null payload"]
    assert np.array_equal(imgs[0], want)
    assert np.array_equal(imgs[1], want)


# ---------------------------------------- Adam7 interlace + 16-bit depth


def _rng_img(h, w, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "mixed"])
@pytest.mark.parametrize(
    "hw", [(1, 1), (2, 3), (8, 8), (9, 7), (17, 5), (5, 17)]
)
def test_adam7_roundtrip_every_filter_and_odd_sizes(ft, hw):
    # sizes straddle the 8x8 pass grid: single-pixel (only pass 1
    # non-empty), sub-8 (several empty passes), exact 8x8, and odd
    # overshoots in each dimension
    h, w = hw
    img = _rng_img(h, w, seed=h * 31 + w)
    enc = codecs.encode_png(img, filter_type=ft, interlace=True)
    assert np.array_equal(codecs.decode_png(enc), img)
    # interlaced and sequential encodings of the same pixels decode
    # bit-identically
    seq = codecs.encode_png(img, filter_type=ft)
    assert np.array_equal(codecs.decode_png(enc), codecs.decode_png(seq))


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "mixed"])
def test_png16_roundtrip_high_byte(ft):
    rng = np.random.default_rng(11)
    img16 = rng.integers(0, 65536, (6, 5, 3), dtype=np.uint16)
    enc = codecs.encode_png16(img16, filter_type=ft)
    got = codecs.decode_png(enc)
    assert np.array_equal(got, (img16 >> 8).astype(np.uint8))


def test_png16_interlaced_roundtrip():
    rng = np.random.default_rng(13)
    img16 = rng.integers(0, 65536, (9, 7, 3), dtype=np.uint16)
    enc = codecs.encode_png16(img16, filter_type="mixed", interlace=True)
    assert np.array_equal(
        codecs.decode_png(enc), (img16 >> 8).astype(np.uint8)
    )


def test_adam7_truncated_stream_errors():
    img = _rng_img(9, 7)
    enc = codecs.encode_png(img, filter_type=0, interlace=True)
    # truncate the inflated stream by re-deflating a shorter payload
    import zlib

    w, h, depth, nch, ctype_n, interlace, plte, raw = codecs._png_meta(enc)
    short = zlib.compress(raw.tobytes()[:-3])
    ihdr = codecs._png_chunk(
        b"IHDR",
        __import__("struct").pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1),
    )
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + ihdr
        + codecs._png_chunk(b"IDAT", short)
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline size mismatch"):
        codecs.decode_png(bad)


def test_invalid_16bit_palette_errors():
    import struct as _s

    ihdr = codecs._png_chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0))
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + ihdr
        + codecs._png_chunk(b"PLTE", bytes([0, 0, 0]))
        + codecs._png_chunk(b"IDAT", b"x\x9c\x03\x00\x00\x00\x00\x01")
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="16-bit palette"):
        codecs.decode_png(bad)

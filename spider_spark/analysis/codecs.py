"""Pure-numpy image codecs for the multimodal pipeline.

The container has no PIL/opencv, but BMP (uncompressed 24-bit BI_RGB) and
binary PPM/PGM (P6/P5) are simple enough to decode with numpy alone —
which turns `analysis.multimodal.decode_image_features` from a stub into
a real operator for those formats. Encoders are included so fixtures and
tests can round-trip without any external library.

Everything here is plain bytes→ndarray work intended to run inside
Arrow-batched `mapInPandas` workers; no Spark imports.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ PPM/PGM


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (H,W,3) → binary P6 PPM."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img.astype(np.uint8)
    ).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → uint8 (H,W,3). Grayscale is expanded
    to 3 channels so downstream feature code sees one shape."""
    if not data.startswith((b"P6", b"P5")):
        raise ValueError("not a binary PPM/PGM")
    gray = data.startswith(b"P5")
    # header = magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    ch = 1 if gray else 3
    need = w * h * ch
    raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    img = raw.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if gray else img


# --------------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (H,W,3) RGB → uncompressed 24-bit BI_RGB BMP (bottom-up,
    rows padded to 4 bytes)."""
    h, w = img.shape[:2]
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = img[..., ::-1].astype(np.uint8)  # BMP stores BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + b"\x00" * pad
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → uint8 (H,W,3) RGB. Handles
    bottom-up and top-down (negative height) row order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) // 4 * 4
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    img = rows[..., 2::-1] if nch == 3 else rows[..., [2, 1, 0]]
    return img if top_down else img[::-1]


# ---------------------------------------------------------------- features


def decode_any(data: bytes) -> np.ndarray:
    """Sniff magic bytes and decode. ValueError on unknown formats."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P6", b"P5"):
        return decode_ppm(data)
    raise ValueError("unrecognized image format")


def block_mean_features(img: np.ndarray, grid: int = 2) -> np.ndarray:
    """grid×grid block-mean per RGB channel → float32 vector of
    3*grid² values in [0,1]. A deterministic, resize-free downsample:
    each cell averages its pixel block (uneven edges absorbed by
    np.array_split), so any input size maps to a fixed-length feature."""
    img = img.astype(np.float32) / 255.0
    out = np.empty((grid, grid, 3), dtype=np.float32)
    for i, rows in enumerate(np.array_split(img, grid, axis=0)):
        for j, cell in enumerate(np.array_split(rows, grid, axis=1)):
            out[i, j] = cell.mean(axis=(0, 1)) if cell.size else 0.0
    return out.reshape(-1)

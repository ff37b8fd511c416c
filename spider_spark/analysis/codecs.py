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


# ------------------------------------------------------------------- resize


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index math (no image library).
    Deterministic: sample point for output pixel i is
    floor((i + 0.5) * src / dst) — the standard half-pixel-center rule."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return img[ys][:, xs]


# ------------------------------------------------------------ PCM WAV audio


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 (N,) mono or (N,C) → RIFF/WAVE PCM-16. Pure struct/numpy."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    body = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM (8/16-bit) → (float32 (N,C) in [-1,1], sample_rate).
    Walks the chunk list, so extra chunks (LIST, fact, …) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        chunk = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif cid == b"data":
            raw = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    if bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    else:  # 8-bit PCM is unsigned, midpoint 128
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), rate


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Deterministic scalar features over float32 (N,C) samples."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = int(mono.shape[0])
    rms = float(np.sqrt(np.mean(np.square(mono, dtype=np.float64)))) if n else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0
    return {
        "n_samples": n,
        "sample_rate": int(rate),
        "n_channels": int(samples.shape[1] if samples.ndim == 2 else 1),
        "duration_sec": (n / rate) if rate else 0.0,
        "rms": rms,
        "peak": peak,
        "zero_crossings": zc,
    }


# -------------------------------------------------- frame container (video)

# Deterministic stand-in for a video file: a seekable container of encoded
# image frames. Layout:
#   b"SSVF" | u32 n_frames | u32 fps_milli | u32 sizes[n_frames] | frames…
# The index-first layout means frame sampling SEEKS to the wanted frames
# and decodes only those — the property that matters for stride-sampling a
# real container format at scale.

_FRAME_MAGIC = b"SSVF"


def encode_frames(frames: list[bytes], fps: float = 1.0) -> bytes:
    head = _FRAME_MAGIC + struct.pack(
        "<II", len(frames), int(round(fps * 1000))
    )
    sizes = struct.pack(f"<{len(frames)}I", *(len(f) for f in frames))
    return head + sizes + b"".join(frames)


def frame_container_info(data: bytes) -> tuple[int, float, list[tuple[int, int]]]:
    """(n_frames, fps, [(offset, size)...]) from the header alone."""
    if data[:4] != _FRAME_MAGIC:
        raise ValueError("not a frame container")
    n, fps_milli = struct.unpack_from("<II", data, 4)
    sizes = struct.unpack_from(f"<{n}I", data, 12)
    offs, pos = [], 12 + 4 * n
    for s in sizes:
        offs.append((pos, s))
        pos += s
    return n, fps_milli / 1000.0, offs


def sample_frames(data: bytes, stride: int = 1, limit: int | None = None):
    """Yield (frame_idx, ts_sec, frame_bytes) for frames 0, stride, 2*stride…
    Only the sampled frames' byte ranges are touched."""
    n, fps, offs = frame_container_info(data)
    count = 0
    for i in range(0, n, max(1, stride)):
        if limit is not None and count >= limit:
            return
        off, size = offs[i]
        yield i, (i / fps if fps else 0.0), data[off : off + size]
        count += 1

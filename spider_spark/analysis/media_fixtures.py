"""Deterministic media-payload synthesis for the multimodal operators.

The container has no image/audio libraries and no real media corpus, so the
driver-gate queries synthesize payloads *inside the Spark job* from an
integer id column, using the pure-numpy/struct encoders in
``analysis.codecs``.  Every payload parameter is a closed-form function of
the id, which is what makes the decode operators oracle-checkable: DuckDB
can recompute the expected decoded features with integer arithmetic while
Spark actually round-trips real bytes through the codec path.

All three synthesizers are Arrow-batched ``mapInPandas`` stages emitting
``(media_ref string, payload binary)`` — the same shape a real crawl's
media sidecar table would have (reference: the ``media_ref`` span fields,
UrlHandler.scala's fetched-entity payloads).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from spider_spark.analysis import codecs

PAYLOAD_SCHEMA = "media_ref string, payload binary"


def _ids(df: DataFrame, id_col: str) -> DataFrame:
    """The id column, spread across the session's full parallelism.

    The synth stages (and the per-payload Python decoders downstream of
    them) inherit the INPUT's partitioning — and a small parquet id
    table plans 1-2 splits, serializing the whole Python pipeline onto
    2 of N cores. A real 100-TB payload table arrives in thousands of
    splits; the repartition (a shuffle of one int column — trivial)
    restores that shape for the synthetic corpus. Row VALUES are
    closed-form per id, so partitioning never changes any result."""
    ids = df.select(id_col)
    return ids.repartition(df.sparkSession.sparkContext.defaultParallelism)


def wav_params(i: int) -> dict:
    """Closed-form square-wave parameters for id ``i`` (mirrored in SQL)."""
    return {
        "amp": ((i % 16) + 1) * 1024,          # int16 amplitude, ≤ 16384
        "n": 8 + (i % 5) * 4,                   # even sample count 8..24
        "rate": 8000 + (i % 3) * 4000,          # 8/12/16 kHz
    }


def synth_wav(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """(id) → (media_ref='wav://id', payload=PCM-16 RIFF/WAVE square wave).

    Square wave of amplitude ``amp`` alternating +amp/-amp each sample:
    rms == peak == amp/32768 exactly (float32-representable since amp is a
    multiple of 1024), zero_crossings == n-1.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, blobs = [], []
            for i in pdf[id_col].astype("int64"):
                p = wav_params(int(i))
                s = np.empty(p["n"], dtype=np.int16)
                s[0::2], s[1::2] = p["amp"], -p["amp"]
                refs.append(f"wav://{int(i)}")
                blobs.append(codecs.encode_wav(s, p["rate"]))
            yield pd.DataFrame({"media_ref": refs, "payload": blobs})

    return _ids(df, id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


def frame_params(i: int) -> dict:
    """Frame-container parameters for id ``i`` (mirrored in SQL)."""
    return {"n_frames": 3 + (i % 4), "fps": 2.0}


def frame_color(i: int, frame_idx: int) -> int:
    return (i * 31 + frame_idx * 7) % 251


def synth_frames(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """(id) → (media_ref='vid://id', payload=SSVF frame container) whose
    frame ``j`` is a solid 4×4 PPM of gray level ``(id*31 + j*7) % 251``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, blobs = [], []
            for i in pdf[id_col].astype("int64"):
                p = frame_params(int(i))
                frames = []
                for j in range(p["n_frames"]):
                    img = np.full((4, 4, 3), frame_color(int(i), j), np.uint8)
                    frames.append(codecs.encode_ppm(img))
                refs.append(f"vid://{int(i)}")
                blobs.append(codecs.encode_frames(frames, fps=p["fps"]))
            yield pd.DataFrame({"media_ref": refs, "payload": blobs})

    return _ids(df, id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


def fp_wav_params(i: int, groups: int = 37) -> dict:
    """Fingerprint-fixture parameters for id ``i`` (mirrored in SQL).

    Audio CONTENT (the per-frame amplitude pattern) depends only on
    ``g = i % groups``; members of a group differ by an integer volume
    scale ``k`` and sample rate — different payload bytes, same
    energy-delta fingerprint (scaling multiplies every frame energy by
    k²). The planted structure audio_fingerprint + phash_dedup must
    recover, exactly the jpeg-quad pattern on audio."""
    g = i % groups
    return {
        "g": g,
        "nf": 8 + g % 5,                        # frames of 8 samples
        "k": 1 + (i // groups) % 4,             # volume scale
        "rate": 8000 + (i % 3) * 4000,
        # frame-t amplitude: mixes g multiplicatively with t so distinct
        # groups get distinct comparison patterns (max 256*11*4 < 32768)
        "amps": [
            256 * (1 + ((g * (t + 2) + t) % 11)) for t in range(8 + g % 5)
        ],
    }


def synth_fp_wav(
    df: DataFrame, id_col: str = "event_id", groups: int = 37
) -> DataFrame:
    """(id) → (media_ref='afp://id', payload=16-bit WAV): frame ``t`` is
    8 samples of a ±k·amps[t] square wave (fp_wav_params)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, blobs = [], []
            for i in pdf[id_col].astype("int64"):
                p = fp_wav_params(int(i), groups)
                s = np.empty(p["nf"] * 8, dtype=np.int16)
                for t, a in enumerate(p["amps"]):
                    s[t * 8 : (t + 1) * 8 : 2] = p["k"] * a
                    s[t * 8 + 1 : (t + 1) * 8 : 2] = -p["k"] * a
                refs.append(f"afp://{int(i)}")
                blobs.append(codecs.encode_wav(s, p["rate"]))
            yield pd.DataFrame({"media_ref": refs, "payload": blobs})

    return _ids(df, id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


def split_image_params(i: int) -> dict:
    """Left/right split-image parameters for id ``i`` (mirrored in SQL)."""
    return {
        "w": 6 + (i % 5) * 2,                   # even width 6..14
        "h": 4 + (i % 3) * 2,                   # height 4..8
        "left": (i * 3) % 251,
        "right": (i * 7) % 251,
    }


def synth_split_image(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """(id) → (media_ref='img://id', payload=binary PPM): left half gray
    level ``left``, right half ``right`` (r=g=b, so channel means are
    exact integers)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, blobs = [], []
            for i in pdf[id_col].astype("int64"):
                p = split_image_params(int(i))
                img = np.empty((p["h"], p["w"], 3), np.uint8)
                img[:, : p["w"] // 2] = p["left"]
                img[:, p["w"] // 2 :] = p["right"]
                refs.append(f"img://{int(i)}")
                blobs.append(codecs.encode_ppm(img))
            yield pd.DataFrame({"media_ref": refs, "payload": blobs})

    return _ids(df, id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


def quad_image_params(i: int, group_mod: int = 23) -> dict:
    """Quadrant-image parameters for id ``i`` (mirrored in SQL).

    Pixel CONTENT depends only on ``g = i % group_mod`` while SIZE and
    ENCODING depend on ``i`` itself — so ids sharing ``g`` are perceptual
    duplicates (same quadrant gray levels) whose payload bytes differ
    (different dimensions, alternating PPM/BMP containers). That is the
    planted structure the perceptual-hash dedup operator must recover."""
    g = i % group_mod
    return {
        "g": g,
        "w": 6 + (i % 5) * 2,                   # even width 6..14
        "h": 4 + (i % 3) * 2,                   # even height 4..8
        "c00": (g * 5) % 251,
        "c01": (g * 11 + 3) % 251,
        "c10": (g * 17 + 7) % 251,
        "c11": (g * 23 + 13) % 251,
        "container": i % 4,          # rotate PPM/BMP/PNG/interlaced-PNG
    }


# payload containers rotated by id: PPM (raw), BMP (raw, different byte
# layout), PNG (REAL compressed web format — the stdlib-zlib codec), and
# Adam7-INTERLACED PNG with mixed per-row filters (the general decode
# path). The rotation proves every dedup/metadata operator is
# container-blind; the oracle never sees the container — only content.
_QUAD_ENCODERS = (
    codecs.encode_ppm,
    codecs.encode_bmp,
    codecs.encode_png,
    lambda img: codecs.encode_png(
        img, filter_type="mixed", interlace=True
    ),
)


def _quad_payload(p: dict, _cache: dict = {}) -> bytes:
    """Encoded payload for quad params ``p``, memoized on the content
    tuple: fixture synthesis over N rows costs O(distinct payloads)
    encodes (≤ sizes × groups × containers — a few thousand) plus dict
    lookups, not N per-row image builds. The memo made the sf0.1 phash
    bench row fixture-synthesis-bound before; see BENCH notes."""
    key = (
        p["w"], p["h"], p["c00"], p["c01"], p["c10"], p["c11"],
        p["container"],
    )
    blob = _cache.get(key)
    if blob is None:
        w2, h2 = p["w"] // 2, p["h"] // 2
        img = np.empty((p["h"], p["w"], 3), np.uint8)
        img[:h2, :w2] = p["c00"]
        img[:h2, w2:] = p["c01"]
        img[h2:, :w2] = p["c10"]
        img[h2:, w2:] = p["c11"]
        blob = _QUAD_ENCODERS[p["container"]](img)
        _cache[key] = blob
    return blob


def synth_quad_image(
    df: DataFrame, id_col: str = "event_id", group_mod: int = 23
) -> DataFrame:
    """(id) → (media_ref='img://id', payload): four solid gray quadrants
    (r=g=b) whose levels derive from ``i % group_mod`` only; width/height
    and PPM-vs-BMP derive from ``i``. Even dims keep quadrant boundaries
    on the 2×2 block-mean grid, so every cell mean is an exact integer."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_ref": [f"img://{int(i)}" for i in ids],
                    "payload": [
                        _quad_payload(quad_image_params(int(i), group_mod))
                        for i in ids
                    ],
                }
            )

    return _ids(df, id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


def jpeg_quad_params(i: int, group_mod: int = 23) -> dict:
    """JPEG quadrant-image parameters for id ``i`` (mirrored in SQL).

    Content depends only on ``g = i % group_mod``; the ENCODING rotates
    between baseline sequential 4:4:4 and progressive (SOF2) by ``i``.
    Size is FIXED (12×8): JPEG is lossy, so unlike the lossless quad
    fixture the cell means are not integer-exact — but sequential and
    progressive 4:4:4 code the SAME quantized coefficients, so same-g
    payloads decode bit-identically and the perceptual-hash GROUPING
    (rep_ref, is_dup) is a pure function of the id arithmetic that a SQL
    oracle can replicate without computing any hash. Distinct groups'
    quadrant levels differ by ≥5 gray levels while q90 block-mean error
    is ≤2, so no cross-group hash collision (asserted in tests)."""
    g = i % group_mod
    return {
        "g": g,
        "c00": (g * 5) % 251,
        "c01": (g * 11 + 3) % 251,
        "c10": (g * 17 + 7) % 251,
        "c11": (g * 23 + 13) % 251,
        "progressive": i % 2,
    }


def _jpeg_quad_payload(p: dict, _cache: dict = {}) -> bytes:
    key = (p["c00"], p["c01"], p["c10"], p["c11"], p["progressive"])
    blob = _cache.get(key)
    if blob is None:
        img = np.empty((8, 12, 3), np.uint8)
        img[:4, :6] = p["c00"]
        img[:4, 6:] = p["c01"]
        img[4:, :6] = p["c10"]
        img[4:, 6:] = p["c11"]
        blob = (
            codecs.encode_jpeg_progressive(img, 90)
            if p["progressive"]
            else codecs.encode_jpeg(img, 90, "444")
        )
        _cache[key] = blob
    return blob


def synth_jpeg_quad_image(
    df: DataFrame, id_col: str = "event_id", group_mod: int = 23
) -> DataFrame:
    """(id) → (media_ref='img://id', payload=REAL JPEG): quadrant images
    whose bytes rotate baseline-sequential / progressive encodings of the
    same per-group content (:func:`jpeg_quad_params`)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_ref": [f"img://{int(i)}" for i in ids],
                    "payload": [
                        _jpeg_quad_payload(jpeg_quad_params(int(i), group_mod))
                        for i in ids
                    ],
                }
            )

    return _ids(df, id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


def near_quad_image_params(i: int, groups: int = 150) -> dict:
    """Near-duplicate variant of :func:`quad_image_params` (mirrored in
    SQL): content group ``g = i % groups`` with ``groups < 251`` so color
    tuples never collide across groups, plus a one-gray-level perturbation
    of the bottom-right quadrant on alternating group members
    (``(i // groups) % 2``). Same-group members therefore agree on >=3 of
    the four 2x2 block-mean cells — near-dups under cell-hamming<=1 —
    while exact equality holds only between same-parity members."""
    g = i % groups
    p = quad_image_params(g, group_mod=groups)
    p["g"] = g
    p["w"] = 6 + (i % 5) * 2
    p["h"] = 4 + (i % 3) * 2
    p["c11"] = p["c11"] + ((i // groups) % 2)
    p["container"] = i % 4
    return p


def synth_near_quad_image(
    df: DataFrame, id_col: str = "event_id", groups: int = 150
) -> DataFrame:
    """(id) → (media_ref='img://id', payload): quadrant images with the
    planted NEAR-duplicate structure of :func:`near_quad_image_params`."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_ref": [f"img://{int(i)}" for i in ids],
                    "payload": [
                        _quad_payload(near_quad_image_params(int(i), groups))
                        for i in ids
                    ],
                }
            )

    return _ids(df, id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


def mp3_params(i: int) -> dict:
    """Closed-form MP3 stream parameters for id ``i`` (mirrored in SQL):
    3..7 frames at 44.1 kHz; odd ids alternate 128/192 kbps starting at
    128 (VBR), even ids are constant 128 kbps; ID3v2 tag of 0/11/22
    payload bytes exercises the parser's tag skip."""
    n = 3 + (i % 5)
    return {
        "n_frames": n,
        "vbr": i % 2 == 1,
        "id3": (i % 3) * 11,
        "rate": 44100,
    }


def synth_mp3(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """(id) → (media_ref='mp3://id', payload=valid MPEG-1 Layer III
    frame sequence). Frame j's bitrate is 192 when the stream is VBR and
    j is odd, else 128 — so n_frames, bitrate_avg, vbr and duration_ms
    are all integer arithmetic on the id (see mp3_params)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, blobs = [], []
            for i in pdf[id_col].astype("int64"):
                p = mp3_params(int(i))
                specs = [
                    (192 if p["vbr"] and j % 2 == 1 else 128, p["rate"], 0)
                    for j in range(p["n_frames"])
                ]
                refs.append(f"mp3://{int(i)}")
                blobs.append(codecs.encode_mp3(specs, id3_size=p["id3"]))
            yield pd.DataFrame({"media_ref": refs, "payload": blobs})

    return _ids(df, id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


def mp4_params(i: int) -> dict:
    """Closed-form MP4 track parameters for id ``i`` (mirrored in SQL):
    2..7 samples, 40 ms apart; sample k is 3+((i+7k) mod 9) bytes of the
    constant value (i+11k) mod 251."""
    return {
        "n_samples": 2 + (i % 6),
        "delta": 40,
        "timescale": 1000,
        "width": 16 + (i % 4) * 16,
        "height": 16 + (i % 3) * 16,
        "kind": "vide" if i % 2 == 0 else "soun",
    }


def mp4_sample_bytes(i: int, k: int) -> bytes:
    """Sample k of stream i: constant-byte payload (size and value are
    both closed-form, so stride sampling is SQL-derivable)."""
    size = 3 + (i + 7 * k) % 9
    return bytes([(i + 11 * k) % 251]) * size


def synth_mp4(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """(id) → (media_ref='mp4://id', payload=minimal ISO BMFF file with
    a full stbl sample index over constant-byte samples)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, blobs = [], []
            for i in pdf[id_col].astype("int64"):
                p = mp4_params(int(i))
                samples = [
                    mp4_sample_bytes(int(i), k)
                    for k in range(p["n_samples"])
                ]
                refs.append(f"mp4://{int(i)}")
                blobs.append(
                    codecs.encode_mp4(
                        samples,
                        timescale=p["timescale"],
                        sample_delta=p["delta"],
                        width=p["width"],
                        height=p["height"],
                        kind=p["kind"],
                    )
                )
            yield pd.DataFrame({"media_ref": refs, "payload": blobs})

    return _ids(df, id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)

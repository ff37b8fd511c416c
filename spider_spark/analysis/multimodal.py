"""Multimodal column handling — opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns (or ``media_ref``
pointers in the crawl documents' span arrays) with typed metadata structs.
The Spark-side plumbing here — schemas, Arrow batch shapes, mapInPandas
iterator contracts, partition sizing — is real and tested. Decode status:

  - REAL for uncompressed BMP and binary PPM/PGM payloads: pure-numpy
    codecs (``analysis.codecs``) run inside the Arrow batches — true
    width/height and grid block-mean RGB features, corrupt payloads
    degrade to an ``err`` column instead of failing the stage.
  - REAL for PCM RIFF/WAVE audio (8/16-bit): struct/numpy chunk-walking
    decoder, scalar features (rms/peak/zero-crossings), err-degrading.
  - REAL frame sampling over the SSVF seekable frame container
    (``codecs.encode_frames``): index-first layout, so stride sampling
    seeks to sampled frames instead of scanning the blob.
  - REAL nearest-neighbor resize (pure numpy index math) feeding
    block-mean features.
  - REAL for PNG (color types 0/2/3/4/6, 8- and 16-bit, sequential and
    Adam7-interlaced): pure stdlib-zlib + numpy codec
    (``codecs.decode_png``) — the most common lossless web format
    decodes for real; 16-bit samples reduce to the high byte.
  - REAL for baseline sequential JPEG (``codecs.decode_jpeg``): marker
    walk, canonical Huffman, dequant + float IDCT, general Hi/Vi chroma
    upsampling (4:4:4/4:2:2/4:2:0), restart markers — the dominant web
    image format decodes for real; arithmetic/12-bit degrade to an err
    row.
  - REAL for progressive (SOF2) JPEG: per-scan spectral selection and
    successive approximation (DC/AC first + refinement passes, EOB runs)
    into per-component coefficient stores, one vectorized IDCT at EOI.
  - REAL at the CONTAINER level for MP3 and MP4/ISO-BMFF: frame-header
    walk with ID3v2 skip (``codecs.parse_mp3`` — frame count, bitrate
    stats, duration) and box-tree + stbl sample-table parse
    (``codecs.parse_mp4`` / ``sample_mp4`` — track kind/dims/timescale
    and byte-exact per-sample (offset, size, timestamp) stride
    sampling). The codec PAYLOAD (MP3 spectral data, H.264/AAC samples)
    is the one layer that genuinely needs codec libraries absent from
    this container — those bytes pass through opaque; corrupt
    containers surface as an err row. Ref-only calls can still request
    the deterministic ``fake=True`` pseudo-features to exercise
    downstream stages end-to-end.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary column
never materializes per-partition; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (large rows) and size
``spark.sql.files.maxPartitionBytes`` so one task's batch of payloads fits
executor memory.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "media_ref string, media_kind string, n_bytes long, sha256 string"
)
IMAGE_FEATURE_SCHEMA = (
    "media_ref string, width int, height int, features array<float>"
)
AUDIO_FEATURE_SCHEMA = (
    "media_ref string, n_samples int, sample_rate int, n_channels int, "
    "rms_x32768 long, peak_x32768 long, zero_crossings long, err string"
)
AUDIO_FP_SCHEMA = "media_ref string, afp long, n_frames int, err string"
FRAME_SAMPLE_SCHEMA = (
    "media_ref string, frame_idx int, ts_milli long, width int, height int, "
    "mean_pix long, err string"
)
RESIZED_FEATURE_SCHEMA = (
    "media_ref string, orig_width int, orig_height int, width int, "
    "height int, f00 long, f01 long, f10 long, f11 long, err string"
)
MP3_META_SCHEMA = (
    "media_ref string, n_frames int, sample_rate int, bitrate_avg int, "
    "vbr_int int, duration_ms long, err string"
)
MP4_SAMPLE_SCHEMA = (
    "media_ref string, sample_idx int, ts_milli long, n_bytes int, "
    "byte_val int, err string"
)


def _group_by_shape(imgs: list) -> dict:
    """index lists of non-None images grouped by ndarray shape — the
    stacking key for the vectorized per-shape feature paths."""
    groups: dict = {}
    for i, img in enumerate(imgs):
        if img is not None:
            groups.setdefault(img.shape, []).append(i)
    return groups


def media_metadata(df: DataFrame, ref_col: str = "media_ref", payload_col: str | None = None) -> DataFrame:
    """Typed metadata extraction over media rows via mapInPandas.

    With ``payload_col``: n_bytes/sha256 of the payload itself (the column
    must exist — a misspelled name raising here beats silently hashing the
    ref instead). Without: deterministic ref-derived metadata (n_bytes=0,
    sha256 of the ref string) for payload-less sidecar rows. Only the
    needed columns enter the Arrow channel."""
    if payload_col and payload_col not in df.columns:
        raise ValueError(f"payload column {payload_col!r} not in {df.columns}")
    cols = [ref_col, payload_col] if payload_col else [ref_col]
    df = df.select(*cols)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf[ref_col].astype(str)
            kind = refs.str.extract(r"^([a-z]+)://", expand=False).fillna("unknown")
            if payload_col and payload_col in pdf:
                payload = pdf[payload_col]
                n_bytes = payload.map(lambda b: len(b) if b is not None else 0)
                sha256 = payload.map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                )
            else:
                n_bytes = pd.Series(0, index=pdf.index)
                sha256 = refs.map(
                    lambda r: hashlib.sha256(r.encode()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "media_kind": kind,
                    "n_bytes": n_bytes.astype("int64"),
                    "sha256": sha256,
                }
            )

    return df.mapInPandas(extract, schema=MEDIA_META_SCHEMA)


def decode_image_features(
    df: DataFrame,
    ref_col: str = "media_ref",
    payload_col: str | None = None,
    n_features: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Image decode + feature extraction over Arrow-batched mapInPandas.

    With ``payload_col`` set, payloads are REALLY decoded with the
    pure-numpy codecs in ``analysis.codecs`` (uncompressed 24/32-bit BMP,
    binary PPM/PGM, PNG incl. Adam7/16-bit via stdlib zlib, and baseline
    sequential + progressive JPEG — all decodable without any image
    library in this container): real
    width/height plus a block-mean RGB feature vector of EXACTLY
    ``n_features`` values — the first n_features of the 3·grid² cell
    means, grid being the smallest ≥2 with 3·grid² ≥ n_features — so real
    and fake paths emit the same feature dimension and downstream
    zip_with consumers never see ragged arrays. Undecodable or null
    payloads yield a row with null width/height/features and the reason in
    ``err`` — a 100-TB crawl always contains corrupt bytes, and one bad
    payload must not kill the stage. MP3/MP4 payloads are not images and
    surface here as err='unrecognized image format' (their container
    parse lives in decode_mp3_features / sample_mp4_payloads).

    Without a payload column, ``fake=True`` keeps the former stub: a
    deterministic byte-hash pseudo-feature vector per ref so downstream
    plumbing is exercisable from refs alone; fake=False raises."""
    from spider_spark.analysis import codecs

    grid = (
        max(2, int(math.ceil(math.sqrt(n_features / 3.0))))
        if payload_col
        else None
    )

    if payload_col is not None:

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                refs = pdf[ref_col].astype(str)
                imgs, errs = codecs.decode_batch(list(pdf[payload_col]))
                widths = [None] * len(imgs)
                heights = [None] * len(imgs)
                feats: list = [None] * len(imgs)
                for shape, idxs in _group_by_shape(imgs).items():
                    fs = codecs.block_mean_batch(
                        np.stack([imgs[i] for i in idxs]), grid
                    )
                    for k, i in enumerate(idxs):
                        widths[i] = shape[1]
                        heights[i] = shape[0]
                        feats[i] = fs[k].tolist()[:n_features]
                yield pd.DataFrame(
                    {
                        "media_ref": refs,
                        "width": pd.Series(widths, index=pdf.index, dtype="Int32"),
                        "height": pd.Series(heights, index=pdf.index, dtype="Int32"),
                        "features": feats,
                        "err": pd.Series(errs, index=pdf.index, dtype=object),
                    }
                )

        return df.select(ref_col, payload_col).mapInPandas(
            decode, schema=IMAGE_FEATURE_SCHEMA + ", err string"
        )

    if not fake:
        raise NotImplementedError(
            "ref-only decode has no payload bytes to decode; either supply "
            "payload_col (real numpy BMP/PPM decode) or pass fake=True for "
            "the deterministic stub"
        )

    def decode_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf[ref_col].astype(str)
            feats, widths, heights = [], [], []
            for r in refs:
                d = hashlib.blake2b(r.encode(), digest_size=4 + n_features).digest()
                widths.append(64 + d[0])
                heights.append(64 + d[1])
                feats.append(
                    (np.frombuffer(d[4:], dtype=np.uint8).astype(np.float32) / 255.0).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": pd.Series(widths, index=pdf.index, dtype="int32"),
                    "height": pd.Series(heights, index=pdf.index, dtype="int32"),
                    "features": feats,
                }
            )

    return df.select(ref_col).mapInPandas(decode_fake, schema=IMAGE_FEATURE_SCHEMA)


def decode_audio_features(
    df: DataFrame, ref_col: str = "media_ref", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode + scalar features over Arrow-batched mapInPandas.

    PCM RIFF/WAVE (8/16-bit) payloads are decoded with the pure-struct/numpy
    codec in ``analysis.codecs`` — no audio library needed.  Emits sample
    geometry plus rms/peak (scaled ×32768 and rounded to integers so the
    values are exact for PCM-derived fixtures and portable to an integer
    SQL oracle) and the zero-crossing count.  Undecodable payloads degrade
    to an ``err`` row, never a stage failure."""
    from spider_spark.analysis import codecs

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_ref", "n_samples", "sample_rate", "n_channels",
                "rms_x32768", "peak_x32768", "zero_crossings", "err")}
            for ref, b in zip(pdf[ref_col].astype(str), pdf[payload_col]):
                out["media_ref"].append(ref)
                try:
                    if b is None:
                        raise ValueError("null payload")
                    x, rate = codecs.decode_wav(bytes(b))
                    f = codecs.audio_features(x, rate)
                    out["n_samples"].append(f["n_samples"])
                    out["sample_rate"].append(f["sample_rate"])
                    out["n_channels"].append(f["n_channels"])
                    out["rms_x32768"].append(round(f["rms"] * 32768))
                    out["peak_x32768"].append(round(f["peak"] * 32768))
                    out["zero_crossings"].append(f["zero_crossings"])
                    out["err"].append(None)
                except (ValueError, struct.error, IndexError) as e:
                    for k in ("n_samples", "sample_rate", "n_channels",
                              "rms_x32768", "peak_x32768", "zero_crossings"):
                        out[k].append(None)
                    out["err"].append(str(e)[:200])
            yield pd.DataFrame(
                {
                    "media_ref": out["media_ref"],
                    "n_samples": pd.Series(out["n_samples"], dtype="Int32"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                    "n_channels": pd.Series(out["n_channels"], dtype="Int32"),
                    "rms_x32768": pd.Series(out["rms_x32768"], dtype="Int64"),
                    "peak_x32768": pd.Series(out["peak_x32768"], dtype="Int64"),
                    "zero_crossings": pd.Series(
                        out["zero_crossings"], dtype="Int64"
                    ),
                    "err": pd.Series(out["err"], dtype=object),
                }
            )

    return df.select(ref_col, payload_col).mapInPandas(
        decode, schema=AUDIO_FEATURE_SCHEMA
    )


def audio_fingerprint(
    df: DataFrame,
    ref_col: str = "media_ref",
    payload_col: str = "payload",
    frame: int = 8,
) -> DataFrame:
    """Scale-invariant audio fingerprint (the Haitsma/Kalker
    energy-delta idea at its integer-exact core): decode PCM, split into
    ``frame``-sample windows, per-window energy in EXACT int64 on the
    raw integer samples, fingerprint bit t = [E(t+1) > E(t)] (strictly
    greater — ties are 0, a pinned contract), packed little-endian into
    an int64 with the frame count in the high byte so different-length
    clips can never collide. Uniform volume scaling multiplies every
    energy by k², leaving every comparison — and the fingerprint —
    unchanged: the same clip at different volumes (different bytes)
    dedupes, like image phash across containers.

    Exactness: int16 samples round-trip exactly through the decoder's
    float32 /32768 normalization (power-of-two division), so energies
    are integers and the fingerprint is bit-identical on any engine —
    an integer SQL oracle replicates it arithmetically. One mapInPandas
    scan; only the 8-byte fingerprint shuffles downstream."""
    from spider_spark.analysis import codecs

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, fps, nfs, errs = [], [], [], []
            for ref, b in zip(pdf[ref_col].astype(str), pdf[payload_col]):
                refs.append(ref)
                try:
                    if b is None:
                        raise ValueError("null payload")
                    x, _rate = codecs.decode_wav(bytes(b))
                    mono = x[:, 0] if x.ndim == 2 else x
                    ints = np.rint(mono * 32768.0).astype(np.int64)
                    n = len(ints) // frame
                    e = (ints[: n * frame].reshape(n, frame) ** 2).sum(
                        axis=1
                    )
                    gt = e[1:] > e[:-1]
                    v = 0
                    for t in range(min(len(gt), 48)):
                        if gt[t]:
                            v |= 1 << t
                    fps.append(v | (min(n, 127) << 56))
                    nfs.append(n)
                    errs.append(None)
                except (ValueError, struct.error, IndexError) as exc:
                    fps.append(None)
                    nfs.append(None)
                    errs.append(str(exc)[:200])
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "afp": pd.Series(fps, dtype="Int64"),
                    "n_frames": pd.Series(nfs, dtype="Int32"),
                    "err": pd.Series(errs, dtype=object),
                }
            )

    return df.select(ref_col, payload_col).mapInPandas(
        fp, schema=AUDIO_FP_SCHEMA
    )


def decode_mp3_features(
    df: DataFrame, ref_col: str = "media_ref", payload_col: str = "payload"
) -> DataFrame:
    """REAL MP3 container parse (frame-header walk, ID3v2 skip) over
    Arrow-batched mapInPandas: frame count, sample rate, integer-exact
    average bitrate, VBR flag, and duration — the duration/bitrate
    filter columns a training-data pipeline screens audio with, no codec
    library involved (``codecs.parse_mp3``; spectral payload decode is
    out of scope per the module docstring).  Undecodable payloads
    degrade to an ``err`` row, never a stage failure."""
    from spider_spark.analysis import codecs

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, b in zip(pdf[ref_col].astype(str), pdf[payload_col]):
                try:
                    if b is None:
                        raise ValueError("null payload")
                    f = codecs.parse_mp3(bytes(b))
                    rows.append(
                        (ref, f["n_frames"], f["sample_rate"],
                         f["bitrate_avg"], int(f["vbr"]),
                         f["duration_ms"], None)
                    )
                except (ValueError, struct.error, IndexError) as e:
                    rows.append(
                        (ref, None, None, None, None, None, str(e)[:200])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "n_frames", "sample_rate", "bitrate_avg",
                    "vbr_int", "duration_ms", "err",
                ],
            ).astype(
                {
                    "n_frames": "Int32",
                    "sample_rate": "Int32",
                    "bitrate_avg": "Int32",
                    "vbr_int": "Int32",
                    "duration_ms": "Int64",
                }
            )

    return df.select(ref_col, payload_col).mapInPandas(
        parse, schema=MP3_META_SCHEMA
    )


def sample_mp4_payloads(
    df: DataFrame,
    ref_col: str = "media_ref",
    payload_col: str = "payload",
    stride: int = 1,
    limit: int | None = None,
) -> DataFrame:
    """Stride sampling over ISO BMFF (MP4) payloads via the stbl sample
    tables (``codecs.sample_mp4``): one output row per sampled sample,
    carrying its timestamp, byte length, and first byte value (exact for
    the constant-byte fixtures; a real pipeline would hand the bytes to
    a codec here).  The box index makes stride sampling touch only the
    sampled byte ranges — the seek-not-scan property at 100 TB.
    Explodes rows: output cardinality is sum(ceil(n_samples/stride))."""
    from spider_spark.analysis import codecs

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, b in zip(pdf[ref_col].astype(str), pdf[payload_col]):
                try:
                    if b is None:
                        raise ValueError("null payload")
                    for idx, ts_ms, sb in codecs.sample_mp4(
                        bytes(b), stride=stride, limit=limit
                    ):
                        rows.append(
                            (ref, idx, ts_ms, len(sb),
                             sb[0] if sb else None, None)
                        )
                except (ValueError, struct.error, IndexError) as e:
                    rows.append((ref, None, None, None, None, str(e)[:200]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "sample_idx", "ts_milli", "n_bytes",
                    "byte_val", "err",
                ],
            ).astype(
                {
                    "sample_idx": "Int32",
                    "ts_milli": "Int64",
                    "n_bytes": "Int32",
                    "byte_val": "Int32",
                }
            )

    return df.select(ref_col, payload_col).mapInPandas(
        sample, schema=MP4_SAMPLE_SCHEMA
    )


def sample_video_frames(
    df: DataFrame,
    ref_col: str = "media_ref",
    payload_col: str = "payload",
    stride: int = 1,
    limit: int | None = None,
) -> DataFrame:
    """Frame sampling over seekable frame containers (one output row per
    sampled frame) via mapInPandas.

    The container's index-first layout (``codecs.encode_frames``) means
    stride sampling touches only the sampled frames' byte ranges — the
    seek-not-scan property a real video container needs at 100 TB.  Each
    sampled frame is decoded with the pure-numpy image codecs; ``mean_pix``
    is the rounded mean pixel value (exact for the solid-color fixtures).
    Explodes rows, so output cardinality is sum(ceil(n_frames/stride))."""
    from spider_spark.analysis import codecs

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, b in zip(pdf[ref_col].astype(str), pdf[payload_col]):
                try:
                    if b is None:
                        raise ValueError("null payload")
                    for idx, ts, fb in codecs.sample_frames(
                        bytes(b), stride=stride, limit=limit
                    ):
                        img = codecs.decode_any(fb)
                        rows.append(
                            (ref, idx, round(ts * 1000), img.shape[1],
                             img.shape[0], round(float(img.mean())), None)
                        )
                except (ValueError, struct.error, IndexError) as e:
                    rows.append(
                        (ref, None, None, None, None, None, str(e)[:200])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "frame_idx", "ts_milli", "width", "height",
                    "mean_pix", "err",
                ],
            ).astype(
                {
                    "frame_idx": "Int32", "ts_milli": "Int64",
                    "width": "Int32", "height": "Int32", "mean_pix": "Int64",
                }
            )

    return df.select(ref_col, payload_col).mapInPandas(
        sample, schema=FRAME_SAMPLE_SCHEMA
    )


def resize_image_features(
    df: DataFrame,
    ref_col: str = "media_ref",
    payload_col: str = "payload",
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """REAL decode → nearest-neighbor resize → 2×2 block-mean features.

    The resize is pure numpy index math (``codecs.resize_nearest``,
    half-pixel-center sampling).  Features are the four 2×2-grid cell means
    averaged over channels, scaled back to 0..255 integers (exact for
    r=g=b payloads, rounded otherwise) so a SQL oracle can recompute them."""
    from spider_spark.analysis import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf[ref_col].astype(str)
            imgs, errs = codecs.decode_batch(list(pdf[payload_col]))
            rows: list = [None] * len(imgs)
            for i, e in enumerate(errs):
                if e is not None:
                    rows[i] = (
                        refs.iloc[i], None, None, None, None, None, None,
                        None, None, e,
                    )
            for shape, idxs in _group_by_shape(imgs).items():
                h, w = shape[0], shape[1]
                stack = np.stack([imgs[i] for i in idxs])
                # same half-pixel-center index math as resize_nearest,
                # applied to the whole same-shape stack at once
                ys = np.minimum(
                    ((np.arange(height) + 0.5) * h / height).astype(np.int64),
                    h - 1,
                )
                xs = np.minimum(
                    ((np.arange(width) + 0.5) * w / width).astype(np.int64),
                    w - 1,
                )
                resized = stack[:, ys][:, :, xs]
                fs = codecs.block_mean_batch(resized, 2)
                # float64 ×255 + rint matches the old per-cell
                # round(float(mean)*255.0) (both round half-even)
                cells = np.rint(
                    fs.reshape(len(idxs), 4, 3).mean(axis=2).astype(np.float64)
                    * 255.0
                ).astype(np.int64)
                for k, i in enumerate(idxs):
                    rows[i] = (
                        refs.iloc[i], w, h, width, height,
                        int(cells[k, 0]), int(cells[k, 1]),
                        int(cells[k, 2]), int(cells[k, 3]), None,
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "orig_width", "orig_height", "width",
                    "height", "f00", "f01", "f10", "f11", "err",
                ],
            ).astype(
                {
                    "orig_width": "Int32", "orig_height": "Int32",
                    "width": "Int32", "height": "Int32", "f00": "Int64",
                    "f01": "Int64", "f10": "Int64", "f11": "Int64",
                }
            )

    return df.select(ref_col, payload_col).mapInPandas(
        run, schema=RESIZED_FEATURE_SCHEMA
    )


PHASH_SCHEMA = "media_ref string, phash long, err string"


def image_phash(
    df: DataFrame,
    ref_col: str = "media_ref",
    payload_col: str = "payload",
    grid: int = 2,
) -> DataFrame:
    """REAL decode → block-mean perceptual hash (Yang et al. 2006 shape).

    Each cell of the ``grid×grid`` block-mean feature is averaged over
    channels and rounded to 0..255, then packed big-endian into one int64
    (``grid<=2`` fits 4 bytes) — a content hash that is invariant to the
    byte CONTAINER (PPM vs BMP) and, for block-aligned content, to image
    SIZE, which byte hashing (media_metadata's sha256) is not. Undecodable
    payloads degrade to an ``err`` row with a null hash.

    Scale: one Arrow-batched mapInPandas scan; the hash column is 8 bytes
    per image, so downstream dedup shuffles hashes, never payloads."""
    from spider_spark.analysis import codecs

    # 256^(grid^2) must fit int64, else the .astype('Int64') below would
    # overflow and kill the stage — the failure mode this module forbids
    assert grid * grid <= 7, "packed block-mean hash needs grid*grid <= 7"

    # pack weights: cell k contributes v·256^(n-1-k), same value the old
    # per-image ph = ph*256 + v loop produced
    weights = 256 ** np.arange(grid * grid - 1, -1, -1, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf[ref_col].astype(str)
            imgs, errs = codecs.decode_batch(list(pdf[payload_col]))
            ph: list = [None] * len(imgs)
            for idxs in _group_by_shape(imgs).values():
                fs = codecs.block_mean_batch(
                    np.stack([imgs[i] for i in idxs]), grid
                )
                cells = fs.reshape(len(idxs), grid * grid, 3).mean(axis=2)
                packed = (
                    np.rint(cells * 255.0).astype(np.int64) * weights
                ).sum(axis=1)
                for k, i in enumerate(idxs):
                    ph[i] = int(packed[k])
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "phash": pd.Series(ph, index=pdf.index, dtype="Int64"),
                    "err": pd.Series(errs, index=pdf.index, dtype=object),
                }
            )

    return df.select(ref_col, payload_col).mapInPandas(
        run, schema=PHASH_SCHEMA
    )


def phash_dedup(
    hashed: DataFrame, ref_col: str = "media_ref", hash_col: str = "phash"
) -> DataFrame:
    """(media_ref, phash, rep_ref, is_dup): group images by perceptual
    hash; each group keeps its min-ref image as the representative.

    Mirrors the text-side exact dedup (analysis/dedup.exact_duplicates)
    but on the decoded-content hash: cross-container and cross-size
    duplicates land in one group. Null hashes (undecodable payloads) stay
    singletons rather than clustering with each other — and they are split
    off BEFORE the window, not just masked after it: a corrupt-payload
    fraction of a 100-TB corpus would otherwise all hash-partition into
    one straggler task. One shuffle (on the 8-byte hash) for the decodable
    side; the null side is a shuffle-free projection unioned back."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = hashed.select(ref_col, hash_col)
    w = Window.partitionBy(hash_col)
    ok = (
        d.filter(F.col(hash_col).isNotNull())
        .withColumn("rep_ref", F.min(ref_col).over(w))
        .withColumn("is_dup", F.col(ref_col) != F.col("rep_ref"))
    )
    nulls = (
        d.filter(F.col(hash_col).isNull())
        .withColumn("rep_ref", F.col(ref_col))
        .withColumn("is_dup", F.lit(False))
    )
    return ok.unionByName(nulls)


def phash_near_dups(
    hashed: DataFrame,
    ref_col: str = "media_ref",
    hash_col: str = "phash",
    n_cells: int = 4,
) -> DataFrame:
    """(id_l, id_r, n_equal_cells): image near-dup pairs — at most ONE of
    the packed block-mean cells differs (cell-hamming <= 1).

    The media analog of SimHash's pigeonhole band trick
    (analysis/dedup.simhash_near_dups): two hashes agreeing on >= n-1 of n
    cells must agree on one of the n leave-one-out cell tuples, so the
    self-join is keyed on (band, remaining-cells tuple) — candidates are
    band-bucket-bounded, never all-pairs, and a band hit already PROVES
    >= n-1 equal cells, so no re-verification join is needed:
    n_equal_cells is n-1 plus whole-hash equality, both carried by the
    join itself. Cells are re-derived from the int64 hash with pure
    integer div/mod, so the whole operator stays in whole-stage codegen
    and has an exact SQL replica."""
    from pyspark.sql import functions as F

    cell = [
        F.expr(
            f"(cast({hash_col} as bigint) div "
            f"{256 ** (n_cells - 1 - k)}L) % 256"
        )
        for k in range(n_cells)
    ]
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ",", *[c.cast("string") for k, c in enumerate(cell) if k != b]
            ).alias("key"),
        )
        for b in range(n_cells)
    ]
    d = (
        hashed.filter(F.col(hash_col).isNotNull())
        .select(
            F.col(ref_col).alias("_id"),
            F.col(hash_col).alias("_ph"),
            F.explode(F.array(*bands)).alias("bk"),
        )
        .select("_id", "_ph", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    l, r = d.alias("l"), d.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_l"),
            F.col("r._id").alias("id_r"),
            (
                F.lit(n_cells - 1)
                + (F.col("l._ph") == F.col("r._ph")).cast("int")
            ).alias("_neq"),
        )
        .groupBy("id_l", "id_r")
        .agg(F.max("_neq").alias("n_equal_cells"))
    )

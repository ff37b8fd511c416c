"""Multimodal column handling — opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns (or ``media_ref``
pointers in the crawl documents' span arrays) with typed metadata structs.
The Spark-side plumbing here — schemas, Arrow batch shapes, mapInPandas
iterator contracts, partition sizing — is real and tested. Decode status:

  - REAL for uncompressed BMP and binary PPM/PGM payloads: pure-numpy
    codecs (``analysis.codecs``) run inside the Arrow batches — true
    width/height and grid block-mean RGB features, corrupt payloads
    degrade to an ``err`` column instead of failing the stage.
  - STUB for compressed formats (JPEG/PNG/audio/video): those need codec
    libraries absent from this container; such payloads surface as
    err='unrecognized image format'. Ref-only calls can still request the
    deterministic ``fake=True`` pseudo-features to exercise downstream
    stages end-to-end.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary column
never materializes per-partition; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (large rows) and size
``spark.sql.files.maxPartitionBytes`` so one task's batch of payloads fits
executor memory.
"""

from __future__ import annotations

import hashlib
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


def media_metadata(df: DataFrame, ref_col: str = "media_ref", payload_col: str | None = None) -> DataFrame:
    """Typed metadata extraction over media rows via mapInPandas."""

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
    binary PPM/PGM — the formats decodable without any image library in
    this container): real width/height plus a grid block-mean RGB feature
    vector (grid² = n_features // 3, min 2×2). Undecodable or null
    payloads yield a row with null width/height/features and the reason in
    ``err`` — a 100-TB crawl always contains corrupt bytes, and one bad
    payload must not kill the stage. JPEG/PNG etc. still need a codec
    library and surface as err='unrecognized image format'.

    Without a payload column, ``fake=True`` keeps the former stub: a
    deterministic byte-hash pseudo-feature vector per ref so downstream
    plumbing is exercisable from refs alone; fake=False raises."""
    from spider_spark.analysis import codecs

    grid = max(2, int((n_features // 3) ** 0.5)) if payload_col else None

    if payload_col is not None:

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                refs = pdf[ref_col].astype(str)
                widths, heights, feats, errs = [], [], [], []
                for b in pdf[payload_col]:
                    if b is None:
                        widths.append(None); heights.append(None)
                        feats.append(None); errs.append("null payload")
                        continue
                    try:
                        img = codecs.decode_any(bytes(b))
                        widths.append(img.shape[1])
                        heights.append(img.shape[0])
                        feats.append(
                            codecs.block_mean_features(img, grid).tolist()
                        )
                        errs.append(None)
                    except (ValueError, struct.error, IndexError) as e:
                        widths.append(None); heights.append(None)
                        feats.append(None); errs.append(str(e)[:200])
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

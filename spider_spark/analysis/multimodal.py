"""Multimodal column handling — opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns (or ``media_ref``
pointers in the crawl documents' span arrays) with typed metadata structs.
The Spark-side plumbing here — schemas, Arrow batch shapes, mapInPandas
iterator contracts, partition sizing — is real and tested; the actual
codec work (decode/resize/frame-sample) is STUBBED because no image/audio
libraries exist in this container:

  - ``decode_image`` raises NotImplementedError unless ``fake=True``, in
    which case it produces a deterministic fake feature vector from the
    payload bytes (stable across executors) so downstream stages are
    exercisable end-to-end.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary column
never materializes per-partition; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (large rows) and size
``spark.sql.files.maxPartitionBytes`` so one task's batch of payloads fits
executor memory.
"""

from __future__ import annotations

import hashlib
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
    n_features: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Image decode + feature extraction. STUB: real decoding needs an
    image library not present in this container. With ``fake=True`` a
    deterministic byte-hash pseudo-feature vector is produced so the
    Arrow plumbing, schema, and batch shape are fully exercised."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv, not available in this "
            "container; pass fake=True for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    return df.select(ref_col).mapInPandas(decode, schema=IMAGE_FEATURE_SCHEMA)

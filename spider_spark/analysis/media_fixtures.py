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

    return df.select(id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


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

    return df.select(id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)


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

    return df.select(id_col).mapInPandas(gen, schema=PAYLOAD_SCHEMA)

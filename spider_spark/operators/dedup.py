"""URL-seen-set dedup — reference R4/R6, plus the bloom sidecar scale path.

The reference keeps an exact in-memory ``Map[URL, Int]`` (Supervisor.scala:44)
consulted before every schedule (:212-213). At a 10^10-URL frontier the
engine's equivalent is:

  - ``seen`` as an append-only bucketed table (bucket = hash(url) % NB);
    each schedule event appends one row, so attempts == count(*) per url
    and no read-modify-write merge is ever needed
  - candidates drop seen urls via LEFT ANTI join (exact)
  - optional bloom pre-filter (north_rule): per-bucket bloom bitmaps built
    with applyInPandas (numpy bit ops), probed via a bucket-aligned
    cogroup — false positives only fall through to the exact anti-join,
    so the final set is still exact.

All url hashing happens JVM-side as ``xxhash64`` columns BEFORE any pandas
stage — the Python side only does numpy bit arithmetic on already-hashed
int64 batches (no per-row hashlib loops). The two probe hashes use seeds
independent of the bucket hash so that bucket assignment (hash(url) % NB)
does not correlate with bit positions inside the bucket's bitmap.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = (
    "bucket long, bitmap binary, n_bits long, n_hashes int, n_buckets long"
)

# xxhash64 seeds for the two bloom probe hashes (double-hashing scheme);
# distinct from the default-seed bucket hash
_H1_SEED = 101
_H2_SEED = 202


def with_bucket(df: DataFrame, num_buckets: int, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_buckets))
    )


def with_probe_hashes(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds _h1/_h2: two independent 64-bit hashes per url, computed in
    whole-stage codegen. _h2 is forced odd (full cycle mod power-of-two)."""
    return df.withColumn(
        "_h1", F.xxhash64(F.col(url_col), F.lit(_H1_SEED))
    ).withColumn(
        "_h2", F.expr(f"xxhash64({url_col}, {_H2_SEED}) | 1")
    )


def _probe_arrays(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    h1 = pdf["_h1"].to_numpy(dtype=np.int64).view(np.uint64)
    h2 = pdf["_h2"].to_numpy(dtype=np.int64).view(np.uint64)
    return h1, h2


def anti_join_seen(candidates: DataFrame, seen_urls: DataFrame) -> DataFrame:
    """Exact R4: drop candidates whose url appears in seen (duplicates on
    the right are fine — anti join only tests existence)."""
    return candidates.join(seen_urls.select("url"), "url", "left_anti")


# ----------------------------------------------------------- bloom sidecar
#
# Two build modes:
#   * build_blooms: size-adaptive one-shot build over the full seen set —
#     simple, but O(|seen|) every round, which is wrong at a 10^10 frontier.
#   * build_bloom_delta + merge_blooms: FIXED-geometry bitmaps (same
#     n_bits/n_hashes for every bucket, forever) so each round only hashes
#     its newly-seen urls and the per-bucket bitmaps merge by bitwise OR —
#     O(|delta|) per round, and the sidecar is an ordinary parquet table
#     checkpointed/restored with the rest of the crawl state.


def _set_bits(
    h1: np.ndarray, h2: np.ndarray, n_bits: int, n_hashes: int
) -> np.ndarray:
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    mask = np.uint64(n_bits - 1)  # n_bits is a power of two
    for k in range(n_hashes):
        idx = ((h1 + np.uint64(k) * h2) & mask).astype(np.int64)
        np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))
    return bits


def build_blooms(
    seen: DataFrame, num_buckets: int, fpp: float = 0.01
) -> DataFrame:
    """Build one bloom bitmap per bucket with grouped applyInPandas.

    seen must carry (url, bucket). Bitmap sizing is per-bucket from the
    actual row count, so hot buckets get bigger filters."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        n = max(len(pdf), 1)
        n_bits = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        n_bits = 1 << (n_bits - 1).bit_length()  # power of two
        n_hashes = max(1, int(round(n_bits / n * math.log(2))))
        h1, h2 = _probe_arrays(pdf)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitmap": [_set_bits(h1, h2, n_bits, n_hashes).tobytes()],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
                "n_buckets": [num_buckets],
            }
        )

    return (
        with_probe_hashes(seen.select("url", "bucket"))
        .groupBy("bucket")
        .applyInPandas(build, schema=BLOOM_SCHEMA)
    )


def build_bloom_delta(
    seen_delta: DataFrame, num_buckets: int, n_bits: int, n_hashes: int
) -> DataFrame:
    """Fixed-geometry bloom bitmaps for this round's newly-seen urls only.
    n_bits must be a power of two (mask-indexing); geometry must match all
    prior rounds' bitmaps for OR-merging."""
    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h1, h2 = _probe_arrays(pdf)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitmap": [_set_bits(h1, h2, n_bits, n_hashes).tobytes()],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
                "n_buckets": [num_buckets],
            }
        )

    return (
        with_probe_hashes(with_bucket(seen_delta.select("url"), num_buckets))
        .groupBy("bucket")
        .applyInPandas(build, schema=BLOOM_SCHEMA)
    )


def merge_blooms(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Bitwise-OR per-bucket merge of two fixed-geometry bloom tables
    (bucket-aligned cogroup; buckets present on one side pass through).

    Geometry (n_bits, n_hashes) must match per bucket: same-length bitmaps
    built with different n_hashes would merge silently and later yield
    false NEGATIVES when probed with the wrong hash count — seen urls
    classified definite-new and re-enqueued. Mismatch raises."""

    def orr(key, a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        if a.empty:
            return b
        if b.empty:
            return a
        if (
            int(a["n_bits"].iloc[0]) != int(b["n_bits"].iloc[0])
            or int(a["n_hashes"].iloc[0]) != int(b["n_hashes"].iloc[0])
            or int(a["n_buckets"].iloc[0]) != int(b["n_buckets"].iloc[0])
        ):
            raise ValueError(
                f"bloom geometry mismatch in bucket {key}: "
                f"{int(a['n_bits'].iloc[0])}x{int(a['n_hashes'].iloc[0])}"
                f"/{int(a['n_buckets'].iloc[0])}b vs "
                f"{int(b['n_bits'].iloc[0])}x{int(b['n_hashes'].iloc[0])}"
                f"/{int(b['n_buckets'].iloc[0])}b"
            )
        bits = np.frombuffer(a["bitmap"].iloc[0], dtype=np.uint8) | np.frombuffer(
            b["bitmap"].iloc[0], dtype=np.uint8
        )
        out = a.iloc[[0]].copy()
        out["bitmap"] = [bits.tobytes()]
        return out

    return (
        prev.groupBy("bucket")
        .cogroup(delta.groupBy("bucket"))
        .applyInPandas(orr, schema=BLOOM_SCHEMA)
    )


def bloom_prefilter(
    candidates: DataFrame, blooms: DataFrame, num_buckets: int
) -> DataFrame:
    """Drop candidates whose bucket bloom says definitely-unseen?  No —
    the other way: KEEP the definitely-unseen ones outright and the
    maybe-seen ones for the exact anti-join. Returns candidates annotated
    with ``maybe_seen`` so the caller can split:

        definite_new = out.filter(~maybe_seen)   # skips the big anti-join
        to_check     = out.filter(maybe_seen)    # exact anti-join on these

    Implemented as a bucket-aligned cogroup so each task sees one bucket's
    candidate rows + that bucket's single bitmap row (no bitmap
    duplication per candidate row, no broadcast of the full 10^10-scale
    bloom set)."""
    cand = with_bucket(candidates.drop("bucket"), num_buckets)
    out_cols = [f.name for f in cand.schema.fields]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    ) + ", maybe_seen boolean"
    cand = with_probe_hashes(cand)

    def probe(key, cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if bloom_pdf.empty or cand_pdf.empty:
            out = cand_pdf[out_cols].copy()
            out["maybe_seen"] = False
            return out
        bits = np.frombuffer(bloom_pdf["bitmap"].iloc[0], dtype=np.uint8)
        n_bits = int(bloom_pdf["n_bits"].iloc[0])
        n_hashes = int(bloom_pdf["n_hashes"].iloc[0])
        h1, h2 = _probe_arrays(cand_pdf)
        maybe = np.ones(len(cand_pdf), dtype=bool)
        mask = np.uint64(n_bits - 1)
        for k in range(n_hashes):
            idx = ((h1 + np.uint64(k) * h2) & mask).astype(np.int64)
            maybe &= (bits[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
        out = cand_pdf[out_cols].copy()
        out["maybe_seen"] = maybe
        return out

    return (
        cand.groupBy("bucket")
        .cogroup(blooms.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )

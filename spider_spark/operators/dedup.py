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
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = "bucket long, bitmap binary, n_bits long, n_hashes int"


def with_bucket(df: DataFrame, num_buckets: int, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_buckets))
    )


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


def _hash2(urls: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per url (double-hashing scheme).

    Process-stable (unlike Python ``hash``, which is salted per
    interpreter and would corrupt cross-executor bloom probes): derived
    from blake2b digests, vectorized via a single bytes buffer."""
    import hashlib

    h1 = np.empty(len(urls), dtype=np.uint64)
    h2 = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        d = hashlib.blake2b((u or "").encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1  # odd -> full cycle
    return h1, h2


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
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        h1, h2 = _hash2(pdf["url"])
        mask = np.uint64(n_bits - 1)  # n_bits is a power of two
        for k in range(n_hashes):
            idx = ((h1 + np.uint64(k) * h2) & mask).astype(np.int64)
            np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitmap": [bits.tobytes()],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
            }
        )

    return (
        seen.select("url", "bucket")
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
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        h1, h2 = _hash2(pdf["url"])
        mask = np.uint64(n_bits - 1)
        for k in range(n_hashes):
            idx = ((h1 + np.uint64(k) * h2) & mask).astype(np.int64)
            np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitmap": [bits.tobytes()],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
            }
        )

    return (
        with_bucket(seen_delta.select("url"), num_buckets)
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
        ):
            raise ValueError(
                f"bloom geometry mismatch in bucket {key}: "
                f"{int(a['n_bits'].iloc[0])}x{int(a['n_hashes'].iloc[0])} vs "
                f"{int(b['n_bits'].iloc[0])}x{int(b['n_hashes'].iloc[0])}"
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
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    ) + ", maybe_seen boolean"

    def probe(key, cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if bloom_pdf.empty or cand_pdf.empty:
            cand_pdf = cand_pdf.copy()
            cand_pdf["maybe_seen"] = False
            return cand_pdf
        bits = np.frombuffer(bloom_pdf["bitmap"].iloc[0], dtype=np.uint8)
        n_bits = int(bloom_pdf["n_bits"].iloc[0])
        n_hashes = int(bloom_pdf["n_hashes"].iloc[0])
        h1, h2 = _hash2(cand_pdf["url"])
        maybe = np.ones(len(cand_pdf), dtype=bool)
        mask = np.uint64(n_bits - 1)
        for k in range(n_hashes):
            idx = ((h1 + np.uint64(k) * h2) & mask).astype(np.int64)
            maybe &= (bits[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
        cand_pdf = cand_pdf.copy()
        cand_pdf["maybe_seen"] = maybe
        return cand_pdf

    return (
        cand.groupBy("bucket")
        .cogroup(blooms.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )

"""Cuckoo-style URL-seen sidecar — the second filter family of the
north rule's "partitioned bloom/cuckoo-filter URL-seen set".

Same contract and table discipline as the bloom sidecar
(operators/dedup.py): one filter row per partition bucket
(bucket = pmod(xxhash64(url), num_seen_buckets)), built incrementally per
round from the seen delta, merged against the previous round's checkpoint,
probed via a bucket-aligned cogroup. False positives only fall through to
the exact anti-join; false negatives are structurally impossible (every
member's fingerprint is either in one of its two candidate slots-buckets or
in the stash bitmap, and the probe checks all three).

Layout per partition bucket:
  * ``table``  — uint16 fingerprint array of ``n_ck * slots`` entries,
    two-choice partial-key cuckoo placement WITHOUT eviction chains
    (eviction is a sequential algorithm; batch insert here is pure
    vectorized numpy: group-rank placement per bucket, first at i1, the
    spill at i2). Slots fill compactly from index 0 — occupancy is the
    nonzero count.
  * ``stash``  — a small bloom bitmap for entries that found both buckets
    full. Keyed on (fingerprint, canonical bucket) only, so a merged-in
    fingerprint (whose original url hash is gone) stashes identically.

Partial-key property: i2 = i1 XOR (H(fp) & mask), an involution, so a
stored fingerprint at bucket j always has its alternate at j XOR H(fp) —
merge re-inserts delta fingerprints without knowing which choice they
originally took. Probing a url checks fp at i1, i2, and the stash.

Without eviction the table overflows to the stash earlier than a true
cuckoo filter would (two-choice d=2, b=slots fills ~80-90% before spill
instead of ~95%); the cost is a graceful false-positive-rate rise, never
an error. Deletion (the classic cuckoo advantage) is deliberately not
exposed — the reference's seen set (Supervisor.scala:44) is append-only.

All url hashing is JVM-side xxhash64 (with_probe_hashes); the pandas
stages only do numpy integer ops on already-hashed batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from spider_spark.operators.dedup import (
    _probe_arrays,
    with_bucket,
    with_probe_hashes,
)

CUCKOO_SCHEMA = (
    "bucket long, table binary, n_ck long, slots int, "
    "stash binary, stash_bits long, stash_hashes int, n_buckets long"
)

# multiplicative fingerprint hash for the alternate-bucket XOR (golden
# ratio 32-bit) and the two stash probe hashes — self-consistency is all
# that matters, these never leave this module
_FP_MULT = np.uint64(0x9E3779B1)
_S1_MULT = np.uint64(0xC2B2AE3D)
_S2_MULT = np.uint64(0x85EBCA6B)


def _fingerprints(h1: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the high bits of the url hash."""
    fp = (h1 >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _buckets(h1: np.ndarray, fp: np.ndarray, n_ck: int) -> tuple[np.ndarray, np.ndarray]:
    mask = np.uint64(n_ck - 1)
    i1 = h1 & mask
    i2 = i1 ^ (fp.astype(np.uint64) * _FP_MULT & mask)
    return i1.astype(np.int64), i2.astype(np.int64)


def _alt_bucket(j: np.ndarray, fp: np.ndarray, n_ck: int) -> np.ndarray:
    mask = np.uint64(n_ck - 1)
    return (j.astype(np.uint64) ^ (fp.astype(np.uint64) * _FP_MULT & mask)).astype(
        np.int64
    )


def _stash_idx(
    fp: np.ndarray, b1: np.ndarray, b2: np.ndarray, stash_bits: int, k: int
) -> np.ndarray:
    """k-th stash bit index for (fp, canonical bucket) — canonical =
    min(i1, i2) so probe (which knows i1,i2) and merge (which knows j and
    its alternate) agree."""
    canon = np.minimum(b1, b2).astype(np.uint64)
    fpu = fp.astype(np.uint64)
    h = fpu * _S1_MULT + canon * _S2_MULT + np.uint64(k) * (
        fpu * _S2_MULT | np.uint64(1)
    )
    return (h & np.uint64(stash_bits - 1)).astype(np.int64)


def _table_contains(
    table: np.ndarray, slots: int, b: np.ndarray, fp: np.ndarray
) -> np.ndarray:
    t = table.reshape(-1, slots)
    return (t[b] == fp[:, None]).any(axis=1)


def _stash_contains(
    stash: np.ndarray,
    fp: np.ndarray,
    b1: np.ndarray,
    b2: np.ndarray,
    stash_bits: int,
    stash_hashes: int,
) -> np.ndarray:
    hit = np.ones(len(fp), dtype=bool)
    for k in range(stash_hashes):
        idx = _stash_idx(fp, b1, b2, stash_bits, k)
        hit &= (stash[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
    return hit


def _stash_set(
    stash: np.ndarray,
    fp: np.ndarray,
    b1: np.ndarray,
    b2: np.ndarray,
    stash_bits: int,
    stash_hashes: int,
) -> None:
    for k in range(stash_hashes):
        idx = _stash_idx(fp, b1, b2, stash_bits, k)
        np.bitwise_or.at(stash, idx // 8, (1 << (idx % 8)).astype(np.uint8))


def _insert(
    table: np.ndarray,
    occ: np.ndarray,
    slots: int,
    fp: np.ndarray,
    b1: np.ndarray,
    b2: np.ndarray,
) -> np.ndarray:
    """Vectorized two-choice placement. Mutates table/occ; returns the
    boolean mask of entries that did NOT fit (caller stashes those).

    Per pass: stable-sort by bucket, rank within equal-bucket runs, place
    the first (capacity-left) ranked entries at slot occ[bucket]+rank —
    ranks are distinct within a bucket so writes never collide."""
    n = len(fp)
    placed = _table_contains(table, slots, b1, fp) | _table_contains(
        table, slots, b2, fp
    )  # set semantics: already-present fingerprints occupy no new slot
    for choice in (b1, b2):
        todo = np.flatnonzero(~placed)
        if todo.size == 0:
            break
        b = choice[todo]
        order = np.argsort(b, kind="stable")
        bs = b[order]
        new_run = np.r_[True, bs[1:] != bs[:-1]]
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        rank = np.arange(bs.size) - starts[run_id]
        cap_left = slots - occ[bs]
        ok = rank < cap_left
        tgt = bs[ok] * slots + occ[bs[ok]] + rank[ok]
        table[tgt] = fp[todo][order][ok]
        ub, cnt = np.unique(bs[ok], return_counts=True)
        occ[ub] += cnt
        placed[todo[order[ok]]] = True
    return ~placed


def build_cuckoo_delta(
    seen_delta: DataFrame,
    num_buckets: int,
    n_ck: int,
    slots: int,
    stash_bits: int,
    stash_hashes: int,
) -> DataFrame:
    """One cuckoo filter row per partition bucket over this round's
    newly-seen urls. n_ck and stash_bits must be powers of two."""
    assert n_ck & (n_ck - 1) == 0, "n_ck must be a power of two"
    assert stash_bits & (stash_bits - 1) == 0, "stash_bits must be a power of two"

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h1, _ = _probe_arrays(pdf)
        fp = _fingerprints(h1)
        b1, b2 = _buckets(h1, fp, n_ck)
        table = np.zeros(n_ck * slots, dtype=np.uint16)
        occ = np.zeros(n_ck, dtype=np.int64)
        stash = np.zeros(stash_bits // 8, dtype=np.uint8)
        # dedup identical (fp, b1) members so duplicates burn no slots
        key = (b1.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
        _, uniq = np.unique(key, return_index=True)
        left = _insert(table, occ, slots, fp[uniq], b1[uniq], b2[uniq])
        if left.any():
            _stash_set(
                stash, fp[uniq][left], b1[uniq][left], b2[uniq][left],
                stash_bits, stash_hashes,
            )
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "table": [table.tobytes()],
                "n_ck": [n_ck],
                "slots": [slots],
                "stash": [stash.tobytes()],
                "stash_bits": [stash_bits],
                "stash_hashes": [stash_hashes],
                "n_buckets": [num_buckets],
            }
        )

    return (
        with_probe_hashes(with_bucket(seen_delta.select("url"), num_buckets))
        .groupBy("bucket")
        .applyInPandas(build, schema=CUCKOO_SCHEMA)
    )


def _geometry(pdf: pd.DataFrame) -> tuple[int, int, int, int, int]:
    return (
        int(pdf["n_ck"].iloc[0]),
        int(pdf["slots"].iloc[0]),
        int(pdf["stash_bits"].iloc[0]),
        int(pdf["stash_hashes"].iloc[0]),
        int(pdf["n_buckets"].iloc[0]),
    )


def merge_cuckoos(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Per-bucket merge: re-insert delta's stored fingerprints into prev's
    table via the partial-key involution (a fingerprint at bucket j has its
    alternate at j XOR H(fp)); overflow joins the OR-merged stashes.
    Geometry mismatch raises — same failure mode as merge_blooms."""

    def merge(key, a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        if a.empty:
            return b
        if b.empty:
            return a
        if _geometry(a) != _geometry(b):
            raise ValueError(
                f"cuckoo geometry mismatch in bucket {key}: "
                f"{_geometry(a)} vs {_geometry(b)}"
            )
        n_ck, slots, stash_bits, stash_hashes, _nb = _geometry(a)
        table = np.frombuffer(a["table"].iloc[0], dtype=np.uint16).copy()
        occ = (table.reshape(n_ck, slots) != 0).sum(axis=1).astype(np.int64)
        stash = (
            np.frombuffer(a["stash"].iloc[0], dtype=np.uint8)
            | np.frombuffer(b["stash"].iloc[0], dtype=np.uint8)
        )
        dt = np.frombuffer(b["table"].iloc[0], dtype=np.uint16)
        nz = np.flatnonzero(dt)
        if nz.size:
            fp = dt[nz]
            j = (nz // slots).astype(np.int64)
            alt = _alt_bucket(j, fp, n_ck)
            left = _insert(table, occ, slots, fp, j, alt)
            if left.any():
                _stash_set(
                    stash, fp[left], j[left], alt[left], stash_bits, stash_hashes
                )
        out = a.iloc[[0]].copy()
        out["table"] = [table.tobytes()]
        out["stash"] = [stash.tobytes()]
        return out

    return (
        prev.groupBy("bucket")
        .cogroup(delta.groupBy("bucket"))
        .applyInPandas(merge, schema=CUCKOO_SCHEMA)
    )


def cuckoo_prefilter(
    candidates: DataFrame, filters: DataFrame, num_buckets: int
) -> DataFrame:
    """Annotate candidates with ``maybe_seen`` (same contract as
    bloom_prefilter): False is definitive, True falls through to the exact
    anti-join. Bucket-aligned cogroup — one task sees one bucket's
    candidates plus that bucket's single filter row."""
    cand = with_bucket(candidates.drop("bucket"), num_buckets)
    out_cols = [f.name for f in cand.schema.fields]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    ) + ", maybe_seen boolean"
    cand = with_probe_hashes(cand)

    def probe(key, cand_pdf: pd.DataFrame, f_pdf: pd.DataFrame) -> pd.DataFrame:
        if f_pdf.empty or cand_pdf.empty:
            out = cand_pdf[out_cols].copy()
            out["maybe_seen"] = False
            return out
        n_ck, slots, stash_bits, stash_hashes, _nb = _geometry(f_pdf)
        table = np.frombuffer(f_pdf["table"].iloc[0], dtype=np.uint16)
        stash = np.frombuffer(f_pdf["stash"].iloc[0], dtype=np.uint8)
        h1, _ = _probe_arrays(cand_pdf)
        fp = _fingerprints(h1)
        b1, b2 = _buckets(h1, fp, n_ck)
        maybe = (
            _table_contains(table, slots, b1, fp)
            | _table_contains(table, slots, b2, fp)
            | _stash_contains(stash, fp, b1, b2, stash_bits, stash_hashes)
        )
        out = cand_pdf[out_cols].copy()
        out["maybe_seen"] = maybe
        return out

    return (
        cand.groupBy("bucket")
        .cogroup(filters.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )

"""Portable, engine-agnostic hashing primitives.

Every hash that feeds a DuckDB-checkable operator is derived from **md5**,
the one cryptographic hash Spark, DuckDB, and Python all expose with
identical semantics. The shared building block is ``md5_u32``: a uint32
read little-endian from 4 bytes of the digest, chosen to line up exactly
with DuckDB's ``md5_number_lower``:

    md5_number_lower(s)        == int.from_bytes(md5(s).digest()[8:16], 'little')
    md5_number_lower & 2^32-1  == md5_u32(s, 8)   (digest bytes 8..11)
    md5_number_lower >> 32     == md5_u32(s, 12)  (digest bytes 12..15)

so the same 32-bit values are computable as plain SQL in both engines —
Spark via conv() over byte-swapped hex pairs of md5()'s hex string, DuckDB
via md5_number_lower masks. Keeping hashes at 32 bits also keeps every
downstream arithmetic step (minhash permutations a*h+b with a,b < 2^30)
inside exact signed-64-bit range: a*h < 2^62, so Spark bigint, DuckDB
BIGINT and numpy int64 all agree with zero overflow/wraparound.

Engine-internal hashing (bloom sidecars) uses ``xxhash64`` columns instead:
faster, JVM-side, and never oracle-compared.
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE61 = (1 << 61) - 1


def md5_u32_sql(expr: str, byte_off: int = 8) -> str:
    """Spark-SQL snippet: little-endian uint32 from md5 digest bytes
    [byte_off, byte_off+4) of ``expr``, as BIGINT in [0, 2^32)."""
    p = byte_off * 2 + 1  # 1-based hex-string position of the first byte
    parts = ", ".join(
        f"substring(md5({expr}), {p + o}, 2)" for o in (6, 4, 2, 0)
    )
    return f"cast(conv(concat({parts}), 16, 10) as bigint)"


def md5_u32_duckdb(expr: str, byte_off: int = 8) -> str:
    """DuckDB-SQL snippet computing the same value as ``md5_u32_sql``."""
    if byte_off == 8:
        return f"CAST(md5_number_lower({expr}) & 4294967295 AS BIGINT)"
    if byte_off == 12:
        return f"CAST(md5_number_lower({expr}) >> 32 AS BIGINT)"
    if byte_off == 0:
        return f"CAST(md5_number_upper({expr}) & 4294967295 AS BIGINT)"
    if byte_off == 4:
        return f"CAST(md5_number_upper({expr}) >> 32 AS BIGINT)"
    raise ValueError(f"unsupported byte_off {byte_off}")


def md5_u32_py(s: str, byte_off: int = 8) -> int:
    """Python reference for the same value (tests / oracle simulator)."""
    d = hashlib.md5(s.encode("utf-8")).digest()
    return int.from_bytes(d[byte_off : byte_off + 4], "little")


def minhash_params(num_hashes: int, seed: int = 7) -> tuple[list[int], list[int]]:
    """Permutation coefficients h_k(x) = (a_k*x + b_k) mod 2^61-1 with
    a_k in [1, 2^30), b_k in [0, 2^30): products with 32-bit shingle
    hashes stay < 2^62, exact in every engine's signed 64-bit integers."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 30, size=num_hashes).tolist()
    b = rng.randint(0, 1 << 30, size=num_hashes).tolist()
    return [int(x) for x in a], [int(x) for x in b]


def md5_hex_u32_sql(hex_var: str, byte_off: int = 8) -> str:
    """Little-endian uint32 (BIGINT) from digest bytes
    [byte_off, byte_off+4) of an ALREADY-BOUND md5 hex-string expression
    — typically a HOF lambda variable or a materialized hex column,
    where inlining ``md5_u32_sql`` would recompute md5() once per
    substring (interpreted lambdas get no common-subexpression
    elimination). The reversed 1-based hex positions encode the same
    portability contract as ``md5_u32_duckdb``, so every consumer MUST
    use this one definition."""
    p = byte_off * 2 + 1
    parts = ", ".join(
        f"substring({hex_var}, {p + o}, 2)" for o in (6, 4, 2, 0)
    )
    return f"cast(conv(concat({parts}), 16, 10) as bigint)"

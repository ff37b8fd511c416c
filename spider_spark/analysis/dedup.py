"""Document deduplication at training-pipeline scale.

Four families, scale-ranked:

  - exact: md5 of normalized text, hash-groupBy. One shuffle on a short
    key; at 100 TB this is the cheapest possible dedup (combine-heavy).
  - MinHash + LSH: shingle → k minhashes → b bands → band-bucket join.
    Only documents sharing a band bucket are compared, so the candidate
    join is |buckets|-bounded instead of O(n²). Vectorized numpy inside a
    pandas UDF (signature), then pure DataFrame explode/join.
  - SimHash: 64-bit weighted token hash; near-dup = small Hamming
    distance, found via the 4×16-bit band trick (pigeonhole: hamming<=3
    implies at least one identical 16-bit quarter).
  - n-gram Jaccard: exact verification on LSH candidates (the
    re-rank/verify stage after either LSH).

All pair-generating joins are self-joins keyed on a bucket column with
``id_l < id_r`` to halve the output; bucket keys are short ints/longs so
the shuffles are compact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERSENNE = (1 << 61) - 1


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of exact duplicates (normalized): fp, n_docs, doc_ids."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _stable64(tokens: list[str]) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


def _shingle_hashes(text: str, w: int) -> np.ndarray:
    toks = text.lower().split()
    if len(toks) < w:
        toks = toks + [""] * (w - len(toks))
    shingles = [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]
    return _stable64(shingles)


def make_minhash_udf(num_hashes: int, shingle_w: int, seed: int = 7):
    """Pandas UDF: text -> array<bigint> of minhash signature values.

    Permutations h_i(x) = (a_i·x + b_i) mod M (Mersenne 2^61-1), numpy-
    vectorized over all shingles × hashes at once."""
    rng = np.random.RandomState(seed)
    A = rng.randint(1, MERSENNE, size=num_hashes, dtype=np.uint64)
    B = rng.randint(0, MERSENNE, size=num_hashes, dtype=np.uint64)

    @F.pandas_udf("array<long>")
    def minhash(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            sh = _shingle_hashes(t or "", shingle_w) & np.uint64(MERSENNE)
            if len(sh) == 0:
                out.append([0] * num_hashes)
                continue
            # (H, S) matrix; uint64 products wrap mod 2^64 before the
            # Mersenne mod — deterministic and well-mixed, which is all
            # LSH banding needs (not a strict universal family)
            vals = (A[:, None] * sh[None, :] + B[:, None]) % np.uint64(MERSENNE)
            out.append((vals.min(axis=1) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).tolist())
        return pd.Series(out)

    return minhash


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_w: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH.

    Returns (id_l, id_r, n_bands_hit). rows_per_band = num_hashes//bands;
    Jaccard threshold ≈ (1/bands)^(1/rows_per_band)."""
    assert num_hashes % bands == 0
    rpb = num_hashes // bands
    mh = make_minhash_udf(num_hashes, shingle_w)
    sig = df.select(
        F.col(id_col).alias("doc_id"), mh(F.col(text_col)).alias("sig")
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(*[F.col("sig")[b * rpb + i] for i in range(rpb)]).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    l = buckets.alias("l")
    r = buckets.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_l"), F.col("r.doc_id").alias("id_r")
        )
        .groupBy("id_l", "id_r")
        .agg(F.count("*").alias("n_bands_hit"))
    )


def make_simhash_udf(seed: int = 11):
    """Pandas UDF: text -> 64-bit simhash (weighted token bit vote)."""

    @F.pandas_udf("long")
    def simhash(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            toks = (t or "").lower().split()
            if not toks:
                out[i] = 0
                continue
            uniq, counts = np.unique(np.array(toks), return_counts=True)
            hs = _stable64(list(uniq))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            h = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                h |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(h)
        return pd.Series(out)

    return simhash


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via the 4-band
    pigeonhole join (any pair within distance 3 shares a 16-bit quarter)."""
    sh = make_simhash_udf()
    sigs = df.select(F.col(id_col).alias("doc_id"), sh(F.col(text_col)).alias("sh"))
    quarters = sigs.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned(F.col("sh"), q * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sh", F.col("b.q").alias("q"), F.col("b.qv").alias("qv"))
    l, r = quarters.alias("l"), quarters.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.q") == F.col("r.q"))
            & (F.col("l.qv") == F.col("r.qv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_l"),
            F.col("r.doc_id").alias("id_r"),
            F.col("l.sh").alias("sh_l"),
            F.col("r.sh").alias("sh_r"),
        )
        .dropDuplicates(["id_l", "id_r"])
    )
    hamming = F.bit_count(F.col("sh_l").bitwiseXOR(F.col("sh_r")))
    return pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_l", "id_r", "hamming")


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact word-ngram Jaccard for candidate pairs (verify stage).

    JVM-side: ngrams via split+transform, jaccard via array_intersect/union."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.array_distinct(
        F.filter(
            F.transform(
                toks,
                lambda _x, i: F.when(
                    i + n <= F.size(toks),
                    F.concat_ws(" ", F.slice(toks, i + 1, n)),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    g = docs.select(F.col(id_col).alias("doc_id"), grams.alias("grams"))
    out = (
        pairs.join(g.withColumnRenamed("doc_id", "id_l").withColumnRenamed("grams", "g_l"), "id_l")
        .join(g.withColumnRenamed("doc_id", "id_r").withColumnRenamed("grams", "g_r"), "id_r")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("g_l", "g_r"))
                / F.size(F.array_union("g_l", "g_r")),
                6,
            ),
        )
        .drop("g_l", "g_r")
    )
    return out

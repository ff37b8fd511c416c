"""Document deduplication at training-pipeline scale.

Four families, scale-ranked:

  - exact: md5 of normalized text, hash-groupBy. One shuffle on a short
    key; at 100 TB this is the cheapest possible dedup (combine-heavy).
  - MinHash + LSH: shingle → k minhashes → b bands → band-bucket join.
    Only documents sharing a band bucket are compared, so the candidate
    join is |buckets|-bounded instead of O(n²).
  - SimHash: 64-bit weighted token hash; near-dup = small Hamming
    distance, found via the banded pigeonhole trick (max_hamming+1
    disjoint bit slices: any qualifying pair shares one band intact).
  - n-gram Jaccard: exact verification on LSH candidates (the
    re-rank/verify stage after either LSH).
  - duplicate-substring spans: corpus-duplicated token k-grams merged
    into maximal per-document spans (Lee et al. 2021 ExactSubstr, at
    gram granularity) — substring-level removal rather than whole-doc.

Everything runs JVM-side in whole-stage codegen — no Python UDFs anywhere:
shingling/minhash are array HOFs (transform/array_min), simhash is an
explode + two grouped aggregations, and all hashing is the portable
md5-derived uint32 of functions/hashing.py, so each pipeline has an exact
DuckDB oracle (same md5 bytes, same exact 64-bit integer arithmetic).

All pair-generating joins are self-joins keyed on a bucket column with
``id_l < id_r`` to halve the output; bucket keys are short strings/ints so
the shuffles are compact. A mega-cluster of byte-identical documents would
still pair quadratically inside one bucket — ``exact_representatives`` /
``minhash_lsh_candidates_pregrouped`` is the scale path: one
exact-fingerprint representative per group enters the banded join, so the
worst case is O(distinct-texts²) per bucket, not O(docs²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_spark.functions.hashing import (
    MERSENNE61,
    md5_hex_u32_sql,
    md5_u32_sql,
    minhash_params,
)


def norm_fingerprint(text_col: str = "text") -> "F.Column":
    """md5 of the whitespace-collapsed, trimmed, lowercased text — THE
    exact-dedup fingerprint, defined once: duplicate_clusters' member
    join and incremental_dedup's exact stage only work because their
    normalization is byte-identical to exact_duplicates'."""
    return F.md5(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    )


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of exact duplicates (normalized): fp, n_docs, doc_ids."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            norm_fingerprint(text_col).alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_representatives(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One representative doc (min doc_id) per exact-fingerprint group.

    The standard pre-group step before any LSH family at crawl scale: a
    mega-cluster of byte-identical documents contributes ONE row to the
    banded self-join instead of pairing quadratically inside its bucket.
    Returns (doc_id, {text_col}, fp, n_exact) — n_exact is the size of the
    exact group the representative stands for, so downstream consumers can
    expand pair counts back to document space without rejoining."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col),
        norm_fingerprint(text_col).alias("fp"),
    )
    reps = d.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"), F.count("*").alias("n_exact")
    )
    return d.join(reps, ["fp", "doc_id"]).select(
        "doc_id", text_col, "fp", "n_exact"
    )


def minhash_lsh_candidates_pregrouped(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_w: int = 3,
) -> DataFrame:
    """``minhash_lsh_candidates`` over exact-fingerprint representatives.

    Same contract (id_l, id_r, n_bands_hit) but ids are group
    representatives (min doc_id of each exact-duplicate group), plus
    (n_exact_l, n_exact_r) group sizes. Near-dup semantics are unchanged —
    members of an exact group have identical signatures, so every
    cross-group candidate pair the full join would emit is represented by
    its (rep_l, rep_r) pair here — while the worst-case intra-bucket join
    cost drops from O(cluster²) to O(distinct-texts-in-bucket²)."""
    reps = exact_representatives(df, text_col, id_col)
    pairs = minhash_lsh_candidates(
        reps,
        text_col=text_col,
        id_col="doc_id",
        num_hashes=num_hashes,
        bands=bands,
        shingle_w=shingle_w,
    )
    sizes = reps.select("doc_id", "n_exact")
    return (
        pairs.join(
            sizes.withColumnRenamed("doc_id", "id_l").withColumnRenamed(
                "n_exact", "n_exact_l"
            ),
            "id_l",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "id_r").withColumnRenamed(
                "n_exact", "n_exact_r"
            ),
            "id_r",
        )
        .select("id_l", "id_r", "n_bands_hit", "n_exact_l", "n_exact_r")
    )


# --------------------------------------------------------------- MinHash


def _tokens_expr(text_col: str) -> str:
    """Lowercased whitespace tokens, empties dropped — the shared
    tokenization (Python ``text.lower().split()`` semantics)."""
    return (
        f"filter(split(lower(coalesce({text_col}, '')), '\\\\s+'), "
        f"x -> x != '')"
    )


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    out: str = "sig",
    num_hashes: int = 32,
    shingle_w: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Adds ``out``: array<bigint> minhash signature, computed entirely
    JVM-side (tokens → padded → w-shingles → md5-u32 → per-permutation
    array_min). Short texts pad with '' so at least one shingle exists."""
    w = shingle_w
    a_s, b_s = minhash_params(num_hashes, seed)
    d = df.withColumn("_mh_toks", F.expr(_tokens_expr(text_col)))
    d = d.withColumn(
        "_mh_toks",
        F.expr(
            f"CASE WHEN size(_mh_toks) >= {w} THEN _mh_toks "
            f"ELSE concat(_mh_toks, array_repeat('', {w} - size(_mh_toks))) END"
        ),
    )
    # two-step transform so the md5 hex string binds ONCE per shingle as a
    # lambda var: md5_u32_sql would otherwise inline md5() into each of its
    # four byte-substrings, and inside interpreted HOF lambdas there is no
    # common-subexpression elimination — 4x the md5 work
    d = d.withColumn(
        "_mh_hex",
        F.expr(
            f"transform(sequence(0, size(_mh_toks) - {w}), "
            f"i -> md5(array_join(slice(_mh_toks, i + 1, {w}), chr(32))))"
        ),
    )
    d = d.withColumn(
        "_mh_h32",
        F.expr(f"transform(_mh_hex, x -> {md5_hex_u32_sql('x')})"),
    )
    sig = F.array(
        *[
            F.expr(
                f"array_min(transform(_mh_h32, "
                f"h -> ({a}L * h + {b}L) % {MERSENNE61}L))"
            )
            for a, b in zip(a_s, b_s)
        ]
    )
    return d.withColumn(out, sig).drop("_mh_toks", "_mh_hex", "_mh_h32")


def minhash_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_w: int = 3,
) -> DataFrame:
    """(doc_id, band, bh): banded LSH bucket keys — the shared front end
    of the self-join (minhash_lsh_candidates) and the cross-corpus join
    (incremental_dedup). Bucket keys are md5 prefixes of the band's
    signature slice: engine-portable, fixed 16 hex chars."""
    assert num_hashes % bands == 0
    rpb = num_hashes // bands
    sig = with_minhash_signature(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")),
        "_t",
        num_hashes=num_hashes,
        shingle_w=shingle_w,
    ).select("doc_id", "sig")
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(
                "substring(md5(concat_ws(',', "
                + ", ".join(f"sig[{b * rpb + i}]" for i in range(rpb))
                + ")), 1, 16)"
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )


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
    Jaccard threshold ≈ (1/bands)^(1/rows_per_band). Band bucket keys are
    md5 prefixes of the comma-joined band slice — engine-portable and
    fixed-width (16 hex chars), so the self-join shuffles compact keys."""
    buckets = minhash_band_buckets(
        df, text_col, id_col, num_hashes, bands, shingle_w
    )
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


def minhash_lsh_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_w: int = 3,
) -> DataFrame:
    """Connectivity-equivalent LSH edge list: per (band, bucket) link
    every member to the bucket's MIN doc_id (a star), instead of
    emitting all same-bucket pairs.

    For transitive-closure consumers (duplicate_clusters) the star graph
    has IDENTICAL connected components to the pairwise candidate graph —
    any two same-bucket docs are joined through the bucket hub — while a
    near-dup mega-cluster of n docs costs O(n) edges instead of the
    pairwise join's O(n²) (measured 225k pairs → ~30k edges on the sf0.1
    bench corpus; at 100 TB a quadratic bucket is the difference between
    a bounded shuffle and a job-killing skew explosion). Pairwise
    ``minhash_lsh_candidates`` remains the right front end when the
    consumer needs per-PAIR evidence (n_bands_hit, Jaccard verify).
    Shape: one groupBy on (band, bh) with map-side combine for the hubs
    plus one equi-join back — no window over a skewed bucket."""
    buckets = minhash_band_buckets(
        df, text_col, id_col, num_hashes, bands, shingle_w
    )
    # buckets feeds two subtrees with DIFFERENT exchange shapes (the hub
    # partial-agg vs the plain join side), so ReuseExchange never dedupes
    # them and the minhash signature pass — the dominant cost, md5 per
    # shingle inside interpreted HOF lambdas — would run twice.
    # Materialize the narrow (doc_id, band, bh) table once instead:
    # rows = docs × bands, ~40 bytes each — bounded, unlike a signature
    # recompute which rescans the corpus text (measured 1.5-2x on the
    # sf0.1 pipeline_clean_corpus row)
    buckets = buckets.localCheckpoint(eager=False)
    hubs = buckets.groupBy("band", "bh").agg(F.min("doc_id").alias("hub"))
    return (
        buckets.join(hubs, ["band", "bh"])
        .where(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("id_l"), F.col("doc_id").alias("id_r"))
        .distinct()
    )


def incremental_dedup(
    new_docs: DataFrame,
    old_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_w: int = 2,
) -> DataFrame:
    """Classify a NEW snapshot against an EXISTING corpus — the
    incremental-update operation a monthly-crawl pipeline runs so only
    genuinely novel documents enter the training set.

    Returns one row per new doc: (doc_id, status, match_id,
    n_bands_hit) with status in
      - 'exact_dup_of_old'  — normalized md5 fingerprint already in the
        old corpus (match_id null: the fp join is a semi-join, any
        matching old doc suffices);
      - 'near_dup_of_old'   — some banded-MinHash bucket collides with
        an old doc; match_id = the best-matching old doc (most bands
        hit, ties broken by MAX old id — deterministic both engines);
      - 'new'               — neither.

    Scale shape: the exact stage is one semi-join on the md5 fp (both
    sides combine to distinct fps first). The near stage joins NEW
    band buckets against OLD band buckets — a cross-corpus equi-join on
    (band, bh), so its cost is bucket-collision-bounded like the self-
    join variant, and crucially the OLD side's buckets can be
    precomputed once and stored (bucketed by bh) — each monthly delta
    only shingles the NEW snapshot. Exact dups are removed BEFORE the
    near stage so byte-identical mega-clusters never reach the banded
    join (the pregroup lesson)."""
    new_fp = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        norm_fingerprint(text_col).alias("fp"),
    )
    old_fps = old_docs.select(norm_fingerprint(text_col).alias("fp")).distinct()
    exact = new_fp.join(old_fps, "fp", "left_semi").select("doc_id")
    rest = new_fp.join(old_fps, "fp", "left_anti").select("doc_id", "_t")
    bn = minhash_band_buckets(
        rest, "_t", "doc_id", num_hashes, bands, shingle_w
    )
    bo = minhash_band_buckets(
        old_docs, text_col, id_col, num_hashes, bands, shingle_w
    )
    near = (
        bn.alias("n")
        .join(
            bo.alias("o"),
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.bh") == F.col("o.bh")),
        )
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("o.doc_id").alias("match_id"),
        )
        .groupBy("doc_id", "match_id")
        .agg(F.count("*").cast("long").alias("_hits"))
        .groupBy("doc_id")
        .agg(F.max(F.struct("_hits", "match_id")).alias("_best"))
        .select(
            "doc_id",
            F.col("_best.match_id").alias("match_id"),
            F.col("_best._hits").alias("n_bands_hit"),
        )
    )
    all_new = new_fp.select("doc_id")
    return (
        all_new.join(exact.withColumn("_e", F.lit(1)), "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_e").isNotNull(), F.lit("exact_dup_of_old"))
            .when(F.col("match_id").isNotNull(), F.lit("near_dup_of_old"))
            .otherwise(F.lit("new"))
            .alias("status"),
            F.when(F.col("_e").isNull(), F.col("match_id")).alias(
                "match_id"
            ),
            F.when(F.col("_e").isNull(), F.col("n_bands_hit")).alias(
                "n_bands_hit"
            ),
        )
    )


# --------------------------------------------------------------- SimHash


def with_simhash_halves(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sh_lo, sh_hi): 64-bit weighted-token simhash as two uint32
    halves. Two halves instead of one int64 keeps every bit operation in
    overflow-free signed range on every engine (no 1<<63 edge cases).

    Shape: explode tokens → count per (doc, token) → 64 sign-vote sums in
    one grouped aggregation → bit-pack. Two shuffles keyed by doc_id, all
    codegen; docs with no tokens get (0, 0) like the reference behavior."""
    toks = F.expr(_tokens_expr(text_col))
    t = df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("_tok"))
    tc = (
        t.groupBy("doc_id", "_tok")
        .agg(F.count("*").alias("_c"))
        # hex digest bound once, then both u32 halves read from it —
        # md5_u32_sql would md5() 4x per half (8x per token); here the
        # substrings reference the materialized _hex column instead
        .withColumn("_hex", F.md5("_tok"))
        .withColumn(
            "_lo",
            F.expr(md5_hex_u32_sql("_hex")),
        )
        .withColumn(
            "_hi",
            F.expr(md5_hex_u32_sql("_hex", 12)),
        )
    )
    vote_aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftright({half}, {b}) & 1) = 1 "
            f"THEN _c ELSE -_c END) AS _v{name}{b}"
        )
        for half, name in (("_lo", "l"), ("_hi", "h"))
        for b in range(32)
    ]
    votes = tc.groupBy("doc_id").agg(*vote_aggs)
    pack = lambda name: F.expr(
        " + ".join(
            f"(CASE WHEN _v{name}{b} > 0 THEN {1 << b}L ELSE 0L END)"
            for b in range(32)
        )
    )
    sigs = votes.select(
        "doc_id", pack("l").alias("sh_lo"), pack("h").alias("sh_hi")
    )
    # docs whose token list is empty never enter the explode -> simhash 0
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(sigs, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("sh_lo", F.lit(0)).alias("sh_lo"),
            F.coalesce("sh_hi", F.lit(0)).alias("sh_hi"),
        )
    )


def simhash_bands(max_hamming: int) -> list[tuple[int, int]]:
    """(start_bit, width) slices of the 64-bit simhash for the pigeonhole
    join: ``max_hamming + 1`` disjoint bands, so any pair within the
    distance bound leaves at least one band untouched (with only 4 fixed
    quarters, completeness held for hamming <= 3 ONLY — a max_hamming=8
    caller silently lost pairs whose diff bits spread across all four).
    Shared by the Spark operator and the DuckDB oracle generator so both
    engines band identically. max_hamming=3 reproduces the classic 4x16
    quarters bit-for-bit."""
    b = min(64, max_hamming + 1)
    base, extra = divmod(64, b)
    out, s = [], 0
    for i in range(b):
        w = base + (1 if i < extra else 0)
        out.append((s, w))
        s += w
    return out


def _band_expr_sql(s: int, w: int, lo: str = "sh_lo", hi: str = "sh_hi") -> str:
    """Engine-portable SQL for simhash bits [s, s+w) over the two packed
    32-bit halves (identical operator set in Spark SQL and DuckDB)."""
    mask = (1 << w) - 1
    if s + w <= 32:
        return f"(({lo} >> {s}) & {mask})"
    if s >= 32:
        return f"(({hi} >> {s - 32}) & {mask})"
    wl = 32 - s
    mh = (1 << (w - wl)) - 1
    return f"((({lo} >> {s}) & {(1 << wl) - 1}) | (({hi} & {mh}) << {wl}))"


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via the banded
    pigeonhole join: max_hamming+1 disjoint bit slices, any qualifying
    pair shares at least one band value."""
    sigs = with_simhash_halves(df, text_col, id_col)
    bands = simhash_bands(max_hamming)
    quarter = [F.expr(_band_expr_sql(s, w)) for s, w in bands]
    quarters = sigs.select(
        "doc_id",
        "sh_lo",
        "sh_hi",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(q).alias("q"), quarter[q].alias("qv"))
                    for q in range(len(bands))
                ]
            )
        ).alias("b"),
    ).select(
        "doc_id", "sh_lo", "sh_hi",
        F.col("b.q").alias("q"), F.col("b.qv").alias("qv"),
    )
    l, r = quarters.alias("l"), quarters.alias("r")
    hamming = F.bit_count(
        F.col("l.sh_lo").bitwiseXOR(F.col("r.sh_lo"))
    ) + F.bit_count(F.col("l.sh_hi").bitwiseXOR(F.col("r.sh_hi")))
    # hamming filter runs INSIDE the bucket join (cheap bit_count on the
    # joined rows), so the dropDuplicates shuffle only carries surviving
    # pairs — a pair matching in several quarters dedups after, on a
    # 3-column row, instead of shipping 4 signature columns per candidate
    return (
        l.join(
            r,
            (F.col("l.q") == F.col("r.q"))
            & (F.col("l.qv") == F.col("r.qv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_l"),
            F.col("r.doc_id").alias("id_r"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_l", "id_r"])
    )


# --------------------------------------------------------- n-gram Jaccard


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    prune_to_candidates: bool = False,
) -> DataFrame:
    """Exact word-ngram Jaccard for candidate pairs (verify stage).

    JVM-side: ngrams via split+transform, jaccard via
    array_intersect/union.

    ``prune_to_candidates`` semi-joins docs to the candidate-id set
    before computing gram arrays, so the shingle HOF runs only for docs
    that appear in some pair. Measured both ways at sf0.1: with a
    SPARSE candidate set (candidates ≪ corpus — e.g. pairs produced by
    the pregrouped LSH over a realistic corpus) the prune wins by the
    corpus/candidate ratio; with a DENSE set (the duplicate-heavy
    fixture yields 325k pairs touching ~65% of docs) it costs ~20%
    extra (the pairs materialization + distinct + semi-join buy
    nothing). Candidate density is a data property, not a scale
    property, so this stays a caller knob, default off — the scale
    lever for dense corpora is shrinking PAIRS via
    minhash_lsh_candidates_pregrouped, not pruning docs."""
    if prune_to_candidates:
        # pairs is consumed three times (both prune branches + the
        # final join); materialize it once so the candidate generator —
        # typically a full LSH pass — doesn't re-run per consumer
        pairs = pairs.localCheckpoint()
        cand_ids = (
            pairs.select(F.col("id_l").alias(id_col))
            .union(pairs.select(F.col("id_r").alias(id_col)))
            .distinct()
        )
        docs = docs.join(cand_ids, id_col, "left_semi")
    # coalesce: NULL text must behave like empty (no grams), not poison
    # the arrays into size(NULL) = -1 so a null doc "verifies" at -1/-1
    # jaccard = 1.0 against any candidate partner
    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
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
    # g feeds both sides of the pair join; recomputing the shingle
    # projection per side beats materializing the (text-sized × n) gram
    # arrays — measured: a localCheckpoint here LOST ~25% at sf0.1
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


# ------------------------------------------------- duplicate clustering


def connected_components(
    edges: DataFrame,
    src: str = "id_l",
    dst: str = "id_r",
    max_iters: int = 25,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components over an undirected edge list: (node, comp)
    for every node appearing in an edge, comp = the component's minimum
    node id.

    Two physical strategies behind one contract — the same size-gated
    plan choice Spark itself makes between broadcast and shuffle joins:

    * **edge lists under ``local_threshold``** (known exactly: the edge
      count rides the symmetrization checkpoint) solve in ONE job — a
      single-task union-find (``repartition(1)`` + ``mapInPandas``,
      executor-side, never a driver collect). LSH edge lists are
      candidate-pruned and usually tiny relative to the corpus, and the
      iterative loop's per-round scheduler latency (join + groupBy +
      checkpoint per diameter step) would dominate a graph that fits in
      one Arrow batch. Measured on the sf0.1 clean-corpus row: 2.6 s of
      propagation rounds → ~0.4 s.
    * **above the threshold**, minimum-label propagation: each round is
      one propagation join + one min-groupBy (both shuffle on the node
      key) and labels only ever decrease, so the loop converges in
      O(component diameter) rounds. Change detection rides the same
      aggregation: every node carries its previous label as ``_old``
      (null on propagated rows; max() picks the one non-null per node),
      so "anything changed?" is a filter-count over the just-
      checkpointed round output — no second join, no extra shuffle.
      localCheckpoint truncates per-round lineage (same reasoning as
      operators/expand.py: N rounds must stay N bounded jobs, not an
      N-deep re-executing plan). The hard ``max_iters`` cap turns a
      pathological chain into an explicit error instead of silently
      wrong labels.

    Both paths emit identical labels (pinned by tests on random graphs
    with the gate forced each way)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    node_t = sym.schema["a"].dataType.simpleString()
    if sym.count() <= local_threshold:
        import pandas as pd

        def uf(batches):
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for pdf in batches:
                for a, b in zip(pdf["a"], pdf["b"]):
                    if a not in parent:
                        parent[a] = a
                    if b not in parent:
                        parent[b] = b
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        # union by MIN id so the root IS the label
                        if rb < ra:
                            ra, rb = rb, ra
                        parent[rb] = ra
            nodes = list(parent)
            yield pd.DataFrame(
                {"node": nodes, "comp": [find(n) for n in nodes]}
            )

        return sym.repartition(1).mapInPandas(
            uf, f"node {node_t}, comp {node_t}"
        )
    # initial labels stay LAZY (narrow projection of the checkpointed
    # sym + one distinct that fuses into round 1's first join) — one
    # fewer driver-synchronous job per call
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    comp_t = labels.schema["comp"].dataType
    for _ in range(max_iters):
        prop = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"),
            F.col("comp"),
            F.lit(None).cast(comp_t).alias("_old"),
        )
        new = (
            labels.withColumn("_old", F.col("comp"))
            .unionByName(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.max("_old").alias("_old"))
            # lazy: the changed-count below is the materializing action,
            # so each round is ONE job, not checkpoint-then-count
            .localCheckpoint(eager=False)
        )
        changed = new.where(F.col("comp") < F.col("_old")).count()
        labels = new.drop("_old")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds"
    )


def duplicate_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_w: int = 3,
) -> DataFrame:
    """Duplicate-cluster resolution: candidate pairs → transitive closure
    → (doc_id, cluster_id, cluster_size). cluster_id is the cluster's
    minimum doc_id (its canonical representative — keep rows where
    doc_id == cluster_id to dedup a corpus).

    Scale path end to end: the banded LSH join runs over
    exact-fingerprint representatives (one row per distinct text — a
    mega-cluster of identical documents never pairs quadratically), the
    component labels propagate over that representative graph, and every
    exact-duplicate member inherits its representative's component via one
    fingerprint join. Singleton documents keep their own id as
    cluster_id."""
    # reps feeds two subtrees (the LSH edges and the component join);
    # materialize once so the corpus-wide fingerprint groupBy+join
    # doesn't run per consumer
    reps = exact_representatives(df, text_col, id_col).localCheckpoint(
        eager=False
    )
    # star edges, not pairwise candidates: transitive closure only needs
    # connectivity, and a near-dup mega-cluster must cost O(n) edges,
    # not O(n²) pairs (see minhash_lsh_star_edges)
    edges = minhash_lsh_star_edges(
        reps,
        text_col=text_col,
        id_col="doc_id",
        num_hashes=num_hashes,
        bands=bands,
        shingle_w=shingle_w,
    )
    cc = connected_components(edges, "id_l", "id_r")
    rep_comp = (
        reps.join(cc, reps["doc_id"] == cc["node"], "left")
        .select("fp", F.coalesce("comp", "doc_id").alias("cluster_id"))
    )
    members = df.select(
        F.col(id_col).alias("doc_id"), norm_fingerprint(text_col).alias("fp")
    )
    # assigned also has two consumers, but it is CORPUS-sized — measured:
    # checkpointing it bought nothing here and would materialize the
    # whole corpus at lake scale; recompute instead
    assigned = members.join(rep_comp, "fp").select("doc_id", "cluster_id")
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return assigned.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


# ------------------------------------------- duplicate-substring spans


def duplicate_gram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_doc_freq: int = 2,
) -> DataFrame:
    """(doc_id, span_start, span_end, span_len, n_grams) — maximal token
    spans covered by corpus-duplicated k-grams (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", at token
    k-gram granularity instead of suffix-array byte granularity).

    A token k-gram is *duplicated* when it occurs in at least
    ``min_doc_freq`` distinct documents; each occurrence covers token
    positions [pos, pos+k-1] (0-based inclusive), and overlapping or
    adjacent covered intervals merge into maximal spans — the classic
    gaps-and-islands pass over each document's duplicated positions.

    Scale shape: the (doc, pos, gram-hash) explode is the one large
    intermediate (one row per token — the cost every substring-level
    scheme pays, and still a narrow 3-column stream); gram doc-frequency
    is a distinct + combine-heavy groupBy on the 32-bit hash; duplicated
    grams come back via a hash-keyed semi-join (AQE broadcasts it when
    the duplicated set is small). The islands window runs per document
    over its duplicated positions only — skew-free unless one document
    is itself enormous. Hashes are the portable md5-u32 of
    functions/hashing.py, so the pipeline has an exact DuckDB oracle."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_tokens_expr(text_col)).alias("_ds_t"),
    )
    # md5 hex binds once per gram (nested transform) — interpreted HOF
    # lambdas have no common-subexpression elimination
    d = d.withColumn(
        "_ds_hex",
        F.expr(
            f"CASE WHEN size(_ds_t) >= {k} THEN "
            f"transform(sequence(0, size(_ds_t) - {k}), "
            f"i -> md5(array_join(slice(_ds_t, i + 1, {k}), chr(32)))) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        ),
    ).withColumn(
        "_ds_h",
        F.expr(f"transform(_ds_hex, x -> {md5_hex_u32_sql('x')})"),
    )
    grams = d.select("doc_id", F.posexplode("_ds_h").alias("pos", "h"))
    # doc-frequency needs each (doc, gram) once: dedupe per doc JVM-side
    # (array_distinct before the explode) so the aggregation input is
    # already (doc, h)-distinct — one combine-heavy shuffle instead of a
    # corpus-wide distinct shuffle followed by the groupBy
    dup = (
        d.select(F.explode(F.array_distinct("_ds_h")).alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("h")
    )
    hits = grams.join(dup, "h", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # intervals [p, p+k-1] and [q, q+k-1] merge iff q <= p + k
    isl = (
        hits.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "island",
            F.sum(
                F.when(
                    F.col("_prev").isNull()
                    | (F.col("pos") > F.col("_prev") + k),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).over(w),
        )
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
            "n_grams",
        )
    )


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_doc_freq: int = 2,
) -> DataFrame:
    """(doc_id, n_tokens, dup_tokens, dup_frac_milli) — per-document
    duplicated-token totals over ``duplicate_gram_spans``. Every document
    keeps a row (0 when nothing duplicated); the milli-fraction is exact
    integer arithmetic (1000·dup div n), bit-identical on any engine —
    the keep/trim signal a Lee-et-al-style dedup pass thresholds on."""
    spans = duplicate_gram_spans(df, text_col, id_col, k, min_doc_freq)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").alias("dup_tokens")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"size({_tokens_expr(text_col)})")
        .cast("long")
        .alias("n_tokens"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac_milli",
            F.expr(
                "CASE WHEN n_tokens > 0 THEN (1000 * dup_tokens) div n_tokens "
                "ELSE 0 END"
            ),
        )
    )


# ------------------------------------------------------------- Winnowing


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """(doc_id, fp) — winnowing document fingerprints (Schleimer, Wilkerson
    & Aiken 2003, "Winnowing: Local Algorithms for Document Fingerprinting").

    Token k-gram hashes (portable md5-u32, functions/hashing.py) slide
    under a window of ``w`` consecutive grams; each window contributes its
    minimum hash, and the distinct minima are the document's fingerprint
    set. The guarantee: any shared token run of length >= k + w - 1 between
    two documents yields at least one shared fingerprint, while storage is
    ~2/(w+1) of the gram count — the standard local fingerprinting scheme
    for substring-level near-dup detection (vs MinHash's whole-document
    Jaccard).

    All array work is JVM-side higher-order functions over one scan — the
    only data movement is the exploded (doc_id, fp) output, already
    distinct per doc. Docs with fewer than k+w-1 tokens degrade gracefully
    (one window over whatever grams exist); docs with no tokens emit no
    rows. The md5 hex binds once per gram (nested transform) — interpreted
    HOF lambdas have no common-subexpression elimination."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_tokens_expr(text_col)).alias("_wn_t"),
    )
    d = d.withColumn(
        "_wn_hex",
        F.expr(
            f"CASE WHEN size(_wn_t) >= {k} THEN "
            f"transform(sequence(0, size(_wn_t) - {k}), "
            f"i -> md5(array_join(slice(_wn_t, i + 1, {k}), chr(32)))) "
            f"ELSE CASE WHEN size(_wn_t) > 0 THEN "
            f"array(md5(array_join(_wn_t, chr(32)))) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END END"
        ),
    )
    d = d.withColumn(
        "_wn_h",
        F.expr(f"transform(_wn_hex, x -> {md5_hex_u32_sql('x')})"),
    )
    fps = F.expr(
        f"CASE WHEN size(_wn_h) = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
        f"WHEN size(_wn_h) <= {w} THEN array(array_min(_wn_h)) "
        f"ELSE array_distinct(transform(sequence(0, size(_wn_h) - {w}), "
        f"j -> array_min(slice(_wn_h, j + 1, {w})))) END"
    )
    return d.select("doc_id", F.explode(fps).alias("fp"))

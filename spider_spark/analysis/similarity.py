"""Similarity search over embedding columns (array<float>).

  - ``cosine_topk``: brute-force cosine top-k against one query vector.
    JVM-side only: zip_with product + aggregate sum, so the scan stays in
    whole-stage codegen and prunes to the embedding column. O(n·d) per
    query — the correctness baseline and still the right answer when the
    query count is small relative to n.
  - ``srp_bucket``: sign-random-projection LSH bucket ids — the scale
    path. Documents hash to a b-bit bucket; a query probes only its
    bucket (and optionally neighboring buckets), turning the 10^10-row
    scan into a partition-pruned bucket lookup. Buckets are plain int
    columns → usable as a partition/bucketing key in the lake layout.
  - ``ann_topk_lsh``: query via bucket-join + exact re-rank inside the
    candidate set.
  - ``with_quantized`` / ``ann_topk_quantized``: fixed-point scalar
    quantization (floor(x·2^b)) and the integer dot-product top-k over
    it — the compressed scoring kernel, exact int64 arithmetic end to
    end so scores are engine-bit-identical (no rounding tolerance).
  - ``ann_topk_ivf`` / ``with_ivf_cell`` / ``ivf_train``: inverted-file
    ANN — vectors partition into k coarse cells (argmax cosine vs a small
    centroid set); a query probes only the nprobe closest cells. The cell
    id is a plain int column → the lake partition key, so a probe is a
    partition-pruned scan of nprobe/k of the table. Centroids start as a
    seeded deterministic sample of directions (the oracle-checkable form)
    and can be Lloyd-refined at scale with ``ivf_train`` (pure
    DataFrame ops: assign → per-dimension mean via posexplode).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> "F.Column":
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _cos(u, v) -> "F.Column":
    """NaN-safe cosine: 0.0 when either vector has zero norm. Without the
    guard a zero embedding (empty text) yields NaN, which Spark orders
    ABOVE every number — it would top every top-k and pass every
    threshold filter."""
    den = _norm(u) * _norm(v)
    return F.when(den > 0, _dot(u, v) / den).otherwise(F.lit(0.0))


def with_cosine(
    df: DataFrame, query: list[float], vec_col: str = "embedding"
) -> DataFrame:
    """Adds ``cos_sim`` vs the literal query vector (rounded to 6 dp for
    cross-engine comparability)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn("cos_sim", F.round(_cos(v, q), 6))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity (the baseline)."""
    return (
        with_cosine(df, query, vec_col)
        .select(id_col, "cos_sim")
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def srp_planes(dim: int, n_bits: int, seed: int = 17) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim))


def with_srp_bucket(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection bucket id, computed with pure column
    expressions (one dot product per plane via zip_with/aggregate)."""
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, p) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket + (bit * F.lit(int(1 << i)))
    return df.withColumn("srp_bucket", bucket)


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    planes: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b,
    round(cos, 4) ≥ threshold).

    The admission test intentionally runs on the 4-dp ROUNDED cosine —
    the boundary must not flip on the ~1e-16 summation-order differences
    between engines, so a pair up to 5e-5 below the threshold is admitted
    by contract (quantized boundaries with no float tolerance at all are
    ``semdedup_pairs``' exact integer test).

    ``planes=None``: brute-force O(n²) self-join — the exactness baseline
    (and the DuckDB-checkable oracle form). With SRP ``planes``: both
    sides bucket on sign-random-projections first and the self-join runs
    per bucket — near-identical vectors agree on (almost) every sign bit,
    so the candidate pair count drops ~2^b-fold while the cosine test
    stays exact. At 10^10 rows the bucket is the lake bucketing key, so
    the join is co-located (no global shuffle of the full table)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if planes is not None:
        a = with_srp_bucket(a, planes, "_va").withColumnRenamed(
            "srp_bucket", "_bkt"
        )
        b = with_srp_bucket(b, planes, "_vb").withColumnRenamed(
            "srp_bucket", "_bkt"
        )
        pairs = a.join(b, "_bkt").drop("_bkt")
    else:
        pairs = a.crossJoin(b)
    pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    va = F.col("_va").cast("array<double>")
    vb = F.col("_vb").cast("array<double>")
    return (
        pairs.withColumn("cos_sim", F.round(_cos(va, vb), 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def ivf_centroids(dim: int, k: int, seed: int = 23) -> np.ndarray:
    """Deterministic coarse-quantizer init: k random directions. For
    cosine assignment only direction matters, so seeded Gaussian rows are
    a valid (and engine-portable) coarse quantizer; ``ivf_train`` refines
    them when real clustering structure exists."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((k, dim))


def _centroid_cosines(vec_col, centroids: np.ndarray):
    """List of cosine columns vs each centroid, with the centroid norm as
    a Python literal and every sum left-folded — association order matches
    the DuckDB oracle expansion bitwise."""
    v = F.col(vec_col).cast("array<double>")
    nv = _norm(v)
    cols = []
    for c in centroids:
        p = F.array(*[F.lit(float(x)) for x in c])
        nc = float(np.sqrt(np.sum(c * c)))
        cols.append(
            F.when(nv > 0, _dot(v, p) / (nv * F.lit(nc))).otherwise(
                F.lit(0.0)  # zero vector: cell 0, deterministically
            )
        )
    return cols


def with_ivf_cell(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Adds ``ivf_cell``: 0-based argmax-cosine centroid index. All
    JVM-side column expressions; ties break to the first index (identical
    doubles on both engines ⇒ identical argmax)."""
    arr = F.array(*_centroid_cosines(vec_col, centroids))
    cell = (F.array_position(arr, F.array_max(arr)) - 1).cast("int")
    return df.withColumn("ivf_cell", cell)


def _py_cos(a, b) -> float:
    """Strict left-fold cosine — same association order as the column
    fold, for driver-side probe selection."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        x, y = float(x), float(y)
        dot += x * y
        na += x * x
        nb += y * y
    den = (na ** 0.5) * (nb ** 0.5)
    return dot / den if den > 0 else 0.0


def ivf_probe_cells(
    query: list[float], centroids: np.ndarray, nprobe: int
) -> list[int]:
    """The nprobe cells a query visits: centroid indices by descending
    cosine (index ascending on ties). Driver-side — centroids are tiny."""
    scored = sorted(
        ((-_py_cos(query, c), i) for i, c in enumerate(centroids))
    )
    return [i for _, i in scored[:nprobe]]


def ann_topk_ivf(
    df: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    nprobe: int = 2,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: filter to the query's nprobe closest cells,
    exact cosine re-rank inside them. With ``ivf_cell`` as the lake
    partition key the filter is partition pruning — the scan touches
    nprobe/k of the table, and recall is tunable by nprobe alone."""
    probed = ivf_probe_cells(query, centroids, nprobe)
    cells = with_ivf_cell(df, centroids, vec_col)
    return (
        with_cosine(cells.filter(F.col("ivf_cell").isin(probed)), query, vec_col)
        .select(id_col, "cos_sim")
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def ivf_cell_means(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """The Lloyd-step aggregation: assign each vector to its argmax-cosine
    cell, then per-(cell, dimension) mean via posexplode. One narrow
    explode + one combine-heavy groupBy shuffle over (cell, pos) — the
    whole training step at 10^10 rows is 2 passes, no all-pairs anything.
    Returns (ivf_cell, pos, m)."""
    return (
        with_ivf_cell(df, centroids, vec_col)
        .select("ivf_cell", F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy("ivf_cell", "pos")
        .agg(F.avg("col").alias("m"))
    )


def ivf_train(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    seed: int = 23,
) -> np.ndarray:
    """Lloyd-refine the seeded centroids with spherical k-means rounds,
    entirely as DataFrame aggregations (``ivf_cell_means``). Only the
    k×d centroid matrix ever reaches the driver. Empty cells keep their
    previous centroid."""
    first = df.select(F.col(vec_col)).first()
    if first is None or first[0] is None:
        raise ValueError("ivf_train needs at least one non-null vector")
    dim = len(first[0])
    cents = ivf_centroids(dim, k, seed)
    for _ in range(iters):
        means = ivf_cell_means(df, cents, vec_col).collect()
        new = cents.copy()
        got = {}
        for r in means:
            got.setdefault(r["ivf_cell"], {})[r["pos"]] = r["m"]
        for cell, dims in got.items():
            new[cell] = [dims[p] for p in range(dim)]
        cents = new
    return cents


def with_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    out: str = "qvec",
    frac_bits: int = 8,
) -> DataFrame:
    """Adds ``out``: array<bigint> fixed-point quantization
    floor(x · 2^frac_bits) of the embedding — the scalar-quantization
    compression step of a vector index, with a power-of-two scale so the
    multiply is exact in IEEE doubles. float32 widens to the identical
    double on every engine and floor is deterministic, so quantized values
    (unlike raw float dot products) never need a rounding tolerance in
    cross-engine comparison — and the quantized table is ~8× smaller to
    shuffle than float64 vectors."""
    s = float(1 << frac_bits)
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(s)).cast("long"),
    )
    return df.withColumn(out, q)


def quantize_query(query: list[float], frac_bits: int = 8) -> list[int]:
    """The same fixed-point quantization for a driver-side query vector
    (Python floats ARE IEEE doubles, so this matches ``with_quantized``
    bit for bit)."""
    s = 1 << frac_bits
    return [int(math.floor(float(x) * s)) for x in query]


def ann_topk_quantized(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    frac_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Integer-exact top-k by the fixed-point dot product
    <floor(v·2^b), floor(q·2^b)> — the cheap scoring kernel quantized
    vector search re-ranks with.

    One narrow codegen scan (no floats past quantization, no UDF); the
    top-k compiles to TakeOrderedAndProject, so each partition forwards
    only its local k rows. Quantization error can only reorder near-ties;
    the integer score itself is bit-identical on every engine, which is
    why this variant needs no rounding/printf in its oracle. Returns
    (``id_col``, qscore)."""
    qq = quantize_query(query, frac_bits)
    qarr = F.array(*[F.lit(v).cast("long") for v in qq])
    d = with_quantized(df, vec_col, "_qv", frac_bits)
    score = F.aggregate(
        F.zip_with(F.col("_qv"), qarr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        d.withColumn("qscore", score)
        .select(id_col, "qscore")
        .orderBy(F.desc("qscore"), F.col(id_col))
        .limit(k)
    )


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    planes: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: prune to the query's SRP bucket, exact cosine
    re-rank inside it. At scale ``srp_bucket`` is the table's bucketing
    key, so this is a partition-pruned scan, not a full pass."""
    # strict left-fold dot (same association order as the aggregate() fold
    # used for data vectors) so the query's bucket matches its own row's
    qbucket = 0
    for i, plane in enumerate(planes):
        s = 0.0
        for a, b in zip(query, plane):
            s += float(a) * float(b)
        if s >= 0:
            qbucket |= 1 << i
    bucketed = with_srp_bucket(df, planes, vec_col)
    return (
        with_cosine(bucketed.filter(F.col("srp_bucket") == qbucket), query, vec_col)
        .select(id_col, "cos_sim")
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


# ----------------------------------------------------------- SemDeDup


def semdedup_pairs(
    df: DataFrame,
    centroids: np.ndarray,
    threshold_ppm: int = 900_000,
    frac_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_l, id_r): within-IVF-cell pairs whose fixed-point cosine
    clears threshold_ppm/1e6 — the candidate-generation half of SemDeDup
    (Abbas et al. 2023: cluster embeddings with k-means, prune only
    INSIDE each cluster), recast on this module's primitives.

    The self-join is keyed on ``ivf_cell``, so the quadratic blow-up is
    bounded per cell, never corpus-wide: with k ∝ n (SemDeDup's own
    prescription) cell population stays ~constant and total work is
    O(n · cell_size). Skewed cells split under AQE like any hash join.

    The threshold test is EXACT: cos(u,v) >= t is evaluated on quantized
    int64 vectors as qdot > 0 AND qdot²·10¹² >= t_ppm²·|u|²·|v|² in
    decimal(38,0) arithmetic (Spark) / HUGEINT (DuckDB oracle) — no
    float ULP can flip a pair's membership between engines."""
    t = int(threshold_ppm)
    d = with_quantized(
        with_ivf_cell(df, centroids, vec_col), vec_col, "_qv", frac_bits
    ).select(
        F.col(id_col).alias("_id"),
        "ivf_cell",
        "_qv",
        F.aggregate(
            F.col("_qv"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x * x,
        ).alias("_n2"),
    )
    l = d.select(
        F.col("_id").alias("id_l"),
        F.col("ivf_cell"),
        F.col("_qv").alias("_qvl"),
        F.col("_n2").alias("_n2l"),
    )
    r = d.select(
        F.col("_id").alias("id_r"),
        F.col("ivf_cell"),
        F.col("_qv").alias("_qvr"),
        F.col("_n2").alias("_n2r"),
    )
    pairs = l.join(r, ["ivf_cell"]).filter(F.col("id_l") < F.col("id_r"))
    pairs = pairs.withColumn(
        "_qdot",
        F.aggregate(
            F.zip_with(F.col("_qvl"), F.col("_qvr"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    keep = F.expr(
        f"_qdot > 0 AND "
        f"cast(_qdot as decimal(38,0)) * cast(_qdot as decimal(38,0))"
        f" * cast(1000000000000 as decimal(38,0)) >= "
        f"cast({t} as decimal(38,0)) * cast({t} as decimal(38,0))"
        f" * cast(_n2l as decimal(38,0)) * cast(_n2r as decimal(38,0))"
    )
    return pairs.filter(keep).select("id_l", "id_r")


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold_ppm: int = 900_000,
    frac_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cluster_id, is_dup): full SemDeDup assignment — semantic
    near-dup pairs closed transitively (min-label propagation), each
    cluster keeping its min-id vector as the representative (is_dup =
    false); singletons are their own kept cluster.

    Cost = semdedup_pairs (cell-bounded join) + O(cluster diameter)
    bounded label-propagation jobs over the EDGE list only — the corpus
    table is touched twice (pair generation, final left join)."""
    from .dedup import connected_components

    pairs = semdedup_pairs(
        df, centroids, threshold_ppm, frac_bits, vec_col, id_col
    )
    cc = connected_components(pairs, "id_l", "id_r")
    ids = df.select(F.col(id_col))
    return (
        ids.join(cc, ids[id_col] == cc["node"], "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_dup", F.col("cluster_id") != F.col(id_col))
    )

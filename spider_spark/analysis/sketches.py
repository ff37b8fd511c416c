"""Approximate-cardinality and frequency sketches, integer-exact.

Two sketch families a 100-TB corpus pipeline leans on constantly:

  - ``hll_registers`` / ``hll_distinct``: HyperLogLog approximate distinct
    counting (Flajolet et al. 2007) — per-host distinct-URL estimates,
    per-source distinct-token estimates — where the exact
    ``count(distinct)`` would shuffle every distinct value. The sketch
    reduces a group to ``m = 2^p`` integer registers (max leading-zero
    rank per bucket), merged with ``max`` — associative, so the groupBy
    is combine-heavy and the shuffle moves m-row register sets, never the
    values.
  - ``cms_sketch`` / ``cms_estimate``: count-min sketch (Cormode &
    Muthukrishnan 2005) — heavy-hitter token counts in bounded memory.
    The sketch is a fixed (depth × width) grid of counters built by ONE
    combine-heavy groupBy over (row, bucket); estimates are the min over
    depth counters, an upward-biased bound. At lake scale the sketch
    (d·w rows, e.g. 4×1024) broadcasts; candidates join map-side.

Determinism contract (the repo-wide oracle pattern): every hash is the
portable ``md5_u32`` (functions/hashing.py) and every arithmetic step —
including the HLL harmonic-mean estimate — is exact 64-bit integer with a
fixed rational alpha, so Spark, DuckDB and Python produce bit-identical
sketches AND estimates on any engine and any summation order. The usual
float formulation cannot be oracle-checked value-exactly; this one can.

The reference keeps its seen-set exact (Supervisor.scala:44 ``Map[URL,
Int]``); these sketches are the north-rule 10^10-scale companions for the
*analytics* side (the crawl's own dedup stays exact via the bloom/cuckoo +
anti-join path in operators/dedup.py — approximation never touches R4).

Small-range note: ``hll_distinct`` reports the RAW HLL estimator only. The
standard small-range linear-counting correction needs ``ln`` (float) and
would break the integer-exactness contract, so instead of silently
degrading we also emit ``n_zero_registers`` — the quantity the correction
is computed from — letting the consumer apply any float correction
downstream. Estimates at n >> m (the 100-TB regime) are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.hashing import md5_u32_sql

# fixed-point scale for 2^-register terms in the HLL denominator
HLL_K = 30


def _hll_alpha(m: int) -> tuple[int, int]:
    """Exact rational alpha_m = 0.7213 / (1 + 1.079/m) as
    (7213*m, 10*(1000*m + 1079)) — the published constant for m >= 128
    applied uniformly (documented deviation: classic HLL special-cases
    m in {16,32,64}; one rational keeps the oracle a single formula)."""
    return 7213 * m, 10 * (1000 * m + 1079)


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 6,
) -> DataFrame:
    """(group..., bucket, r): HLL registers — max leading-zero rank per
    bucket of the 32-bit md5 value hash. bucket = low ``p`` bits; rank is
    over the remaining w = 32-p bits (rho = w - floor(log2(suffix)) via
    ``length(bin(x))``; all-zero suffix => w+1). Only nonzero registers
    are materialized (empty buckets are implicit zeros — at 10^10 scale
    most groups saturate all m anyway)."""
    if not 4 <= p <= 12:
        raise ValueError("p must be in [4, 12]")
    w = 32 - p
    h = md5_u32_sql(f"cast({value_col} as string)")
    gcols = [F.col(c) for c in group_cols]
    # NULL values never enter the sketch (count-distinct convention);
    # bind the md5 hash once per row (projection), then derive bucket/rho
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *gcols, F.expr(h).alias("_h")
    )
    return (
        hashed.select(
            *gcols,
            F.expr(f"_h % {1 << p}").alias("bucket"),
            F.expr(
                f"case when (_h div {1 << p}) = 0 then {w + 1} "
                f"else {w} - (length(bin(_h div {1 << p})) - 1) end"
            )
            .cast("long")
            .alias("rho"),
        )
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 6,
) -> DataFrame:
    """(group..., est_distinct, n_nonzero, n_zero_registers): raw HLL
    estimate in exact int64 fixed-point.

    est = (7213*m * m^2 * 2^K) DIV ((10*(1000m+1079)) * denom) where
    denom = sum over all m buckets of 2^(K - r) (empty bucket: r=0 term
    2^K). Numerator 7213 * 2^(3p) * 2^K stays < 2^62 for p <= 6 with
    K=30 (asserted); every engine computes the identical integer."""
    m = 1 << p
    num = 7213 * m * m * m * (1 << HLL_K)
    assert num < (1 << 62), "p too large for exact int64 numerator"
    _, alpha_den = _hll_alpha(m)
    regs = hll_registers(df, value_col, group_cols, p)
    gcols = [F.col(c) for c in group_cols]
    agg = regs.groupBy(*gcols).agg(
        F.sum(F.expr(f"cast(shiftleft(1L, {HLL_K} - r) as long)")).alias(
            "_nz_sum"
        ),
        F.count("*").cast("long").alias("n_nonzero"),
    )
    denom = f"(_nz_sum + ({m} - n_nonzero) * {1 << HLL_K})"
    return agg.select(
        *gcols,
        F.expr(f"{num} div ({alpha_den} * {denom})")
        .cast("long")
        .alias("est_distinct"),
        "n_nonzero",
        F.expr(f"{m} - n_nonzero").cast("long").alias("n_zero_registers"),
    )


def hll_sql(
    table: str,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 6,
    registers_only: bool = False,
    where: str = "",
) -> str:
    """DuckDB replica of hll_registers / hll_distinct (same md5-derived
    hash, same integer fixed-point estimate)."""
    from spider_spark.functions.hashing import md5_u32_duckdb

    m = 1 << p
    w = 32 - p
    num = 7213 * m * m * m * (1 << HLL_K)
    _, alpha_den = _hll_alpha(m)
    h = md5_u32_duckdb(f"CAST({value_col} AS VARCHAR)")
    g = ", ".join(group_cols)
    gsel = (g + ", ") if g else ""
    gby = f"GROUP BY {g}, bucket" if g else "GROUP BY bucket"
    gby2 = f"GROUP BY {g}" if g else ""
    null_guard = f"{value_col} IS NOT NULL"
    wh = f"WHERE ({where}) AND {null_guard}" if where else f"WHERE {null_guard}"
    regs = f"""
      SELECT {gsel}({h}) % {m} AS bucket,
             CAST(CASE WHEN (({h}) // {1 << p}) = 0 THEN {w + 1}
                  ELSE {w} - (length(bin(({h}) // {1 << p})) - 1)
                  END AS BIGINT) AS rho
        FROM {table} {wh}
    """
    reg_agg = f"""
      SELECT {gsel}bucket, CAST(max(rho) AS BIGINT) AS r
        FROM ({regs}) {gby}
    """
    if registers_only:
        return reg_agg
    return f"""
      WITH ra AS ({reg_agg}),
      agg AS (
        SELECT {gsel}
               sum((1::BIGINT << ({HLL_K} - r)))::BIGINT AS _nz_sum,
               count(*)::BIGINT AS n_nonzero
          FROM ra {gby2}
      )
      SELECT {gsel}
             CAST({num} // ({alpha_den} *
                  (_nz_sum + ({m} - n_nonzero) * {1 << HLL_K}))
                  AS BIGINT) AS est_distinct,
             n_nonzero,
             CAST({m} - n_nonzero AS BIGINT) AS n_zero_registers
        FROM agg
    """


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """(j, bucket, c): count-min sketch grid. Each item increments one
    counter per hash row j (bucket_j = md5_u32(value || '#' || j) % width,
    independent rows via the salt). ONE combine-heavy groupBy — the
    shuffle carries at most depth*width partially-combined rows per map
    task, regardless of corpus size; the sketch itself is the broadcast
    artifact downstream estimates join against."""
    wexpr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    df = df.filter(F.col(value_col).isNotNull())
    # ONE scan: per row, project the depth (j, bucket) pairs as an array
    # and posexplode — a depth-way unionAll would re-read the corpus
    # depth times for the same grid
    inner = md5_u32_sql(
        f"concat(cast({value_col} as string), '#', cast(j as string))"
    )
    pairs = F.expr(
        f"transform(sequence(0, {depth - 1}), j -> named_struct("
        f"'j', cast(j as bigint), "
        f"'bucket', cast(({inner}) % {width} as bigint)))"
    )
    return (
        df.select(wexpr.alias("_w"), F.posexplode(pairs).alias("_p", "_s"))
        .select(F.col("_s.j").alias("j"), F.col("_s.bucket").alias("bucket"), "_w")
        .groupBy("j", "bucket")
        .agg(F.sum("_w").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(value, est): count-min point estimate = min over the depth
    counters each candidate hashes to. The sketch side is broadcast
    (d*w rows by construction) so the candidate scan never shuffles."""
    candidates = candidates.filter(F.col(value_col).isNotNull())
    probes = [
        candidates.select(
            F.col(value_col).alias("value"),
            F.lit(j).cast("long").alias("j"),
            F.expr(
                md5_u32_sql(f"concat(cast({value_col} as string), '#', {j})")
                + f" % {width}"
            )
            .cast("long")
            .alias("bucket"),
        )
        for j in range(depth)
    ]
    p = probes[0]
    for q in probes[1:]:
        p = p.unionAll(q)
    joined = p.join(F.broadcast(sketch), ["j", "bucket"], "left").select(
        "value", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    return joined.groupBy("value").agg(F.min("c").alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(value, est): top-k candidates by count-min estimate (est desc,
    value asc tiebreak — total order, engine-independent). Candidates are
    the distinct values of the input (at true lake scale the candidate
    set comes from a cheaper pre-pass; the sketch math is identical).
    Compiles to TakeOrderedAndProject — no global sort materializes."""
    sketch = cms_sketch(df, value_col, depth, width)
    cands = df.select(F.col(value_col)).distinct()
    est = cms_estimate(sketch, cands, value_col, depth, width)
    return est.orderBy(F.desc("est"), F.asc("value")).limit(k)


def _cms_probe_sql(value_expr: str, depth: int, width: int) -> str:
    """DuckDB: UNION ALL arms computing (j, bucket) per candidate."""
    from spider_spark.functions.hashing import md5_u32_duckdb

    arms = []
    for j in range(depth):
        h = md5_u32_duckdb(
            f"CAST({value_expr} AS VARCHAR) || '#' || '{j}'"
        )
        arms.append(
            f"SELECT v, {j}::BIGINT AS j, ({h}) % {width} AS bucket FROM _vals"
        )
    return " UNION ALL ".join(arms)


def cms_sql(
    table: str,
    value_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    sketch_only: bool = False,
) -> str:
    """DuckDB replica of cms_sketch / cms_heavy_hitters."""
    from spider_spark.functions.hashing import md5_u32_duckdb

    arms = []
    for j in range(depth):
        h = md5_u32_duckdb(f"CAST({value_col} AS VARCHAR) || '#' || '{j}'")
        arms.append(
            f"SELECT {j}::BIGINT AS j, ({h}) % {width} AS bucket, "
            f"1::BIGINT AS w FROM {table} WHERE {value_col} IS NOT NULL"
        )
    grid = f"""
      SELECT j, bucket, sum(w)::BIGINT AS c
        FROM ({' UNION ALL '.join(arms)}) GROUP BY j, bucket
    """
    if sketch_only:
        return grid
    return f"""
      WITH sketch AS ({grid}),
      _vals AS (SELECT DISTINCT {value_col} AS v FROM {table}
                 WHERE {value_col} IS NOT NULL),
      probes AS ({_cms_probe_sql('v', depth, width)}),
      est AS (
        SELECT p.v AS value, min(coalesce(s.c, 0))::BIGINT AS est
          FROM probes p LEFT JOIN sketch s USING (j, bucket)
         GROUP BY p.v
      )
      SELECT value, est FROM est
       ORDER BY est DESC, value ASC LIMIT {k}
    """


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    key_cols: tuple = (),
    k: int = 64,
) -> DataFrame:
    """(key..., est_distinct, n_mins, kth_hash): k-minimum-values
    distinct sketch (Bar-Yossef et al. 2002, the theta-sketch core) per
    key group.

    The sketch keeps the k smallest DISTINCT ``md5_u32`` hash values of
    the group; with the kth minimum at ``t`` the estimator is
    ``(k-1) * 2^32 // t`` — pure int64, so (unlike HLL's float
    formulation) estimate included it is bit-identical on any engine.
    Groups with fewer than k distinct values report their EXACT distinct
    count (n_mins < k ⇒ est = n_mins) — KMV degrades to exact counting
    on small groups, complementing hll_distinct's uncorrected small
    range.

    Plan shape: one (key, hash)-distinct aggregation (combine-heavy —
    duplicate values collapse map-side), then a per-key bottom-k window
    that compiles to WindowGroupLimit (per-partition k-prune before the
    shuffle), then a k-row-per-key groupBy. The shuffle never carries
    more than k surviving hashes per key per partition."""
    from pyspark.sql import Window

    h = F.expr(md5_u32_sql(f"cast({value_col} as string)"))
    kcols = [F.col(c) for c in key_cols]
    # NULLs are excluded from the count-distinct, matching hll_distinct /
    # cms_sketch (and the engines' opposite NULLS FIRST/LAST defaults
    # would otherwise rank a null hash differently in the bottom-k)
    distinct_h = (
        df.filter(F.col(value_col).isNotNull())
        .select(*kcols, h.alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy("_h")
    mins = distinct_h.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    two32 = 1 << 32
    return (
        mins.groupBy(*kcols)
        .agg(
            F.count("*").cast("long").alias("n_mins"),
            F.max("_h").cast("long").alias("kth_hash"),
        )
        .select(
            *kcols,
            F.expr(
                f"cast(if(n_mins < {k}, n_mins, "
                f"({k} - 1) * cast({two32} as bigint) div kth_hash) "
                "as long)"
            ).alias("est_distinct"),
            "n_mins",
            "kth_hash",
        )
    )


def kmv_sql(
    table: str,
    value_col: str,
    key_cols: tuple = (),
    k: int = 64,
) -> str:
    """DuckDB replica of ``kmv_distinct`` — same hash, same integer
    estimator."""
    from spider_spark.functions.hashing import md5_u32_duckdb

    h = md5_u32_duckdb(f"CAST({value_col} AS VARCHAR)")
    keys = ", ".join(key_cols)
    ksel = f"{keys}, " if key_cols else ""
    part = f"PARTITION BY {keys} " if key_cols else ""
    grp = f"GROUP BY {keys}" if key_cols else ""
    two32 = 1 << 32
    return f"""
    WITH dh AS (
      SELECT DISTINCT {ksel}{h} AS _h FROM {table}
      WHERE {value_col} IS NOT NULL
    ), mins AS (
      SELECT {ksel}_h,
             row_number() OVER ({part}ORDER BY _h) AS _rn
      FROM dh
    )
    SELECT {ksel}
           CAST(CASE WHEN count(*) < {k} THEN count(*)
                ELSE ({k} - 1) * {two32} // max(_h) END AS BIGINT)
             AS est_distinct,
           count(*)::BIGINT AS n_mins,
           max(_h)::BIGINT AS kth_hash
    FROM mins WHERE _rn <= {k}
    {grp}
    """

"""Deterministic corpus sampling and distribution statistics.

Training-data pipelines constantly need (a) a reproducible stratified
sample (per-language/per-source eval slices, ablation subsets) and (b)
length-distribution quantiles to pick filter thresholds. Both are
expressed so the exact same answer is computable in ANSI SQL:

  - ``sample_stratified`` ranks inside each stratum by ``md5(id)`` — a
    deterministic pseudo-random order both engines hash identically —
    and keeps the top n. One shuffle on the strata key; no global sort,
    no ``orderBy(rand())`` (whose sample changes per run and whose sort
    is a full-data exchange).
  - ``split_assign`` gives every id a stable train/val/test assignment
    from a salted md5 bucket — growth-stable (ids never migrate splits
    as the corpus changes), engine-portable, zero shuffle.
  - ``length_stats`` uses Spark's exact ``percentile`` (linear
    interpolation, same rule as DuckDB's ``quantile_cont``). Exact
    percentiles shuffle all group values to one reducer per group — fine
    keyed by low-cardinality strata like lang; at 100 TB over a
    high-cardinality key you'd switch to ``percentile_approx`` and lose
    the oracle, so this keeps the exact variant as the contract surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_u32_duckdb, md5_u32_sql


def sample_stratified(
    df: DataFrame,
    strata: Sequence[str] = ("lang", "source"),
    id_col: str = "doc_id",
    n_per_stratum: int = 20,
) -> DataFrame:
    """Keep a deterministic n-row sample per stratum: rank by md5 of the
    id (uniform, engine-portable) with the raw id as tie-break, keep
    rank <= n. Compiles to WindowGroupLimit, so each shuffle partition
    prunes to n rows before the final per-stratum sort."""
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(*[F.col(c) for c in strata]).orderBy(*order)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_stratum)
        .select(id_col, *strata, "sample_rank")
    )


def length_stats(
    df: DataFrame,
    group_col: str = "lang",
    len_col: str = "n_chars",
) -> DataFrame:
    """Per-group length distribution: count, mean, exact p50/p90/p99
    (linear interpolation — ``quantile_cont`` semantics)."""
    c = F.col(len_col)
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(c), 4).alias("avg_len"),
        F.round(F.expr(f"percentile({len_col}, 0.5)"), 4).alias("p50"),
        F.round(F.expr(f"percentile({len_col}, 0.9)"), 4).alias("p90"),
        F.round(F.expr(f"percentile({len_col}, 0.99)"), 4).alias("p99"),
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    val_permille: int = 10,
    test_permille: int = 10,
    salt: str = "split-v1",
) -> DataFrame:
    """(id_col, bucket, split) — deterministic train/val/test hash split:
    bucket = md5_u32(salt || id) mod 1000; the first ``test_permille``
    buckets are 'test', the next ``val_permille`` are 'val', the rest
    'train'.

    Assignment is a pure function of (salt, id): stable across runs,
    engines, partitionings, AND corpus growth — a document never changes
    split when other documents are added or removed, the leakage
    guarantee `orderBy(rand())` splits cannot give. Change ``salt`` to
    draw an independent split. Narrow projection, zero shuffle — at
    100 TB this is a free column on the scan."""
    assert 0 <= test_permille and 0 <= val_permille
    assert test_permille + val_permille < 1000
    bucket = F.expr(
        f"{md5_u32_sql(f'concat({salt!r}, cast({id_col} as string))')} % 1000"
    ).cast("long")
    return df.select(
        id_col,
        bucket.alias("bucket"),
    ).withColumn(
        "split",
        F.when(F.col("bucket") < test_permille, F.lit("test"))
        .when(F.col("bucket") < test_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def split_assign_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    val_permille: int = 10,
    test_permille: int = 10,
    salt: str = "split-v1",
) -> str:
    u32 = md5_u32_duckdb(f"{salt!r} || {id_col}::VARCHAR")
    return f"""
    SELECT {id_col}, bucket,
           CASE WHEN bucket < {test_permille} THEN 'test'
                WHEN bucket < {test_permille + val_permille} THEN 'val'
                ELSE 'train' END AS split
    FROM (SELECT {id_col}, ({u32} % 1000)::BIGINT AS bucket FROM {table})
    """


def sample_stratified_sql(
    table: str = "documents",
    strata: Sequence[str] = ("lang", "source"),
    id_col: str = "doc_id",
    n_per_stratum: int = 20,
) -> str:
    cols = ", ".join(strata)
    return f"""
    SELECT {id_col}, {cols}, sample_rank FROM (
      SELECT {id_col}, {cols},
             row_number() OVER (PARTITION BY {cols}
                                ORDER BY md5({id_col}::VARCHAR), {id_col})
               AS sample_rank
      FROM {table})
    WHERE sample_rank <= {n_per_stratum}
    """


def length_stats_sql(
    table: str = "documents",
    group_col: str = "lang",
    len_col: str = "n_chars",
) -> str:
    return f"""
    SELECT {group_col},
           count(*) AS n_docs,
           round(avg({len_col}), 4) AS avg_len,
           round(quantile_cont({len_col}, 0.5), 4) AS p50,
           round(quantile_cont({len_col}, 0.9), 4) AS p90,
           round(quantile_cont({len_col}, 0.99), 4) AS p99
    FROM {table} GROUP BY {group_col}
    """


def mix_quotas(targets: dict, total_n: int) -> dict:
    """Integer per-group quotas for a target mixture (ppm weights) by
    the largest-remainder (Hamilton) method: floor shares first, then
    one extra doc per group in remainder-descending order (ties by
    group name ascending). Pure function — exact, deterministic, and
    shared verbatim by the Spark selection and its SQL oracle.

    ``targets`` maps group -> ppm (parts per million); weights need not
    sum to exactly 1e6 — shares are normalized by the actual sum."""
    tot_w = sum(targets.values())
    if tot_w <= 0 or total_n <= 0:
        return {g: 0 for g in targets}
    floors = {
        g: (total_n * w) // tot_w for g, w in targets.items()
    }
    rem = total_n - sum(floors.values())
    by_remainder = sorted(
        targets,
        key=lambda g: (-((total_n * targets[g]) % tot_w), g),
    )
    out = dict(floors)
    for g in by_remainder[:rem]:
        out[g] += 1
    return out


def mix_sample(
    df: DataFrame,
    targets: dict,
    total_n: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-mixture sample: per group, the md5-ranked
    top ``quota`` documents, quotas from ``mix_quotas`` (largest
    remainder). Groups outside ``targets`` are dropped; a group with
    fewer docs than its quota contributes everything it has (the
    shortfall is reported, not silently rebalanced — rebalancing would
    make quota a function of data and break run-to-run comparability).

    Plan: one WindowGroupLimit ranked selection (the sample_stratified
    shape) with per-group ceilings from a broadcast quota literal —
    never a global sort, never rand()."""
    quotas = mix_quotas(targets, total_n)
    qmap = F.create_map(
        *[x for g, q in sorted(quotas.items()) for x in (F.lit(g), F.lit(q))]
    )
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.where(F.col(group_col).isin(list(quotas)))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= qmap[F.col(group_col)])
        .select(id_col, group_col, "sample_rank")
    )


def mix_sample_sql(
    table: str,
    targets: dict,
    total_n: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replica of ``mix_sample`` (same python-computed quotas)."""
    quotas = mix_quotas(targets, total_n)
    cases = " ".join(
        f"WHEN '{g}' THEN {q}" for g, q in sorted(quotas.items())
    )
    groups = ", ".join(f"'{g}'" for g in sorted(quotas))
    return f"""
    SELECT {id_col}, {group_col}, sample_rank FROM (
      SELECT {id_col}, {group_col},
             row_number() OVER (PARTITION BY {group_col}
                 ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col})
               AS sample_rank
      FROM {table} WHERE {group_col} IN ({groups}))
    WHERE sample_rank <= CASE {group_col} {cases} END
    """

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

"""SemDeDup (analysis/similarity.semantic_dedup): known-value cluster
assignment on hand-built vectors, transitive closure, and full
Spark-vs-DuckDB replica equality over planted-duplicate fixture
embeddings."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spider_spark.analysis.oracles import semdedup_sql
from spider_spark.analysis.similarity import (
    ivf_centroids,
    semantic_dedup,
    semdedup_pairs,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_planted_copies_cluster(spark):
    base = [0.5, -0.25, 0.125, 0.75]
    other = [-0.5, 0.25, 0.6, -0.1]
    rows = [
        (1, base),
        (2, base),          # exact copy of 1
        (3, [2 * x for x in base]),  # same direction, 2x scale (cos = 1)
        (4, other),
        (5, [0.9, 0.9, 0.9, 0.9]),   # unrelated singleton
    ]
    cents = ivf_centroids(4, 3)
    out = {
        (r["vec_id"], r["cluster_id"], r["is_dup"])
        for r in semantic_dedup(_vecs(spark, rows), cents, 950_000).collect()
    }
    assert (1, 1, False) in out and (2, 1, True) in out
    # 2x scaling preserves cosine exactly even after floor-quantization
    # of these dyadic-rational coordinates
    assert (3, 1, True) in out
    assert (4, 4, False) in out and (5, 5, False) in out


def test_transitive_closure_single_cluster(spark):
    # a ~ b and b ~ c via small rotations; a ~ c also holds here, but the
    # assertion is about the CLOSURE: one cluster, min-id representative
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.98, 0.199, 0.0, 0.0]
    c = [0.92, 0.39, 0.0, 0.0]
    cents = ivf_centroids(4, 2)
    out = semantic_dedup(
        _vecs(spark, [(10, a), (11, b), (12, c)]), cents, 900_000
    ).collect()
    assert {(r["vec_id"], r["cluster_id"]) for r in out} == {
        (10, 10), (11, 10), (12, 10)
    }
    pairs = {
        (r["id_l"], r["id_r"])
        for r in semdedup_pairs(
            _vecs(spark, [(10, a), (11, b), (12, c)]), cents, 900_000
        ).collect()
    }
    assert (10, 11) in pairs and (11, 12) in pairs


def test_below_threshold_no_pairs(spark):
    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
    cents = ivf_centroids(4, 2)
    assert semdedup_pairs(_vecs(spark, rows), cents, 900_000).count() == 0
    out = semantic_dedup(_vecs(spark, rows), cents, 900_000).collect()
    assert all(not r["is_dup"] for r in out)


def test_semdedup_matches_duckdb(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = emb.unionByName(
        emb.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    cents = ivf_centroids(64, 8)
    got = {
        tuple(r) for r in semantic_dedup(planted, cents, 900_000).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    sub = """(
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 7 = 0
    )"""
    want = {tuple(r) for r in con.sql(semdedup_sql(cents, sub, 900_000)).fetchall()}
    assert got == want
    # every planted copy is flagged against its original
    dups = {(a, b) for a, b, d in got if d}
    assert dups and all(a == b + 100000 for a, b in dups)

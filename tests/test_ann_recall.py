"""ANN recall@k vs brute force on the REAL (non-planted) sf0.01
embeddings table — the number a user tuning n_bits / probe_cells needs
(VERDICT r02 missing #4). The value-exactness of the ANN paths is pinned
elsewhere (driver rows + planted fixtures); this file pins retrieval
QUALITY floors so a refactor that silently guts recall fails loudly.

Measured on sf0.01 (500 vectors, 5 data-vector queries, k=10) — see
SURVEY.md §8 for the recorded numbers.
"""

import os

import pytest
from pyspark.sql import functions as F

from spider_spark.analysis import similarity as S

SF_DIR = os.environ.get("SPARK_GRAFT_RECALL_SF", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")),
    reason="driver testdata not present",
)

QUERY_IDS = [3, 97, 211, 340, 444]
K = 10


def _emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def _queries(df):
    rows = df.filter(F.col("vec_id").isin(QUERY_IDS)).collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def test_ann_topk_recall_floors(spark):
    df = _emb(spark).select("vec_id", "embedding").cache()
    qs = _queries(df)
    assert len(qs) == len(QUERY_IDS)
    dim = len(next(iter(qs.values())))
    planes = S.srp_planes(dim, n_bits=4)
    cents = S.ivf_centroids(dim, k=8)

    rec_lsh, rec_ivf, rec_ivf1 = [], [], []
    for _qid, q in sorted(qs.items()):
        exact = {r["vec_id"] for r in S.cosine_topk(df, q, K).collect()}
        lsh = {
            r["vec_id"] for r in S.ann_topk_lsh(df, q, planes, K).collect()
        }
        ivf2 = {
            r["vec_id"]
            for r in S.ann_topk_ivf(df, q, cents, nprobe=2, k=K).collect()
        }
        ivf1 = {
            r["vec_id"]
            for r in S.ann_topk_ivf(df, q, cents, nprobe=1, k=K).collect()
        }
        rec_lsh.append(len(exact & lsh) / K)
        rec_ivf.append(len(exact & ivf2) / K)
        rec_ivf1.append(len(exact & ivf1) / K)
    df.unpersist()
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    print(
        f"recall@10 lsh(4 bits)={mean(rec_lsh):.2f} "
        f"ivf(nprobe=2/8)={mean(rec_ivf):.2f} "
        f"ivf(nprobe=1/8)={mean(rec_ivf1):.2f}"
    )
    # Measured on the driver's sf0.01 embeddings (weakly clustered — the
    # honest hard case): lsh(4 bits) = 0.22 for a 1/16 scan, ivf(2/8) =
    # 0.52 for a ~1/4 scan, ivf(1/8) = 0.40. Floors sit under the
    # measured values so a refactor that silently guts retrieval fails;
    # the recorded numbers (SURVEY §8) are what a user tuning
    # n_bits/probe_cells trades against scan fraction.
    assert mean(rec_lsh) >= 0.15, rec_lsh
    assert mean(rec_ivf) >= 0.40, rec_ivf
    assert mean(rec_ivf1) >= 0.30, rec_ivf1
    # more probes can only widen the candidate set → recall is monotone
    assert mean(rec_ivf) >= mean(rec_ivf1) - 1e-9


def test_semdedup_pair_recall(spark):
    """SemDeDup candidate pairs (cell-bounded) vs the brute-force O(n²)
    near-dup baseline at the same rounded-cosine threshold."""
    df = _emb(spark).select("vec_id", "embedding").cache()
    # adaptive threshold: these embeddings are weakly clustered, so walk
    # down until brute force yields a non-trivial pair set to measure
    # against (skip only if even 0.5 finds nothing)
    brute, thr = set(), None
    # (measured: max pairwise cosine on this table is ~0.51, p99 ~0.29 —
    # genuinely spread-out vectors, so the ladder reaches down to 0.4)
    for cand_thr in (0.9, 0.7, 0.5, 0.45, 0.4):
        brute = {
            (r["id_a"], r["id_b"])
            for r in S.embedding_near_dup(df, threshold=cand_thr).collect()
        }
        if len(brute) >= 5:
            thr = cand_thr
            break
    if thr is None:
        pytest.skip("no brute-force pairs down to threshold 0.4")
    # SemDeDup prescribes k-means-CLUSTERED cells (Abbas et al. 2023) —
    # untrained random-direction centroids are the degenerate baseline,
    # Lloyd-trained cells (ivf_train) are the operator as prescribed.
    # Pairs straddling two cells are out of scope by design, so recall
    # here measures cell cohesion, not exactness (planted fixtures pin
    # exactness elsewhere); training must not LOWER cohesion.
    dim = len(df.head(1)[0]["embedding"])
    ppm = int(thr * 1_000_000)

    def pair_recall(cents):
        cell = {
            (r["id_l"], r["id_r"])
            for r in S.semdedup_pairs(df, cents, threshold_ppm=ppm).collect()
        }
        return len(brute & cell) / len(brute)

    r_seed = pair_recall(S.ivf_centroids(dim, k=8))
    r_train = pair_recall(S.ivf_train(df, k=8, iters=3))
    df.unpersist()
    print(
        f"semdedup pair recall@thr={thr}: seeded={r_seed:.2f} "
        f"trained={r_train:.2f} of {len(brute)} pairs"
    )
    assert r_train >= r_seed - 1e-9, (r_seed, r_train)
    # measured 0.29 (seeded == trained) on this table: the 14 brute pairs
    # sit at cos ≈ 0.45 on genuinely unclustered vectors — the hard case
    # the within-cell design trades away. Floor just below measured.
    assert r_train >= 0.25, (r_train, len(brute))

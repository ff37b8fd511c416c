"""Tests for the training-data-pipeline operators (analysis/*).

Semantic checks at tiny scale: exact dedup finds planted duplicates,
MinHash-LSH recalls exact duplicates (guaranteed: identical shingle sets
⇒ identical signatures ⇒ same bands), SimHash hamming-0 for identical
texts, embedding near-dup brute-force vs planted near-identical vectors,
SRP-LSH recall of identical vectors, token/fingerprint determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.analysis import dedup as D
from spider_spark.analysis import similarity as S
from spider_spark.analysis import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "the quick brown fox jumps over the lazy dog"),
        ("d2", "the quick brown fox jumps over the lazy dog"),  # exact dup
        ("d3", "the quick brown fox jumps over the lazy cat"),  # near dup
        ("d4", "completely different content about spark engines"),
        ("d5", "  The Quick  Brown Fox jumps over the lazy dog "),  # ws/case
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_duplicates(docs):
    groups = D.exact_duplicates(docs)
    # d1/d2/d5 normalize to one fingerprint (case+whitespace folded)
    dup = [r for r in groups.collect() if r["n_docs"] > 1]
    assert len(dup) == 1 and dup[0]["n_docs"] == 3


def test_minhash_lsh_recalls_exact_dups(docs):
    pairs = D.minhash_lsh_candidates(docs, num_hashes=16, bands=8, shingle_w=2)
    got = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    assert ("d1", "d2") in got  # identical text -> identical signature


def test_ngram_jaccard_scores(docs):
    pairs = D.minhash_lsh_candidates(docs, num_hashes=16, bands=8, shingle_w=2)
    scored = D.ngram_jaccard(pairs, docs, n=2)
    j = {(r["id_l"], r["id_r"]): r["jaccard"] for r in scored.collect()}
    assert j.get(("d1", "d2")) == pytest.approx(1.0)
    for (a, b), v in j.items():
        assert 0.0 <= v <= 1.0
    # the sparse-candidate prune path is row-identical
    pruned = D.ngram_jaccard(pairs, docs, n=2, prune_to_candidates=True)
    jp = {(r["id_l"], r["id_r"]): r["jaccard"] for r in pruned.collect()}
    assert jp == j


def test_minhash_pregroup_collapses_mega_cluster(spark):
    """A mega-cluster of identical docs must enter the banded join as ONE
    representative (no quadratic intra-bucket pairs), while cross-group
    near-dup candidates survive with exact group sizes attached."""
    rows = [(f"c{i:03d}", "spark engines shuffle data across the cluster")
            for i in range(50)]  # 50 byte-identical docs
    rows += [
        ("n1", "spark engines shuffle data across the network"),  # near dup
        ("x1", "totally unrelated words about web crawling here"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")

    reps = D.exact_representatives(df)
    rep_rows = {r["doc_id"]: r["n_exact"] for r in reps.collect()}
    assert rep_rows == {"c000": 50, "n1": 1, "x1": 1}

    pairs = D.minhash_lsh_candidates_pregrouped(
        df, num_hashes=16, bands=8, shingle_w=2
    ).collect()
    got = {(r["id_l"], r["id_r"]): (r["n_exact_l"], r["n_exact_r"])
           for r in pairs}
    # the only candidate pair is rep-vs-near-dup, never the 50*49/2 intra-
    # cluster pairs the plain join would emit
    assert set(got) <= {("c000", "n1"), ("c000", "x1"), ("n1", "x1")}
    assert got[("c000", "n1")] == (50, 1)

    # parity: every pregrouped pair is the rep-projection of a pair the
    # full join emits with the same band-hit count
    full = {(r["id_l"], r["id_r"]): r["n_bands_hit"]
            for r in D.minhash_lsh_candidates(
                df, num_hashes=16, bands=8, shingle_w=2).collect()}
    for r in pairs:
        assert full[(r["id_l"], r["id_r"])] == r["n_bands_hit"]


def test_simhash_identical_zero_distance(docs):
    near = D.simhash_near_duplicates(docs, max_hamming=0)
    got = {(r["id_l"], r["id_r"]) for r in near.collect()}
    assert ("d1", "d2") in got


@pytest.fixture(scope="module")
def vecs(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.standard_normal((20, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # 100: exact copy of 0; 101: tiny perturbation of 1
    rows.append((100, [float(x) for x in base[0]]))
    rows.append((101, [float(x) for x in base[1] + 1e-4 * rng.standard_normal(16)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_near_dup_bruteforce(vecs):
    pairs = S.embedding_near_dup(vecs, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 100) in got and (1, 101) in got
    assert len(got) == 2  # random 16-dim vectors never reach 0.999


def test_embedding_near_dup_lsh_recalls_identicals(vecs):
    planes = S.srp_planes(16, 4)
    pairs = S.embedding_near_dup(vecs, threshold=0.999, planes=planes)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # identical vectors share every SRP sign bit -> guaranteed same bucket
    assert (0, 100) in got


def test_cosine_topk_self_first(vecs):
    row = vecs.filter(F.col("vec_id") == 3).collect()[0]
    q = [float(x) for x in row["embedding"]]
    top = S.cosine_topk(vecs, q, k=3).collect()
    assert top[0]["vec_id"] == 3 and top[0]["cos_sim"] == pytest.approx(1.0)


def test_ann_lsh_bucket_contains_query(vecs):
    planes = S.srp_planes(16, 3)
    row = vecs.filter(F.col("vec_id") == 0).collect()[0]
    q = [float(x) for x in row["embedding"]]
    top = S.ann_topk_lsh(vecs, q, planes, k=5)
    ids = [r["vec_id"] for r in top.collect()]
    assert 0 in ids and 100 in ids  # query and its exact copy bucket together


def test_ann_ivf_recalls_identical_copy(vecs):
    """An exact copy of the query vector gets the same argmax-cosine cell
    (identical doubles), so probing the query's cells must recall it."""
    cents = S.ivf_centroids(16, 4)
    row = vecs.filter(F.col("vec_id") == 0).collect()[0]
    q = [float(x) for x in row["embedding"]]
    top = S.ann_topk_ivf(vecs, q, cents, nprobe=1, k=5)
    ids = [r["vec_id"] for r in top.collect()]
    assert ids[0] == 0 and 100 in ids

    # assignment is deterministic and total: every vector gets one cell
    cells = S.with_ivf_cell(vecs, cents).select("vec_id", "ivf_cell").collect()
    assert len(cells) == 22 and all(0 <= r["ivf_cell"] < 4 for r in cells)
    again = S.with_ivf_cell(vecs, cents).select("vec_id", "ivf_cell").collect()
    assert sorted(map(tuple, cells)) == sorted(map(tuple, again))


def test_ivf_train_moves_centroids_toward_clusters(spark):
    """Lloyd refinement on two tight planted clusters must produce
    centroids that separate them (each cluster lands in one cell)."""
    import numpy as np

    rng = np.random.RandomState(9)
    a_dir = rng.standard_normal(8)
    b_dir = -a_dir  # opposite direction: trivially separable by cosine
    rows = [(i, [float(x) for x in a_dir + 0.01 * rng.standard_normal(8)])
            for i in range(30)]
    rows += [(100 + i, [float(x) for x in b_dir + 0.01 * rng.standard_normal(8)])
             for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = S.ivf_train(df, k=2, iters=2)
    assigned = S.with_ivf_cell(df, cents).collect()
    cell_of = {r["vec_id"]: r["ivf_cell"] for r in assigned}
    a_cells = {cell_of[i] for i in range(30)}
    b_cells = {cell_of[100 + i] for i in range(30)}
    assert len(a_cells) == 1 and len(b_cells) == 1 and a_cells != b_cells


def test_multimodal_metadata_and_stub(spark):
    import pytest as _pytest

    from spider_spark.analysis import multimodal as M

    refs = spark.createDataFrame(
        [("img://a/1",), ("aud://b/2",), ("weird",)], "media_ref string"
    )
    meta = {r["media_ref"]: r for r in M.media_metadata(refs).collect()}
    assert meta["img://a/1"]["media_kind"] == "img"
    assert meta["weird"]["media_kind"] == "unknown"
    assert all(len(r["sha256"]) == 64 for r in meta.values())

    with _pytest.raises(NotImplementedError):
        M.decode_image_features(refs)  # real decode is stubbed
    feats = M.decode_image_features(refs, fake=True).collect()
    assert len(feats) == 3 and all(len(r["features"]) == 8 for r in feats)
    again = M.decode_image_features(refs, fake=True).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))  # deterministic


def test_codecs_roundtrip_and_real_decode(spark):
    """Pure-numpy BMP/PPM codecs round-trip bit-exactly, and the Spark
    decode path produces true dimensions + block-mean features; corrupt
    and unknown payloads degrade to err rows instead of failing."""
    import numpy as np

    from spider_spark.analysis import codecs as C
    from spider_spark.analysis import multimodal as M

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)  # odd dims
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)

    expected = C.block_mean_features(img, 2)
    rows = [
        ("img://ppm", bytearray(C.encode_ppm(img))),
        ("img://bmp", bytearray(C.encode_bmp(img))),
        ("img://trunc", bytearray(C.encode_bmp(img)[:20])),
        ("img://jpegish", bytearray(b"\xff\xd8\xff\xe0 not decodable")),
        ("img://null", None),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {r["media_ref"]: r
           for r in M.decode_image_features(df, payload_col="payload", n_features=12).collect()}
    for ref in ("img://ppm", "img://bmp"):
        r = out[ref]
        assert (r["width"], r["height"], r["err"]) == (5, 7, None)
        assert np.allclose(r["features"], expected, atol=1e-6)
    assert out["img://trunc"]["err"] is not None
    # JPEG magic now dispatches to the REAL baseline decoder (round 3),
    # which rejects the truncated body with its own error — still an err
    # row, never a stage failure
    assert out["img://jpegish"]["err"] == "no JPEG scan decoded"
    assert out["img://null"]["err"] == "null payload"
    for ref in ("img://trunc", "img://jpegish", "img://null"):
        assert out[ref]["width"] is None and out[ref]["features"] is None


def test_text_ops_deterministic(docs):
    fp1 = {r["doc_id"]: r["fp"] for r in T.fingerprint(docs).collect()}
    fp2 = {r["doc_id"]: r["fp"] for r in T.fingerprint(docs).collect()}
    assert fp1 == fp2
    assert fp1["d1"] == fp1["d2"] == fp1["d5"]
    toks = {r["doc_id"]: r["ws_tokens"] for r in T.token_count(docs).collect()}
    assert toks["d1"] == 9


def test_audio_fingerprint(spark):
    """Energy-delta fingerprint: known value on a hand-built clip,
    volume-scale invariance (the operator's whole point), length packed
    in the high byte so different-length clips never collide, tie bits
    are 0, and corrupt/null payloads degrade to err rows."""
    import numpy as np

    from spider_spark.analysis import codecs as C
    from spider_spark.analysis import multimodal as M

    def clip(amps, k=1):
        s = np.empty(len(amps) * 8, np.int16)
        for t, a in enumerate(amps):
            s[t * 8 : (t + 1) * 8 : 2] = k * a
            s[t * 8 + 1 : (t + 1) * 8 : 2] = -k * a
        return bytearray(C.encode_wav(s, 8000))

    amps = [512, 1024, 256, 256, 2048]  # up, down, TIE, up
    rows = [
        ("a:base", clip(amps)),
        ("a:loud", clip(amps, k=3)),          # same fp, different bytes
        ("a:short", clip(amps[:4])),          # prefix clip: other length
        ("a:bad", bytearray(b"RIFFxxxxWAVE")),
        ("a:null", None),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {r["media_ref"]: r for r in M.audio_fingerprint(df).collect()}
    base = out["a:base"]
    # bits: t0 up=1, t1 down=0, t2 tie=0, t3 up=1 -> 0b1001; nf=5<<56
    assert base["afp"] == 0b1001 | (5 << 56) and base["n_frames"] == 5
    assert out["a:loud"]["afp"] == base["afp"]
    assert out["a:short"]["afp"] != base["afp"]
    assert out["a:short"]["afp"] & ((1 << 48) - 1) == 0b001
    assert out["a:bad"]["err"] is not None and out["a:bad"]["afp"] is None
    assert out["a:null"]["err"] == "null payload"
    # dedup groups the scaled pair, leaves the short clip + errs alone
    dd = {r["media_ref"]: r for r in M.phash_dedup(
        M.audio_fingerprint(df), hash_col="afp").collect()}
    assert dd["a:loud"]["rep_ref"] == "a:base" and dd["a:loud"]["is_dup"]
    assert not dd["a:short"]["is_dup"] and not dd["a:bad"]["is_dup"]


def test_audio_codec_and_features(spark):
    """WAV encode→decode round-trips (16-bit stereo + 8-bit mono, extra
    RIFF chunks tolerated), features are exact for the square-wave
    fixture, and the Spark operator degrades corrupt payloads to err."""
    import numpy as np

    from spider_spark.analysis import codecs as C
    from spider_spark.analysis import multimodal as M

    # 16-bit stereo round trip
    rng = np.random.RandomState(3)
    st = rng.randint(-32768, 32768, size=(50, 2)).astype(np.int16)
    x, rate = C.decode_wav(C.encode_wav(st, 44100))
    assert rate == 44100 and x.shape == (50, 2)
    assert np.allclose(x, st.astype(np.float32) / 32768.0)

    # extra chunk between fmt and data is skipped by the chunk walker
    wav = C.encode_wav(np.array([1000, -1000] * 4, np.int16), 8000)
    spliced = wav[:36] + b"LIST\x04\x00\x00\x00abcd" + wav[36:]
    x2, _ = C.decode_wav(spliced)
    assert x2.shape[0] == 8

    rows = [
        ("wav://sq", bytearray(C.encode_wav(
            np.array([2048, -2048] * 8, np.int16), 8000))),
        ("wav://bad", bytearray(b"RIFFxxxxWAVE")),
        ("wav://null", None),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {r["media_ref"]: r for r in M.decode_audio_features(df).collect()}
    sq = out["wav://sq"]
    assert (sq["n_samples"], sq["sample_rate"], sq["n_channels"]) == (16, 8000, 1)
    assert sq["rms_x32768"] == 2048 == sq["peak_x32768"]
    assert sq["zero_crossings"] == 15 and sq["err"] is None
    assert out["wav://bad"]["err"] is not None
    assert out["wav://null"]["err"] == "null payload"


def test_frame_container_seek_and_sampling(spark):
    """The SSVF container's index-first layout yields correct offsets, and
    stride sampling through Spark returns exactly the strided frames with
    decoded dimensions and timestamps."""
    import numpy as np

    from spider_spark.analysis import codecs as C
    from spider_spark.analysis import multimodal as M

    frames = [
        C.encode_ppm(np.full((2, 3, 3), 10 * i, np.uint8)) for i in range(5)
    ]
    blob = C.encode_frames(frames, fps=4.0)
    n, fps, offs = C.frame_container_info(blob)
    assert (n, fps) == (5, 4.0)
    # offsets really address each frame's bytes
    for i, (off, size) in enumerate(offs):
        assert blob[off : off + size] == frames[i]
    assert [i for i, _, _ in C.sample_frames(blob, stride=2)] == [0, 2, 4]
    assert [i for i, _, _ in C.sample_frames(blob, stride=2, limit=2)] == [0, 2]

    df = spark.createDataFrame(
        [("vid://a", bytearray(blob)), ("vid://bad", bytearray(b"nope"))],
        "media_ref string, payload binary",
    )
    rows = M.sample_video_frames(df, stride=2).collect()
    good = sorted(
        [r for r in rows if r["media_ref"] == "vid://a"],
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["ts_milli"], r["width"], r["height"], r["mean_pix"])
            for r in good] == [(0, 0, 3, 2, 0), (2, 500, 3, 2, 20), (4, 1000, 3, 2, 40)]
    (bad,) = [r for r in rows if r["media_ref"] == "vid://bad"]
    assert bad["err"] is not None and bad["frame_idx"] is None


def test_resize_nearest_and_operator(spark):
    """Nearest resize follows the half-pixel-center rule (left/right split
    maps to exact halves) and the operator emits exact cell means."""
    import numpy as np

    from spider_spark.analysis import codecs as C
    from spider_spark.analysis import multimodal as M

    img = np.empty((6, 10, 3), np.uint8)
    img[:, :5], img[:, 5:] = 30, 200
    r = C.resize_nearest(img, 4, 4)
    assert r.shape == (4, 4, 3)
    assert (r[:, :2] == 30).all() and (r[:, 2:] == 200).all()
    # upscale also works
    up = C.resize_nearest(img, 20, 12)
    assert up.shape == (12, 20, 3)

    df = spark.createDataFrame(
        [("img://s", bytearray(C.encode_ppm(img))), ("img://bad", None)],
        "media_ref string, payload binary",
    )
    out = {r["media_ref"]: r
           for r in M.resize_image_features(df, width=4, height=4).collect()}
    s = out["img://s"]
    assert (s["orig_width"], s["orig_height"]) == (10, 6)
    assert (s["f00"], s["f01"], s["f10"], s["f11"]) == (30, 200, 30, 200)
    assert out["img://bad"]["err"] == "null payload"


def test_connected_components_and_clusters(spark):
    """Min-label CC merges transitive chains, caps on non-convergence, and
    duplicate_clusters assigns canonical min-id clusters with exact-dup
    members inheriting their representative's component."""
    import pytest as _pytest

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 9)], "id_l long, id_r long"
    )
    cc = {r["node"]: r["comp"]
          for r in D.connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 9}

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_l long, id_r long"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        # force the distributed loop (the cap is its safety valve; the
        # single-task union-find path has no iteration to cap)
        D.connected_components(chain, max_iters=1, local_threshold=0)


def test_connected_components_local_and_distributed_agree(spark):
    """The size-gated single-task union-find and the min-label
    propagation loop are the same operator: identical labels on random
    graphs (long and string ids), forced through each path."""
    import random

    rnd = random.Random(5)
    for trial, n, m in [(0, 40, 60), (1, 80, 50), (2, 30, 29)]:
        pairs = [
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(m)
        ]
        el = spark.createDataFrame(pairs, "id_l long, id_r long")
        local = {
            (r["node"], r["comp"])
            for r in D.connected_components(el).collect()
        }
        dist = {
            (r["node"], r["comp"])
            for r in D.connected_components(
                el, local_threshold=0
            ).collect()
        }
        assert local == dist, f"trial {trial}"
    # string ids through the single-task path (Arrow schema passthrough)
    es = spark.createDataFrame(
        [("d", "b"), ("b", "a"), ("x", "y")], "id_l string, id_r string"
    )
    got = {
        r["node"]: r["comp"] for r in D.connected_components(es).collect()
    }
    assert got == {"a": "a", "b": "a", "d": "a", "x": "x", "y": "x"}

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),      # exact dup of 1
        (3, "alpha beta gamma delta zeta"),          # near dup of 1
        (4, "unrelated totally different words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.duplicate_clusters(
        docs, num_hashes=16, bands=8, shingle_w=2).collect()}
    assert len(out) == 4
    # 1,2 share a fingerprint; 3 is LSH-linked to their representative
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == 1
    assert out[3]["cluster_id"] == 1 and out[1]["cluster_size"] == 3
    assert out[4]["cluster_id"] == 4 and out[4]["cluster_size"] == 1


def test_incremental_dedup_classification(spark):
    """Exact dups of old classify first, banded near-dups second,
    genuinely novel docs pass; exact mask wins over a near match."""
    old = spark.createDataFrame(
        [
            ("o1", "spark engines shuffle data across the cluster"),
            ("o2", "a completely different document about robots"),
        ],
        "doc_id string, text string",
    )
    new = spark.createDataFrame(
        [
            # exact dup of o1 modulo case/whitespace normalization
            ("n1", "  Spark engines   shuffle data across the cluster "),
            # near dup of o1 (one word changed)
            ("n2", "spark engines shuffle data across the network"),
            # novel
            ("n3", "crawling politeness budgets per host and tick"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in D.incremental_dedup(
            new, old, num_hashes=16, bands=8, shingle_w=2
        ).collect()
    }
    assert got["n1"] == ("exact_dup_of_old", None)
    assert got["n2"][0] == "near_dup_of_old" and got["n2"][1] == "o1"
    assert got["n3"] == ("new", None)


def test_incremental_dedup_matches_duckdb(spark):
    import duckdb

    from spider_spark.analysis import oracles as O

    docs = spark.createDataFrame(
        [
            (i, f"the quick brown fox {i % 11} jumps over dog {(i * 7) % 13}")
            for i in range(160)
        ],
        "doc_id long, text string",
    )
    new = docs.filter(F.col("doc_id") % 4 == 0)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    got = sorted(
        map(
            tuple,
            D.incremental_dedup(
                new, old, num_hashes=16, bands=8, shingle_w=2
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    sql = O.incremental_dedup_sql(
        "SELECT * FROM documents WHERE doc_id % 4 = 0",
        "SELECT * FROM documents WHERE doc_id % 4 != 0",
        num_hashes=16,
        bands=8,
        shingle_w=2,
    )
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want

"""Image perceptual-hash dedup (multimodal.image_phash / phash_dedup).

The planted structure (media_fixtures.synth_quad_image): quadrant gray
levels derive from id % group_mod only, while image size and container
(PPM vs BMP) derive from the id — so same-group payloads are perceptual
duplicates with DIFFERENT bytes. Byte hashing cannot group them; the
decoded block-mean hash must.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark.analysis import codecs
from spider_spark.analysis import media_fixtures as MF
from spider_spark.analysis import multimodal as M


def _packed(c00, c01, c10, c11):
    return ((c00 * 256 + c01) * 256 + c10) * 256 + c11


def test_phash_known_value(spark):
    # one hand-built image: quadrants 10/200/77/3 → packed big-endian
    img = np.empty((4, 6, 3), np.uint8)
    img[:2, :3] = 10
    img[:2, 3:] = 200
    img[2:, :3] = 77
    img[2:, 3:] = 3
    df = spark.createDataFrame(
        [("img://x", bytearray(codecs.encode_ppm(img)))],
        "media_ref string, payload binary",
    )
    row = M.image_phash(df).collect()[0]
    assert row["phash"] == _packed(10, 200, 77, 3)
    assert row["err"] is None


def test_cross_container_cross_size_duplicates(spark):
    # ids 0..45 with group_mod=23: ids i and i+23 share content but
    # differ in size/container → same phash, different payload bytes
    ids = spark.range(46).select(F.col("id").alias("event_id"))
    payloads = {
        r["media_ref"]: bytes(r["payload"])
        for r in MF.synth_quad_image(ids).collect()
    }
    out = M.phash_dedup(M.image_phash(MF.synth_quad_image(ids)))
    rows = {r["media_ref"]: r for r in out.collect()}
    for i in range(23):
        a, b = f"img://{i}", f"img://{i + 23}"
        assert payloads[a] != payloads[b]  # bytes differ...
        assert rows[a]["phash"] == rows[b]["phash"]  # ...content equal
        rep = min(a, b)
        assert rows[a]["rep_ref"] == rows[b]["rep_ref"] == rep
        assert rows[rep]["is_dup"] is False
        assert rows[max(a, b)]["is_dup"] is True
    # and the closed-form SQL mirror matches the decoded hash
    for i in (0, 7, 22, 45):
        p = MF.quad_image_params(i)
        exp = _packed(p["c00"], p["c01"], p["c10"], p["c11"])
        assert rows[f"img://{i}"]["phash"] == exp


def test_phash_null_and_garbage_are_singletons(spark):
    img = np.full((4, 4, 3), 9, np.uint8)
    df = spark.createDataFrame(
        [
            ("img://ok", bytearray(codecs.encode_bmp(img))),
            ("img://null", None),
            ("img://bad", bytearray(b"\x89PNG not supported")),
        ],
        "media_ref string, payload binary",
    )
    rows = {r["media_ref"]: r for r in M.phash_dedup(M.image_phash(df)).collect()}
    assert rows["img://ok"]["phash"] == _packed(9, 9, 9, 9)
    for ref in ("img://null", "img://bad"):
        assert rows[ref]["phash"] is None
        assert rows[ref]["rep_ref"] == ref  # undecodables never cluster
        assert rows[ref]["is_dup"] is False


def test_phash_duckdb_equality(spark):
    import __spark_entry__ as em

    ids = spark.range(40).select(F.col("id").alias("event_id"))
    got = (
        M.phash_dedup(M.image_phash(MF.synth_quad_image(ids)))
        .orderBy("media_ref")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT range AS event_id FROM range(40)"
    )
    exp = con.sql(
        em.oracle_sql()["multimodal_phash_dedup"] + " ORDER BY media_ref"
    ).fetchall()
    assert [(r["media_ref"], r["phash"], r["rep_ref"], r["is_dup"]) for r in got] == exp


def test_phash_near_dups_planted(spark):
    # groups=5 over ids 0..19: members of a group agree on >=3 cells;
    # same-parity members ((i//5)%2) are exact, cross-parity differ in
    # exactly the c11 cell
    ids = spark.range(20).select(F.col("id").alias("event_id"))
    out = M.phash_near_dups(
        M.image_phash(MF.synth_near_quad_image(ids, groups=5))
    )
    pairs = {(r["id_l"], r["id_r"]): r["n_equal_cells"] for r in out.collect()}
    assert len(pairs) == 5 * 6  # C(4,2) pairs per group, 5 groups
    for (a, b), n in pairs.items():
        ia, ib = int(a.split("//")[1]), int(b.split("//")[1])
        assert ia % 5 == ib % 5  # never crosses content groups
        same_parity = (ia // 5) % 2 == (ib // 5) % 2
        assert n == (4 if same_parity else 3)


def test_phash_near_duckdb_equality(spark):
    import __spark_entry__ as em

    ids = spark.range(600).select(F.col("id").alias("event_id"))
    got = sorted(
        (r["id_l"], r["id_r"], r["n_equal_cells"])
        for r in M.phash_near_dups(
            M.image_phash(MF.synth_near_quad_image(ids, groups=150))
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT range AS event_id FROM range(600)"
    )
    exp = sorted(
        tuple(t)
        for t in con.sql(em.oracle_sql()["multimodal_phash_near"]).fetchall()
    )
    assert got == exp and len(got) == 150 * 6

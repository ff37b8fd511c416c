"""Z-order clustering + small-file compaction (spider_spark/lake.py):
known-value Morton keys, cross-engine key equality, the data-skipping
property z-ordering exists for, deterministic bin-pack plans with
DuckDB-replica equality, and a real parquet-dir compaction round-trip."""

from __future__ import annotations

import os

import duckdb
import pyspark.sql.functions as F

from spider_spark import lake


def _morton_py(vals: list[int], bits: int) -> int:
    out = 0
    for d, v in enumerate(vals):
        v &= (1 << bits) - 1
        for k in range(bits):
            out |= ((v >> k) & 1) << (k * len(vals) + d)
    return out


# --- z-order ----------------------------------------------------------


def test_zorder_known_values(spark):
    df = spark.createDataFrame(
        [(3, 0), (0, 3), (3, 3), (5, 9)], "x long, y long"
    )
    got = {
        (r["x"], r["y"], r["zkey"])
        for r in lake.with_zorder(df, ["x", "y"], bits=4).collect()
    }
    # bit k of x lands at 2k, of y at 2k+1
    assert got == {
        (3, 0, 0b0101),
        (0, 3, 0b1010),
        (3, 3, 0b1111),
        (5, 9, _morton_py([5, 9], 4)),
    }


def test_zorder_cross_engine_equality(spark):
    rows = [(i, (i * 37) % 101, (i * i) % 67) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        (r["id"], r["zkey"])
        for r in lake.with_zorder(df, ["x", "y"], bits=8).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {x}, {y})" for i, x, y in rows)
        + ") v(id, x, y)"
    )
    zsql = lake.zorder_key_sql(["x", "y"], bits=8, dialect="duckdb")
    want = {
        tuple(r) for r in con.sql(f"SELECT id, {zsql} FROM t").fetchall()
    }
    assert got == want
    for i, x, y in rows:  # and both match the python reference
        assert _morton_py([x, y], 8) == dict(got)[i]


def test_zorder_three_dims(spark):
    df = spark.createDataFrame([(1, 2, 4)], "a long, b long, c long")
    (row,) = lake.with_zorder(df, ["a", "b", "c"], bits=3).collect()
    assert row["zkey"] == _morton_py([1, 2, 4], 3)


def _files_minmax(spark, path):
    """Per-file (min,max) of x and y for every parquet file under path."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("xlo"),
            F.max("x").alias("xhi"),
            F.min("y").alias("ylo"),
            F.max("y").alias("yhi"),
        )
        .collect()
    )


def test_zorder_data_skipping(spark, tmp_path):
    # 64x64 grid; 16 files. Linear x-sort makes every file span all of
    # y (no pruning for y predicates); z-order bounds BOTH dims, so a
    # y-box query overlaps only a fraction of the files.
    grid = spark.sql(
        "SELECT id div 64 AS x, id % 64 AS y FROM range(4096)"
    )
    lin = str(tmp_path / "linear")
    zo = str(tmp_path / "zorder")
    grid.repartitionByRange(16, "x", "y").sortWithinPartitions(
        "x", "y"
    ).write.parquet(lin)
    zdf = lake.with_zorder(grid, ["x", "y"], bits=6)
    zdf.repartitionByRange(16, "zkey").sortWithinPartitions(
        "zkey"
    ).write.parquet(zo)

    def overlaps_y(stats, lo, hi):
        return sum(1 for r in stats if r["ylo"] <= hi and r["yhi"] >= lo)

    lin_hit = overlaps_y(_files_minmax(spark, lin), 0, 7)
    zo_hit = overlaps_y(_files_minmax(spark, zo), 0, 7)
    assert lin_hit == 16  # x-sorted files all span y fully
    assert zo_hit <= 8  # z-clustered files are rectangles: most prune


# --- compaction -------------------------------------------------------

INV = [
    ("p1", "f90", 90),
    ("p1", "f60", 60),
    ("p1", "f50", 50),
    ("p1", "f40", 40),
    ("p1", "f10", 10),
    ("p1", "f150", 150),
    ("p2", "g100", 100),
    ("p2", "g5", 5),
]


def _inv(spark, rows=INV):
    return spark.createDataFrame(
        rows, "partition string, path string, size_bytes long"
    )


def test_compaction_plan_known_value(spark):
    got = {
        (r["partition"], r["path"], r["grp"])
        for r in lake.compaction_plan(_inv(spark), 100).collect()
    }
    # p1 small files ordered desc: 90,60,50,40,10; cum-before
    # 0,90,150,200,240 -> groups 0,0,1,2,2; f150 is full-size -> -1.
    # p2: g100 full-size -> -1; g5 alone -> group 0.
    assert got == {
        ("p1", "f90", 0),
        ("p1", "f60", 0),
        ("p1", "f50", 1),
        ("p1", "f40", 2),
        ("p1", "f10", 2),
        ("p1", "f150", -1),
        ("p2", "g100", -1),
        ("p2", "g5", 0),
    }


def test_compaction_stats_known_value(spark):
    got = {
        tuple(r)
        for r in lake.compaction_stats(
            lake.compaction_plan(_inv(spark), 100)
        ).collect()
    }
    assert got == {
        ("p1", 6, 5, 250, 3, 4),
        ("p2", 2, 1, 5, 1, 2),
    }


def test_compaction_duckdb_equality(spark):
    rows = [
        (f"p{i % 3}", f"file{i:03d}", ((i * 7919) % 230) + 1)
        for i in range(120)
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE inv AS SELECT * FROM (VALUES "
        + ", ".join(f"('{p}', '{f}', {s})" for p, f, s in rows)
        + ") v(partition, path, size_bytes)"
    )
    plan_sql = lake.compaction_plan_sql("inv", 128)
    got = {
        tuple(r)
        for r in lake.compaction_plan(_inv(spark, rows), 128).collect()
    }
    want = {tuple(r) for r in con.sql(plan_sql).fetchall()}
    assert got == want
    got_st = {
        tuple(r)
        for r in lake.compaction_stats(
            lake.compaction_plan(_inv(spark, rows), 128)
        ).collect()
    }
    want_st = {
        tuple(r)
        for r in con.sql(lake.compaction_stats_sql(plan_sql)).fetchall()
    }
    assert got_st == want_st


def test_compact_refuses_dst_over_src(spark, tmp_path):
    import pytest

    src = str(tmp_path / "a" / "b")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="must not be src"):
        lake.compact_parquet_dir(spark, src, src, 1024)
    with pytest.raises(ValueError, match="must not be src"):
        lake.compact_parquet_dir(spark, src, str(tmp_path / "a"), 1024)


def test_compact_parquet_dir_roundtrip(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    # 40 deliberately tiny files
    spark.range(4000).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    ).repartition(40).write.parquet(src)
    n_before = sum(
        1 for n in os.listdir(src) if n.endswith(".parquet")
    )
    assert n_before >= 30
    plan = lake.compact_parquet_dir(spark, src, dst, 512 * 1024)
    n_groups = plan.select("grp").distinct().count()
    before = {tuple(r) for r in spark.read.parquet(src).collect()}
    after = {
        tuple(r)
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dst)
        .collect()
    }
    assert before == after  # row-for-row content preserved
    out_files = [
        os.path.join(dp, n)
        for dp, _d, ns in os.walk(dst)
        for n in ns
        if n.endswith(".parquet")
    ]
    assert len(out_files) == n_groups < n_before


def test_documents_bucketed_snapshot_fetch_join_plan(spark, tmp_path):
    """export_documents_bucketed: the cold-start R10 fetch join against
    the doc_id-bucketed documents snapshot plans no Exchange/Sort on the
    documents side (only the round-sized scheduled set shuffles), and
    rows match the plain-parquet join exactly."""
    import pyspark.sql.functions as F

    from spider_spark import lake
    from spider_spark.config import CrawlConfig
    from spider_spark.engine import CrawlEngine
    from spider_spark.fixtures import synth_web, write_web

    web = synth_web(n_hosts=2, pages_per_host=30, links_per_page=4, seed=3)
    input_dir = write_web(web, str(tmp_path / "web_ds"))
    eng = CrawlEngine(
        spark, input_dir, str(tmp_path / "work_ds"), CrawlConfig()
    )
    name = eng.export_documents_bucketed(
        str(tmp_path / "docs_b"), n_buckets=8
    )
    try:
        docs = spark.table(name)
        # scheduled set from the PLAIN corpus (the realistic shape: the
        # round's frontier slice is never bucket-aligned)
        sched = eng.documents.select(F.col("doc_id").alias("url")).where(
            F.length("url") % 3 == 0
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = sched.join(docs, sched["url"] == docs["doc_id"], "left")
            assert lake.count_exchanges(j) == 1  # scheduled side only
            plain = sched.join(
                eng.documents.select(
                    "doc_id", "status", "content_type"
                ),
                sched["url"] == F.col("doc_id"),
                "left",
            )
            assert lake.count_exchanges(plain) >= 2
            assert j.count() == plain.count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", prev
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        eng.close()

"""Binned range join (operators/rangejoin.py): known-value matches,
boundary inclusivity, left-join multiplicity, extra equi keys,
plan shape (hash join, never a nested loop), and Spark-vs-DuckDB
BETWEEN-join equality on the closed-form interval fixture."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.rangejoin import (
    range_join,
    synth_intervals,
    synth_intervals_sql,
)


def _points(spark, rows):
    return spark.createDataFrame(rows, "pid long, p long")


def _ivals(spark, rows):
    return spark.createDataFrame(rows, "iid long, lo long, hi long")


def test_known_matches_and_inclusive_bounds(spark):
    pts = _points(spark, [(1, 5), (2, 10), (3, 20), (4, 21), (5, 99)])
    ivs = _ivals(spark, [(10, 5, 10), (11, 10, 20), (12, 50, 60)])
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "p", "lo", "hi", bin_size=4).collect()
    )
    # p=5 in [5,10] (lo inclusive); p=10 in both [5,10] (hi inclusive)
    # and [10,20]; p=20 in [10,20] (hi inclusive); 21 and 99 nowhere
    assert got == [(1, 10), (2, 10), (2, 11), (3, 11)]


def test_interval_spanning_many_bins_matches_once(spark):
    pts = _points(spark, [(1, 500)])
    ivs = _ivals(spark, [(7, 0, 1000)])
    got = range_join(pts, ivs, "p", "lo", "hi", bin_size=10).collect()
    assert len(got) == 1  # 101 bin replicas, exactly one match emitted


def test_left_join_keeps_unmatched_points(spark):
    pts = _points(spark, [(1, 5), (2, 999)])
    ivs = _ivals(spark, [(10, 0, 10)])
    got = {
        r["pid"]: r["iid"]
        for r in range_join(
            pts, ivs, "p", "lo", "hi", bin_size=4, how="left"
        ).collect()
    }
    assert got == {1: 10, 2: None}


def test_degenerate_and_null_intervals_match_nothing(spark):
    pts = _points(spark, [(1, 5)])
    ivs = _ivals(spark, [(10, 8, 3), (11, None, 9), (12, 2, None)])
    assert range_join(pts, ivs, "p", "lo", "hi", bin_size=4).count() == 0


def test_extra_equi_keys(spark):
    pts = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5)], "pid long, host string, p long"
    )
    ivs = spark.createDataFrame(
        [(10, "a", 0, 10)], "iid long, host string, lo long, hi long"
    )
    got = range_join(
        pts, ivs, "p", "lo", "hi", bin_size=4, extra_keys=("host",)
    ).collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(1, 10)]
    assert "host" in got[0].asDict()  # left-side key survives


def test_plan_is_hash_join_not_nested_loop(spark):
    pts = _points(spark, [(i, i * 3) for i in range(100)])
    ivs = _ivals(spark, [(i, i * 10, i * 10 + 25) for i in range(30)])
    plan = (
        range_join(pts, ivs, "p", "lo", "hi", bin_size=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


@pytest.mark.parametrize("how", ["inner", "left"])
def test_matches_duckdb_between_join(spark, how):
    pts = _points(spark, [(i, (i * i * 37) % 3000) for i in range(400)])
    ivs = _ivals(
        spark,
        [(i, (i * 97) % 2800, (i * 97) % 2800 + 10 + i % 120)
         for i in range(60)],
    )
    got = sorted(
        (r["pid"], r["p"], r["iid"])
        for r in range_join(
            pts, ivs, "p", "lo", "hi", bin_size=64, how=how
        ).collect()
    )
    con = duckdb.connect()
    con.register("pts", pts.toPandas())
    con.register("ivs", ivs.toPandas())
    kw = "JOIN" if how == "inner" else "LEFT JOIN"
    ref = sorted(
        map(tuple, con.execute(
            f"SELECT pid, p, iid FROM pts {kw} ivs"
            " ON p BETWEEN lo AND hi"
        ).fetchall())
    )
    assert got == ref


def test_synth_intervals_matches_sql(spark):
    a = sorted(map(tuple, synth_intervals(spark, 50).collect()))
    b = sorted(
        map(tuple, duckdb.sql(synth_intervals_sql(50)).fetchall())
    )
    assert a == b

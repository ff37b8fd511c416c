"""Redirect-chain resolution (operators/redirects.py): exact hop
counts, cycles/self-loops, hop cap, off-corpus terminals, plan round
count, and Spark-vs-DuckDB recursive-CTE equality."""

import duckdb
import pytest

from spider_spark.operators.redirects import (
    resolve_redirects,
    resolve_redirects_sql,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _run(spark, rows, max_hops=20):
    return {
        r["url"]: (r["final_url"], r["hops"], r["status"])
        for r in resolve_redirects(
            _edges(spark, rows), max_hops=max_hops
        ).collect()
    }


def test_chain_hops_exact(spark):
    got = _run(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        "a": ("d", 3, "ok"),
        "b": ("d", 2, "ok"),
        "c": ("d", 1, "ok"),
    }


def test_cycles_and_self_loops_flagged(spark):
    got = _run(spark, [("a", "b"), ("b", "a"), ("s", "s"), ("t", "a")])
    assert got["a"] == (None, None, "too_many")
    assert got["b"] == (None, None, "too_many")
    assert got["s"] == (None, None, "too_many")
    assert got["t"] == (None, None, "too_many")  # drains into the cycle


def test_hop_cap_boundary(spark):
    # chain of length 5: ok at max_hops=5, too_many at max_hops=4
    rows = [(f"n{i}", f"n{i+1}") for i in range(5)]
    assert _run(spark, rows, max_hops=5)["n0"] == ("n5", 5, "ok")
    assert _run(spark, rows, max_hops=4)["n0"] == (None, None, "too_many")
    # shorter suffixes still resolve under the smaller cap
    assert _run(spark, rows, max_hops=4)["n1"] == ("n5", 4, "ok")


def test_off_corpus_terminal_is_ok(spark):
    got = _run(spark, [("a", "gone-elsewhere")])
    assert got == {"a": ("gone-elsewhere", 1, "ok")}


def test_null_rows_ignored(spark):
    got = _run(spark, [("a", "b"), ("x", None), (None, "y")])
    assert got == {"a": ("b", 1, "ok")}


def test_matches_duckdb_recursive_cte(spark):
    # mixed topology: chains of varied length, 2-cycle, self-loop,
    # drain-into-cycle, off-corpus hop, and a 25-chain over the 20 cap
    rows = (
        [(f"c{i}", f"c{i+1}") for i in range(25)]
        + [("p", "q"), ("q", "r")]
        + [("x", "y"), ("y", "x"), ("z", "x"), ("self", "self")]
        + [("solo", "offsite")]
    )
    eng = sorted(
        map(tuple, resolve_redirects(_edges(spark, rows)).collect())
    )
    vals = ", ".join(f"('{s}', '{d}')" for s, d in rows)
    sql = resolve_redirects_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)"
    )
    ref = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert eng == ref


def test_log_rounds_not_linear(spark):
    # 20-hop cap resolves a 16-chain: 5 doubling rounds reach 32 steps
    rows = [(f"n{i}", f"n{i+1}") for i in range(16)]
    got = _run(spark, rows, max_hops=20)
    assert got["n0"] == ("n16", 16, "ok")


def test_max_hops_guard(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_edges(spark, [("a", "b")]), max_hops=0)

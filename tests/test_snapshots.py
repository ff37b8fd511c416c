"""Crawl snapshot diffing (analysis/snapshots.py): known-value status
classification, null-fingerprint semantics, churn stats, and
Spark-vs-DuckDB equality."""

import pytest

from spider_spark.analysis.snapshots import (
    crawl_diff,
    crawl_diff_sql,
    diff_stats,
    diff_stats_sql,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, fp string")


def test_crawl_diff_statuses(spark):
    old = _snap(
        spark,
        [
            ("https://a.x/keep", "f1"),
            ("https://a.x/edit", "f2"),
            ("https://a.x/gone", "f3"),
            ("https://a.x/nullboth", None),
            ("https://a.x/nullold", None),
        ],
    )
    new = _snap(
        spark,
        [
            ("https://a.x/keep", "f1"),
            ("https://a.x/edit", "f2b"),
            ("https://a.x/new", "f4"),
            ("https://a.x/nullboth", None),
            ("https://a.x/nullold", "f5"),
        ],
    )
    got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
    assert got == {
        "https://a.x/keep": "unchanged",
        "https://a.x/edit": "changed",
        "https://a.x/gone": "removed",
        "https://a.x/new": "added",
        # both fingerprints missing: null-safe equal -> unchanged
        "https://a.x/nullboth": "unchanged",
        # null -> value: changed
        "https://a.x/nullold": "changed",
    }


def test_diff_stats_churn(spark):
    old = _snap(spark, [(f"https://h.x/p{i}", f"f{i}") for i in range(10)])
    new = _snap(
        spark,
        # p0..p7 survive (p0,p1 changed), p8/p9 removed, q0..q1 added
        [(f"https://h.x/p{i}", f"f{i}x" if i < 2 else f"f{i}") for i in range(8)]
        + [(f"https://h.x/q{i}", "n") for i in range(2)],
    )
    row = diff_stats(crawl_diff(old, new)).collect()[0].asDict()
    assert row["host"] == "h.x"
    assert (row["n_added"], row["n_removed"], row["n_changed"]) == (2, 2, 2)
    assert row["n_unchanged"] == 6 and row["n_urls"] == 12
    assert row["churn_ppm"] == 1_000_000 * 6 // 12


def test_empty_sides(spark):
    empty = _snap(spark, [])
    old = _snap(spark, [("https://h.x/p", "f")])
    assert crawl_diff(old, empty).collect()[0]["status"] == "removed"
    assert crawl_diff(empty, old).collect()[0]["status"] == "added"
    assert crawl_diff(empty, empty).count() == 0


@pytest.mark.parametrize("stage", ["diff", "stats"])
def test_snapshots_match_duckdb(spark, stage):
    import duckdb

    # deterministic snapshots over 3 hosts: membership and fingerprints
    # both closed-form in i, so Spark and DuckDB derive identical tables
    old_rows = [
        (f"https://h{i % 3}.x/p{i}", f"f{i // (1 + i % 4)}")
        for i in range(200)
        if i % 10 != 0
    ]
    new_rows = [
        (f"https://h{i % 3}.x/p{i}", f"f{i // (1 + i % 5)}")
        for i in range(220)
        if i % 7 != 0
    ]
    old, new = _snap(spark, old_rows), _snap(spark, new_rows)
    con = duckdb.connect()
    con.register("old_t", old.toPandas())
    con.register("new_t", new.toPandas())
    o_sql = "SELECT url, fp FROM old_t"
    n_sql = "SELECT url, fp FROM new_t"

    if stage == "diff":
        got = crawl_diff(old, new)
        sql = crawl_diff_sql(o_sql, n_sql)
    else:
        got = diff_stats(crawl_diff(old, new))
        sql = diff_stats_sql(o_sql, n_sql)
    key = lambda t: tuple("" if v is None else str(v) for v in t)  # noqa: E731
    a = sorted(map(key, got.collect()))
    b = sorted(map(key, con.execute(sql).fetchall()))
    assert a == b

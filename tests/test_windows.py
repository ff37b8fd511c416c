"""Tumbling/sliding window aggregation (analysis/windows): known-value
window membership, boundary inclusivity (start inclusive, end exclusive),
sliding replica counts, and Spark-vs-DuckDB equality on the real events
fixture."""

import duckdb

from pyspark.sql import functions as F

from spider_spark.analysis import windows as W


def _events(spark, rows):
    # rows: (event_id, ts_str, event_type, value)
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    )
    return df.select(
        "event_id",
        F.col("ts_s").cast("timestamp_ntz").alias("ts"),
        "event_type",
        "value",
    )


def test_tumbling_known_values(spark):
    ev = _events(
        spark,
        [
            (1, "1970-01-01 00:00:00", "a", 1.0),   # window 0
            (2, "1970-01-01 00:00:59.999999", "a", 2.0),  # window 0
            (3, "1970-01-01 00:01:00", "a", 4.0),   # window 60s: start incl
            (4, "1970-01-01 00:02:30", "b", 8.0),   # window 120s
        ],
    )
    got = {
        (r["win_start_us"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in W.tumbling_stats(ev, 60).collect()
    }
    assert got == {
        (0, "a"): (2, 3.0),
        (60_000_000, "a"): (1, 4.0),
        (120_000_000, "b"): (1, 8.0),
    }


def test_sliding_replicas_and_boundaries(spark):
    # width 60s, slide 20s: an event at t=50s belongs to windows starting
    # at 0, 20, 40 (three replicas = width/slide); one at t=60s to
    # 20, 40, 60 (start-exclusive window 0 ends at 60, end exclusive).
    ev = _events(
        spark,
        [
            (1, "1970-01-01 00:00:50", "a", 1.0),
            (2, "1970-01-01 00:01:00", "a", 1.0),
        ],
    )
    got = sorted(
        (r["win_start_us"] // 1_000_000, r["n_events"])
        for r in W.sliding_stats(ev, 60, 20).collect()
    )
    assert got == [(0, 1), (20, 2), (40, 2), (60, 1)]


def test_windows_match_duckdb_on_fixture(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * "
        "FROM '/root/testdata/sf0.001/events.parquet'"
    )
    got_t = sorted(map(tuple, W.tumbling_stats(ev, 3600).collect()))
    want_t = sorted(map(tuple, con.sql(W.tumbling_sql("events", 3600)).fetchall()))
    assert got_t == want_t
    got_s = sorted(map(tuple, W.sliding_stats(ev, 3600, 900).collect()))
    want_s = sorted(
        map(tuple, con.sql(W.sliding_sql("events", 3600, 900)).fetchall())
    )
    assert got_s == want_s
    # sliding replica factor: total events ~ 4x (width/slide) the base
    n_base = sum(r[2] for r in got_t)
    n_slid = sum(r[2] for r in got_s)
    assert n_slid == 4 * n_base

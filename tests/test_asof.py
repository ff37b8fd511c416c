"""As-of join (operators/asof.py): known-value matches, inclusive-tie and
tolerance semantics, unmatched lefts, and equality vs DuckDB's native
ASOF JOIN."""

import datetime as dt

import pytest

from spider_spark.operators.asof import asof_join, asof_join_sql

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _left(spark, rows):
    return spark.createDataFrame(
        rows, "host string, ts timestamp_ntz, event_id long"
    )


def _right(spark, rows):
    return spark.createDataFrame(
        rows, "host string, ts timestamp_ntz, policy string"
    )


def test_asof_known_values(spark):
    left = _left(
        spark,
        [
            ("a", _ts(5), 1),   # after v1, before v2 -> v1
            ("a", _ts(10), 2),  # exactly at v2 -> inclusive match v2
            ("a", _ts(99), 3),  # long after -> newest (v2)
            ("a", _ts(0), 4),   # before any snapshot -> null
            ("b", _ts(50), 5),  # other key -> b's only snapshot
        ],
    )
    right = _right(
        spark,
        [
            ("a", _ts(1), "v1"),
            ("a", _ts(10), "v2"),
            ("b", _ts(7), "w1"),
        ],
    )
    got = {r["event_id"]: r.asDict() for r in asof_join(left, right).collect()}
    assert got[1]["policy"] == "v1"
    assert got[2]["policy"] == "v2"  # r.ts <= l.ts is inclusive
    assert got[3]["policy"] == "v2"
    assert got[4]["policy"] is None and got[4]["matched_ts_us"] is None
    assert got[5]["policy"] == "w1"
    epoch = dt.datetime(1970, 1, 1)
    assert got[1]["matched_ts_us"] == int(
        (_ts(1) - epoch).total_seconds()
    ) * 1_000_000


def test_asof_tolerance(spark):
    left = _left(spark, [("a", _ts(100), 1), ("a", _ts(5), 2)])
    right = _right(spark, [("a", _ts(0), "v1")])
    got = {
        r["event_id"]: r.asDict()
        for r in asof_join(
            left, right, tolerance_us=10 * 1_000_000
        ).collect()
    }
    assert got[2]["policy"] == "v1"  # 5 s stale, within 10 s
    assert got[1]["policy"] is None  # 100 s stale -> nulled
    assert got[1]["matched_ts_us"] is None


def test_asof_preserves_left_rows(spark):
    # left multiplicity is preserved exactly (no fan-out, no drops)
    left = _left(spark, [("a", _ts(5), 1), ("a", _ts(5), 2)])
    right = _right(
        spark, [("a", _ts(1), "v1"), ("c", _ts(1), "unused")]
    )
    rows = asof_join(left, right).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]
    assert all(r["policy"] == "v1" for r in rows)


@pytest.mark.parametrize("tolerance_us", [None, 40 * 1_000_000])
def test_asof_matches_duckdb(spark, tolerance_us):
    import duckdb

    # deterministic: 4 hosts, 300 events, snapshots every ~37 s per host
    lrows = [
        (f"h{i % 4}", _ts(i * 3 + (i % 5)), i) for i in range(300)
    ]
    rrows = [
        (f"h{j % 4}", _ts(j * 37), f"p{j}") for j in range(25)
    ]
    left, right = _left(spark, lrows), _right(spark, rrows)
    con = duckdb.connect()
    con.register("left_t", left.toPandas())
    con.register("right_t", right.toPandas())

    got = asof_join(left, right, tolerance_us=tolerance_us)
    sql = asof_join_sql(
        "SELECT host, ts, event_id FROM left_t",
        "SELECT host, ts, policy FROM right_t",
        key_cols=("host",),
        left_cols=("host", "ts", "event_id"),
        value_cols=("policy",),
        tolerance_us=tolerance_us,
    )
    key = lambda t: tuple("" if v is None else str(v) for v in t)  # noqa: E731
    a = sorted(map(key, got.collect()))
    b = sorted(map(key, con.execute(sql).fetchall()))
    assert a == b

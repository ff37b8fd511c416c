"""Re-crawl freshness scheduling (analysis/freshness.py): known-value
change-rate estimation, integer-priority ranking, and Spark-vs-DuckDB
equality of both stages."""

import datetime as dt

import pytest

from spider_spark.analysis.freshness import (
    change_rate,
    change_rate_sql,
    recrawl_topk,
    recrawl_topk_sql,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _visits(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts timestamp_ntz, event_id long, fp string"
    )


def test_change_rate_known_values(spark):
    # a: 4 visits, flips at v2 and v4 (2 changes / 3 intervals)
    # b: 3 identical visits (0 changes); c: single visit (no evidence)
    visits = _visits(
        spark,
        [
            ("a", _ts(0), 1, "x"),
            ("a", _ts(10), 2, "y"),
            ("a", _ts(20), 3, "y"),
            ("a", _ts(30), 4, "z"),
            ("b", _ts(5), 5, "k"),
            ("b", _ts(15), 6, "k"),
            ("b", _ts(25), 7, "k"),
            ("c", _ts(40), 8, "q"),
        ],
    )
    got = {r["url"]: r.asDict() for r in change_rate(visits).collect()}
    assert got["a"]["n_visits"] == 4
    assert got["a"]["n_changes"] == 2
    assert got["a"]["change_ppm"] == 2_000_000 // 3
    epoch = dt.datetime(1970, 1, 1)
    assert got["a"]["last_us"] == int((_ts(30) - epoch).total_seconds()) * 1_000_000
    assert got["b"]["n_changes"] == 0 and got["b"]["change_ppm"] == 0
    assert got["c"]["n_visits"] == 1 and got["c"]["change_ppm"] == 0


def test_change_rate_tiebreak_on_id(spark):
    # same-microsecond visits: lag order must follow event_id, giving
    # exactly one flip (x -> y), not an order-dependent answer
    visits = _visits(
        spark,
        [("u", _ts(0), 2, "y"), ("u", _ts(0), 1, "x")],
    )
    row = change_rate(visits).collect()[0]
    assert row["n_changes"] == 1


def test_recrawl_topk_priority_and_rank(spark):
    # hot changes often but was just seen (stale 0 -> priority 0);
    # warm changes half as often but is 100 s stale -> ranked first
    visits = _visits(
        spark,
        [
            ("https://h0.x/hot", _ts(0), 1, "a"),
            ("https://h0.x/hot", _ts(50), 2, "b"),
            ("https://h0.x/hot", _ts(100), 3, "c"),
            ("https://h0.x/warm", _ts(-100), 4, "a"),
            ("https://h0.x/warm", _ts(-50), 5, "a"),
            ("https://h0.x/warm", _ts(0), 6, "b"),
        ],
    )
    from pyspark.sql import functions as F

    rates = change_rate(visits).withColumn("host", F.lit("h0"))
    got = recrawl_topk(rates, host_col="host", k=2).collect()
    by_rank = {r["rank"]: r for r in got}
    assert by_rank[1]["url"].endswith("/warm")
    # warm: 1 change / 2 intervals = 500000 ppm, 100 s stale
    assert by_rank[1]["priority"] == 500_000 * 100
    assert by_rank[2]["priority"] == 0  # newest URL is never stale


def test_freshness_matches_duckdb(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    # deterministic revisit log: 12 urls x ~25 visits, fp cycles with a
    # url-dependent period so change rates differ per url
    rows = []
    for i in range(300):
        u = f"https://h{i % 3}.example.com/p{i % 12}"
        rows.append(
            (u, _ts(i * 7), i, f"v{(i // (1 + i % 12 % 4)) % 3}")
        )
    visits = _visits(spark, rows)
    host = "split_part(split_part(url, '//', 2), '/', 1)"

    rates = change_rate(visits)
    got_rates = {
        r["url"]: (r["n_visits"], r["n_changes"], r["change_ppm"], r["last_us"])
        for r in rates.collect()
    }
    topk = recrawl_topk(
        rates.withColumn("host", F.expr(host)), host_col="host", k=3
    )
    got_topk = {
        (r["host"], r["rank"]): (r["url"], r["priority"])
        for r in topk.collect()
    }

    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["url", "ts", "event_id", "fp"])
    con.register("visits_raw", pdf)
    vsql = "SELECT url, ts, event_id, fp FROM visits_raw"
    want_rates = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(change_rate_sql(vsql)).fetchall()
    }
    assert want_rates == got_rates
    want_topk = {
        (r[0], r[3]): (r[1], r[2])
        for r in con.execute(recrawl_topk_sql(vsql, host, k=3)).fetchall()
    }
    assert want_topk == got_topk


def test_recrawl_topk_compiles_to_window_group_limit(spark):
    from pyspark.sql import functions as F

    visits = _visits(
        spark,
        [(f"https://h{i%2}.x/p{i%5}", _ts(i), i, f"f{i%2}") for i in range(40)],
    )
    rates = change_rate(visits).withColumn("host", F.expr("split_part(url, '/', 3)"))
    plan = recrawl_topk(rates, host_col="host", k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan

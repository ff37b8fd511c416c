"""schedule_topk / fifo_rank operator tests (reference R8 + skew path)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.operators.politeness import (
    deferred_by_cutoff,
    fifo_rank,
    schedule_topk,
)


def test_fifo_rank_equals_single_window(spark):
    rng = random.Random(1)
    rows = [
        (f"h{rng.randrange(5)}", f"ph{rng.randrange(7)}", rng.randrange(1000), f"u{i}")
        for i in range(5000)
    ]
    # heavy skew: one host gets 5x the rows
    rows += [("h0", f"ph{rng.randrange(7)}", rng.randrange(1000), f"x{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "thost string, phost string, prn int, url string")
    w = Window.partitionBy("thost").orderBy("phost", "prn", "url")
    expect = {
        (r["thost"], r["url"]): r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    got = {
        (r["thost"], r["url"]): r["rank"] for r in fifo_rank(df, 8).collect()
    }
    assert got == expect


def test_fifo_rank_arrow_impl_identical(spark):
    """impl='arrow' (partition-local sort + Arrow cumulative count, one
    exchange) must equal impl='window' exactly — values, dtype, and the
    dedup=True fused-set path."""
    rng = random.Random(11)
    rows = [
        (f"h{rng.randrange(4)}", f"ph{rng.randrange(6)}", rng.randrange(500), f"u{i}")
        for i in range(4000)
    ]
    schema = "thost string, phost string, prn int, url string"
    dup_rows = rows + [("h0", "ph0", 7, "dup")] * 3  # exercised by dedup=True
    for dedup in (False, True):
        df = spark.createDataFrame(dup_rows if dedup else rows, schema)
        base = df.dropDuplicates(["thost", "phost", "prn", "url"]) if dedup else df
        w = Window.partitionBy("thost").orderBy("phost", "prn", "url")
        expect = {
            (r["thost"], r["url"], r["prn"]): r["rk"]
            for r in base.withColumn("rk", F.row_number().over(w)).collect()
        }
        arrow = fifo_rank(df, 8, dedup=dedup, impl="arrow")
        assert dict(arrow.dtypes)["rank"] == "bigint"
        got = {
            (r["thost"], r["url"], r["prn"]): r["rank"] for r in arrow.collect()
        }
        arrow._fifo_rank_cache.unpersist()
        assert got == expect, f"dedup={dedup}"


def test_schedule_topk_split(spark):
    rows = [(f"u{h}{i}", f"h{h}", i, False) for h in range(3) for i in range(10)]
    df = spark.createDataFrame(rows, "url string, host string, seq long, sm boolean")
    scheduled, deferred = schedule_topk(df, budget=4)
    s = scheduled.collect()
    assert len(s) == 12 and all(r["rn"] <= 4 for r in s)
    d = deferred.collect()
    assert len(d) == 18 and all(r["seq"] >= 4 for r in d)
    # FIFO: scheduled are exactly the lowest seqs per host
    for h in range(3):
        assert sorted(r["seq"] for r in s if r["host"] == f"h{h}") == [0, 1, 2, 3]


def test_deferred_cutoff_host_under_budget(spark):
    rows = [("a1", "a", 1, False), ("a2", "a", 2, False), ("b1", "b", 5, False)]
    df = spark.createDataFrame(rows, "url string, host string, seq long, sm boolean")
    scheduled, deferred = schedule_topk(df, budget=10)
    assert deferred.count() == 0 and scheduled.count() == 3


def test_deferred_cutoff_keeps_unscheduled_hosts(spark):
    """A host absent from scheduled (null cutoff) must keep ALL its frontier
    rows — dropping them would be permanent URL loss."""
    frontier = spark.createDataFrame(
        [("a1", "a", 1, False), ("b1", "b", 5, False), ("b2", "b", 6, False)],
        "url string, host string, seq long, sm boolean",
    )
    scheduled = spark.createDataFrame(
        [("a1", "a", 1, False, 1)],
        "url string, host string, seq long, sm boolean, rn int",
    )
    kept = {r["url"] for r in deferred_by_cutoff(frontier, scheduled).collect()}
    assert kept == {"b1", "b2"}


def test_schedule_topk_exact_rank_parity(spark):
    """exact_rank=True (fifo_rank path) must split identically to the
    window path, including rn values."""
    import random as _r

    rng = _r.Random(3)
    rows = [
        (f"u{h}_{i}", f"h{h}", rng.randrange(1 << 20), False)
        for h in range(5)
        for i in range(400 * (3 if h == 0 else 1))
    ]
    df = spark.createDataFrame(rows, "url string, host string, seq long, sm boolean")
    for budget in (7, 5000):
        sw, dw = schedule_topk(df, budget)
        se, de = schedule_topk(df, budget, exact_rank=True)
        key = lambda r: (r["host"], r["url"], r["rn"])
        assert sorted(map(key, sw.collect())) == sorted(map(key, se.collect()))
        k2 = lambda r: (r["host"], r["url"])
        assert sorted(map(k2, dw.collect())) == sorted(map(k2, de.collect()))
        se._fifo_rank_cache.unpersist()


def test_schedule_topk_priority_order(spark):
    """order_cols=(prio, seq): per-host top-K follows priority first, FIFO
    within equal priority; deferred = exact complement (anti-join path)."""
    rows = [
        # host a: priorities interleaved with seq
        ("a_p2_s0", "a", 0, False, 2),
        ("a_p1_s1", "a", 1, False, 1),
        ("a_p1_s2", "a", 2, False, 1),
        ("a_p3_s3", "a", 3, False, 3),
        # host b: all equal priority -> pure FIFO
        ("b_s0", "b", 0, False, 9),
        ("b_s1", "b", 1, False, 9),
        ("b_s2", "b", 2, False, 9),
    ]
    df = spark.createDataFrame(
        rows, "url string, host string, seq long, sm boolean, prio int"
    )
    for exact in (False, True):
        s, d = schedule_topk(
            df, budget=2, exact_rank=exact, order_cols=("prio", "seq")
        )
        got = {r["url"]: r["rn"] for r in s.collect()}
        assert got == {
            "a_p1_s1": 1, "a_p1_s2": 2, "b_s0": 1, "b_s1": 2
        }, (exact, got)
        assert sorted(r["url"] for r in d.collect()) == [
            "a_p2_s0", "a_p3_s3", "b_s2"
        ]
        if exact:
            s._fifo_rank_cache.unpersist()


def test_schedule_topk_per_host_budget(spark):
    """budget_col: each host keeps rn <= its own budget (scalar budget is
    the prune ceiling); deferred is the exact complement."""
    rows = [
        (f"u{h}{i}", f"h{h}", i, False, {0: 1, 1: 3, 2: 5}[h])
        for h in range(3)
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "url string, host string, seq long, sm boolean, _budget int"
    )
    for exact in (False, True):
        s, d = schedule_topk(
            df, budget=5, exact_rank=exact, budget_col="_budget"
        )
        per_host = {}
        for r in s.collect():
            per_host.setdefault(r["host"], []).append(r["seq"])
        assert {h: sorted(v) for h, v in per_host.items()} == {
            "h0": [0], "h1": [0, 1, 2], "h2": [0, 1, 2, 3, 4]
        }, (exact, per_host)
        assert s.count() + d.count() == len(rows)
        if exact:
            s._fifo_rank_cache.unpersist()


def test_delay_budget_clamps():
    from spider_spark.operators.politeness import delay_budget

    assert delay_budget(None, 10) == 10
    assert delay_budget(0, 10) == 10
    assert delay_budget(-1, 10) == 10
    assert delay_budget(2.0, 10) == 1       # longer than a tick -> floor 1
    assert delay_budget(0.25, 10) == 4      # 4 fetches per 1s tick
    assert delay_budget(0.01, 10) == 10     # ceiling = parallelism
    assert delay_budget(0.25, 10, tick_s=2.0) == 8


def test_delay_period():
    from spider_spark.operators.politeness import delay_period

    # within one tick (or absent/nonsense) -> every round
    assert delay_period(None) == 1
    assert delay_period(0) == 1
    assert delay_period(-3) == 1
    assert delay_period(1.0) == 1
    assert delay_period(0.5) == 1
    # spanning k ticks -> every k-th round
    assert delay_period(1.5) == 2
    assert delay_period(2.0) == 2
    assert delay_period(3.0) == 3
    assert delay_period(2.5, tick_s=1.0) == 3
    assert delay_period(5, tick_s=2.0) == 3
    assert delay_period(30.0) == 30  # the VERDICT's 30s-host example


def test_yield_budgets_known_value(spark):
    from spider_spark.operators.politeness import (
        yield_budgets,
        yield_budgets_py,
    )

    stats = [("a", 10, 40), ("b", 10, 10), ("c", 10, 0)]
    df = spark.createDataFrame(
        stats, "host string, fetched long, new_urls long"
    )
    got = {
        r["host"]: (r["yield_ppm"], r["budget"])
        for r in yield_budgets(df, 20, 1).collect()
    }
    # W = 5e6; B = 17; floors a=13 b=3 c=0, remainders 3e6/2e6/0 ->
    # the 1 leftover goes to a
    assert got == {
        "a": (4_000_000, 15),
        "b": (1_000_000, 4),
        "c": (0, 1),
    }
    assert yield_budgets_py(
        {h: (f, n) for h, f, n in stats}, 20, 1
    ) == {"a": 15, "b": 4, "c": 1}


def test_yield_budgets_zero_yield_equal_split(spark):
    from spider_spark.operators.politeness import (
        yield_budgets,
        yield_budgets_py,
    )

    stats = [("a", 5, 0), ("b", 5, 0), ("c", 5, 0)]
    df = spark.createDataFrame(
        stats, "host string, fetched long, new_urls long"
    )
    got = {r["host"]: r["budget"] for r in yield_budgets(df, 10).collect()}
    # equal split of B=7 over 3, remainder to host-ascending: a first
    assert got == {"a": 4, "b": 3, "c": 3}
    assert yield_budgets_py({h: (f, n) for h, f, n in stats}, 10) == got


def test_yield_budgets_three_way_equality(spark):
    import duckdb

    from spider_spark.operators.politeness import (
        yield_budgets,
        yield_budgets_py,
        yield_budgets_sql,
    )

    rng = random.Random(7)
    stats = [
        (f"h{i:02d}", rng.randrange(1, 500), rng.randrange(0, 2000))
        for i in range(23)
    ] + [("h99", 1, 10**10)]  # clamp case: yield capped at 1e9
    df = spark.createDataFrame(
        stats, "host string, fetched long, new_urls long"
    )
    total, mb = 1000, 2
    spark_out = {
        r["host"]: (r["fetched"], r["new_urls"], r["yield_ppm"], r["budget"])
        for r in yield_budgets(df, total, mb).collect()
    }
    py_out = yield_budgets_py({h: (f, n) for h, f, n in stats}, total, mb)
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(f"('{h}', {f}, {n})" for h, f, n in stats)
        + ") v(host, fetched, new_urls)"
    )
    duck_out = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.sql(yield_budgets_sql("s", total, mb)).fetchall()
    }
    assert spark_out == duck_out
    assert {h: v[3] for h, v in spark_out.items()} == py_out
    # the split is exact: floors + remainder distribute the whole total
    assert sum(py_out.values()) == total

"""HLL approx-distinct + count-min sketch (analysis/sketches): register
math vs a pure-Python reference, estimate accuracy envelope, merge
(max/combine) semantics, and bit-exact Spark-vs-DuckDB equality."""

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from spider_spark.analysis import sketches as K
from spider_spark.functions.hashing import md5_u32_py


def _df(spark, vals, groups=None):
    groups = groups or ["g0"] * len(vals)
    return spark.createDataFrame(
        list(zip(vals, groups)), "v string, g string"
    )


def _py_registers(vals, p):
    """Pure-Python HLL register reference."""
    m, w = 1 << p, 32 - p
    regs = {}
    for v in vals:
        h = md5_u32_py(v)
        b, s = h % m, h // m
        rho = (w + 1) if s == 0 else w - (s.bit_length() - 1)
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_match_python(spark):
    vals = [f"url-{i}" for i in range(500)]
    got = {
        r["bucket"]: r["r"]
        for r in K.hll_registers(_df(spark, vals), "v", p=6).collect()
    }
    assert got == _py_registers(vals, 6)


def test_hll_estimate_within_error_envelope(spark):
    # raw HLL std error = 1.04/sqrt(m); allow 4 sigma at m=64 (~52%).
    # Actual seeds land well inside; the bound just guards regressions.
    for n in (300, 1000, 5000):
        vals = [f"item-{i}" for i in range(n)]
        est = (
            K.hll_distinct(_df(spark, vals), "v", p=6)
            .collect()[0]["est_distinct"]
        )
        assert abs(est - n) / n < 0.52, (n, est)


def test_hll_insensitive_to_duplicates_and_order(spark):
    base = [f"u-{i}" for i in range(400)]
    dup = base * 3 + base[::-1]
    a = K.hll_distinct(_df(spark, base), "v", p=6).collect()[0]
    b = K.hll_distinct(_df(spark, dup), "v", p=6).collect()[0]
    assert a["est_distinct"] == b["est_distinct"]
    assert a["n_nonzero"] == b["n_nonzero"]


def test_hll_grouped_matches_duckdb(spark):
    vals = [f"url-{i % 211}" for i in range(1500)]
    groups = [f"g{i % 3}" for i in range(1500)]
    df = _df(spark, vals, groups)
    got = sorted(
        map(tuple, K.hll_distinct(df, "v", ("g",), p=6).collect())
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals, "g": groups}))
    want = sorted(
        map(tuple, con.sql(K.hll_sql("t", "v", ("g",), p=6)).fetchall())
    )
    assert got == want
    # registers agree too
    got_r = sorted(
        map(tuple, K.hll_registers(df, "v", ("g",), p=6).collect())
    )
    want_r = sorted(
        map(
            tuple,
            con.sql(
                K.hll_sql("t", "v", ("g",), p=6, registers_only=True)
            ).fetchall(),
        )
    )
    assert got_r == want_r


def test_cms_estimate_upper_bounds_truth(spark):
    # CMS never underestimates: est >= true count, for every candidate
    vals = [f"tok-{i % 37}" for i in range(800)] + ["hot"] * 200
    df = _df(spark, vals)
    est = {
        r["value"]: r["est"]
        for r in K.cms_heavy_hitters(df, "v", k=100, depth=4, width=512)
        .collect()
    }
    from collections import Counter

    truth = Counter(vals)
    for v, c in truth.items():
        assert est[v] >= c, (v, est[v], c)
    # with width >> distinct values the hot key is exact and ranked first
    assert est["hot"] == 200
    top = (
        K.cms_heavy_hitters(df, "v", k=1, depth=4, width=512)
        .collect()[0]["value"]
    )
    assert top == "hot"


def test_cms_weighted_sketch(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 3), ("b", 2)], "v string, w long"
    )
    sk = K.cms_sketch(df, "v", depth=2, width=64, weight_col="w")
    est = {
        r["value"]: r["est"]
        for r in K.cms_estimate(
            sk, df.select("v").distinct(), "v", depth=2, width=64
        ).collect()
    }
    assert est == {"a": 8, "b": 2}


def test_cms_matches_duckdb(spark):
    vals = [f"w-{i % 53}" for i in range(900)]
    df = _df(spark, vals)
    got = [
        tuple(r)
        for r in K.cms_heavy_hitters(df, "v", k=15, depth=4, width=128)
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    want = con.sql(K.cms_sql("t", "v", k=15, depth=4, width=128)).fetchall()
    assert got == want
    # raw sketch grids agree cell-for-cell
    got_g = sorted(
        map(tuple, K.cms_sketch(df, "v", depth=4, width=128).collect())
    )
    want_g = sorted(
        map(
            tuple,
            con.sql(
                K.cms_sql("t", "v", depth=4, width=128, sketch_only=True)
            ).fetchall(),
        )
    )
    assert got_g == want_g


def test_null_values_excluded(spark):
    # NULLs never enter either sketch (count-distinct convention), and
    # the oracles apply the same guard
    df = spark.createDataFrame(
        [("a", "g0"), (None, "g0"), ("b", "g0"), (None, "g0")],
        "v string, g string",
    )
    clean = _df(spark, ["a", "b"])
    got = K.hll_distinct(df, "v", p=6).collect()[0]
    want = K.hll_distinct(clean, "v", p=6).collect()[0]
    assert tuple(got) == tuple(want)
    hh = K.cms_heavy_hitters(df, "v", k=10, depth=2, width=32).collect()
    assert sorted(r["value"] for r in hh) == ["a", "b"]
    assert all(r["est"] == 1 for r in hh)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": ["a", None, "b", None]}))
    assert sorted(
        map(tuple, con.sql(K.cms_sql("t", "v", k=10, depth=2, width=32)).fetchall())
    ) == [("a", 1), ("b", 1)]
    assert con.sql(K.hll_sql("t", "v", p=6)).fetchall()[0] == tuple(want)


def test_hll_p_bounds():
    class _Fake:  # never touched: p is validated before any df use
        pass

    with pytest.raises(ValueError):
        K.hll_registers(_Fake(), "v", p=3)
    with pytest.raises(ValueError):
        K.hll_registers(_Fake(), "v", p=13)


# ------------------------------------------------------------------- KMV


def test_kmv_exact_below_k(spark):
    """Groups with < k distinct values report the exact distinct count."""
    from spider_spark.analysis.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("a", f"v{i % 7}") for i in range(100)]
        + [("b", f"w{i}") for i in range(3)],
        "grp string, val string",
    )
    got = {
        r["grp"]: (r["est_distinct"], r["n_mins"])
        for r in kmv_distinct(df, "val", ("grp",), k=64).collect()
    }
    assert got == {"a": (7, 7), "b": (3, 3)}


def test_kmv_estimate_error_envelope(spark):
    """At n >> k the estimator lands within the published ~1/sqrt(k)
    relative error band (generous 4-sigma bound)."""
    from spider_spark.analysis.sketches import kmv_distinct

    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("val")
    )
    est = kmv_distinct(df, "val", (), k=256).collect()[0]["est_distinct"]
    assert abs(est - n) / n < 4 / (256 ** 0.5), est


def test_kmv_duplicate_and_order_insensitive(spark):
    from spider_spark.analysis.sketches import kmv_distinct

    base = spark.range(500).select(
        F.concat(F.lit("x"), (F.col("id") % 97).cast("string")).alias("val")
    )
    a = kmv_distinct(base, "val", (), k=32).collect()[0]
    dup = base.union(base).orderBy(F.rand(7))
    b = kmv_distinct(dup, "val", (), k=32).collect()[0]
    assert tuple(a) == tuple(b)


def test_kmv_matches_duckdb(spark):
    import duckdb

    from spider_spark.analysis.sketches import kmv_distinct, kmv_sql

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"t{(i * 13) % 211}") for i in range(1000)],
        "grp string, val string",
    )
    con = duckdb.connect()
    con.register("t_kmv", df.toPandas())
    got = sorted(map(tuple, kmv_distinct(df, "val", ("grp",), k=16).collect()))
    want = sorted(
        map(tuple, con.sql(kmv_sql("t_kmv", "val", ("grp",), k=16)).fetchall())
    )
    assert got == want


def test_kmv_plan_uses_window_group_limit(spark):
    from spider_spark.analysis.sketches import kmv_distinct

    df = spark.range(100).select(
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"),
        F.col("id").cast("string").alias("val"),
    )
    sk = kmv_distinct(df, "val", ("grp",), k=8)
    plan = sk._sc._jvm.PythonSQLUtils.explainString(
        sk._jdf.queryExecution(), "simple"
    )
    assert "WindowGroupLimit" in plan, plan


def test_kmv_null_values_excluded(spark):
    # KMV follows the same count-distinct convention as HLL/CMS: a NULL
    # value must not occupy a bottom-k slot (Spark's NULLS FIRST would
    # rank it opposite to DuckDB's NULLS LAST) nor inflate the exact
    # small-group count
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,), ("c",)], "v string"
    )
    clean = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
    got = K.kmv_distinct(df, "v", k=8).collect()[0]
    want = K.kmv_distinct(clean, "v", k=8).collect()[0]
    assert tuple(got) == tuple(want) and got["est_distinct"] == 3
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": ["a", None, "b", None, "c"]}))
    assert con.sql(K.kmv_sql("t", "v", k=8)).fetchall()[0] == tuple(want)

"""Spider-trap detection (analysis/trapdetect.py): known-value signals,
threshold verdicts, hostile inputs, and Spark-vs-DuckDB equality."""

import pytest

from spider_spark.analysis.trapdetect import (
    trap_hosts,
    trap_hosts_sql,
    trap_signals,
    trap_signals_sql,
)


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_trap_signals_known_values(spark):
    got = {
        r["url"]: r.asDict()
        for r in trap_signals(
            _urls(
                spark,
                [
                    "https://a.example/x/y/z",
                    "https://a.example/a/b/a/b/a",
                    "https://b.example/p?session=1&page=2&sort=asc",
                    "https://c.example",
                    "https://c.example/",
                ],
            )
        ).collect()
    }
    r = got["https://a.example/x/y/z"]
    assert (r["host"], r["depth"], r["max_seg_repeat"], r["n_params"]) == (
        "a.example",
        3,
        1,
        0,
    )
    r = got["https://a.example/a/b/a/b/a"]
    assert r["depth"] == 5 and r["max_seg_repeat"] == 3  # 'a' x3
    r = got["https://b.example/p?session=1&page=2&sort=asc"]
    assert r["path"] == "/p" and r["n_params"] == 3
    assert r["pathq"] == "/p?session=1&page=2&sort=asc"
    # bare host and bare slash: depth 0, repeat 0, no params
    for u in ("https://c.example", "https://c.example/"):
        r = got[u]
        assert (r["depth"], r["max_seg_repeat"], r["n_params"]) == (0, 0, 0)


def test_trap_hosts_verdicts(spark):
    urls = (
        # healthy: 3 distinct shallow paths, no queries
        ["https://ok.example/p%d" % i for i in range(3)]
        # cyclic-path trap: segment repeats 4x
        + ["https://loop.example/a/b/a/b/a/b/a"]
        # session-id trap: 1 physical path, 40 query variants
        + ["https://sess.example/list?sid=%d" % i for i in range(40)]
        # duplicate discoveries must not inflate the blow-up ratio
        + ["https://sess.example/list?sid=0"] * 5
    )
    got = {r["host"]: r.asDict() for r in trap_hosts(_urls(spark, urls)).collect()}
    assert not got["ok.example"]["is_trap"]
    assert got["ok.example"]["param_blowup_ppm"] == 1_000_000
    assert got["loop.example"]["is_trap"]
    assert got["loop.example"]["max_repeat"] == 4
    s = got["sess.example"]
    assert s["is_trap"] and s["n_paths"] == 1 and s["n_pathqs"] == 40
    assert s["param_blowup_ppm"] == 40_000_000
    assert s["n_urls"] == 40  # distinct urls only


def test_trap_signals_hostile_inputs(spark):
    # garbage that is not a URL must not crash and must yield zeros
    got = {
        r["url"]: r.asDict()
        for r in trap_signals(
            _urls(spark, ["", "not a url", "http://", "https:///x//y"])
        ).collect()
    }
    assert got[""]["depth"] == 0 and got[""]["max_seg_repeat"] == 0
    assert got["not a url"]["host"] == ""  # no '//': split_part yields ''
    assert got["http://"]["depth"] == 0
    # split_part splits on EVERY '//' (both engines): '/x//y' truncates
    # at the second '//', leaving '/x' -> depth 1, never a crash
    assert got["https:///x//y"]["depth"] == 1


@pytest.mark.parametrize("stage", ["signals", "hosts"])
def test_trapdetect_matches_duckdb(spark, stage):
    import duckdb

    # deterministic mixed corpus: healthy, deep, cyclic and query-heavy
    urls = []
    for i in range(400):
        h = f"h{i % 6}.example.com"
        segs = "/".join(f"s{(i * j) % (2 + i % 5)}" for j in range(1 + i % 7))
        q = f"?a={i % 13}&b={i % 3}" if i % 2 == 0 else ""
        urls.append(f"https://{h}/{segs}{q}")
    df = _urls(spark, urls)
    con = duckdb.connect()
    con.register("urls_t", df.toPandas())

    if stage == "signals":
        got = trap_signals(df)
        sql = trap_signals_sql("SELECT url FROM urls_t")
    else:
        got = trap_hosts(df)
        sql = trap_hosts_sql("SELECT url FROM urls_t")
    cols = got.columns
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, con.execute(sql).fetchall()))
    assert a == b, f"{stage}: spark={a[:3]} duckdb={b[:3]} cols={cols}"

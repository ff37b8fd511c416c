"""Skew profiler (analysis/skew.py): hot-key known values, bounded
output, partition-load accounting, and DuckDB-replica equality."""

from __future__ import annotations

import duckdb

from spider_spark.analysis import skew
from spider_spark.functions.hashing import md5_u32_py

ROWS = [("a",)] * 90 + [("b",)] * 5 + [("c",)] * 5


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "k string")


def test_hot_keys_known_value(spark):
    got = {tuple(r) for r in skew.hot_keys(_df(spark), "k", 10).collect()}
    # N=100, P=10, fair share 10: only 'a' (90 rows) exceeds it.
    # load_ppm = 90*10*1e6/100 = 9_000_000; salt = ceil(900/100) = 9
    assert got == {("a", 90, 9_000_000, 9)}


def test_hot_keys_boundary_not_hot(spark):
    # exactly AT fair share is not hot (strict >): 10 keys x 10 rows
    rows = [(f"k{i}",) for i in range(10) for _ in range(10)]
    assert skew.hot_keys(_df(spark, rows), "k", 10).count() == 0


def test_hot_keys_bounded_by_partitions(spark):
    # at most P-1 keys can each hold strictly more than N/P rows
    rows = [(f"k{i % 7}",) for i in range(700)]
    hot = skew.hot_keys(_df(spark, rows), "k", 4)
    assert hot.count() <= 3


def test_partition_load_accounting(spark):
    from collections import Counter

    cnt = Counter(k for (k,) in ROWS)
    exp: dict[int, list[int]] = {}
    for k, c in cnt.items():
        p = md5_u32_py(k) % 8
        e = exp.setdefault(p, [0, 0])
        e[0] += 1
        e[1] += c
    want = {
        (p, nk, nr, nr * 8 * 1_000_000 // 100)
        for p, (nk, nr) in exp.items()
    }
    got = {
        tuple(r)
        for r in skew.partition_load(_df(spark), "k", 8).collect()
    }
    assert got == want
    assert sum(r[2] for r in got) == 100


def test_partition_load_null_keys_routed(spark):
    # NULLs route to the same concrete partition as '' in both engines
    rows = [("a",)] * 3 + [(None,)] * 2 + [("",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = skew.partition_load(df, "k", 64).collect()
    assert sum(r["n_rows"] for r in out) == 6
    assert all(r["partition"] is not None for r in out)
    # NULL hashes like '' (documented collision): expected layout
    exp: dict[int, list[int]] = {}
    for key, c in (("a", 3), ("", 3)):  # NULL+'' merge into the '' route
        e = exp.setdefault(md5_u32_py(key) % 64, [0, 0])
        e[1] += c
    exp[md5_u32_py("a") % 64][0] += 1
    exp[md5_u32_py("") % 64][0] += 2  # NULL and '' are 2 distinct keys
    got = {r["partition"]: [r["n_keys"], r["n_rows"]] for r in out}
    assert got == exp


def test_load_ppm_overflow_free_formula():
    # the two-step floor identity must equal the naive big-int formula
    # in the regime where the naive int64 product overflows
    n, p = 10**10, 4096
    for c in (3 * 10**9, 10**10 - 1, 7):
        naive = c * p * 1_000_000 // n  # python big ints: exact
        two_step = (c * 1_000_000 // n) * p + ((c * 1_000_000 % n) * p) // n
        assert two_step == naive
        assert (c * 1_000_000) < 2**63 and ((n - 1) * p) < 2**63


def test_skew_duckdb_equality(spark):
    rows = [(f"h{(i * i) % 13}",) for i in range(500)]
    df = _df(spark, rows)
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}')" for (k,) in rows)
        + ") v(k)"
    )
    n = "(SELECT count(*) FROM t)"
    got = {
        tuple(r)
        for r in skew.hot_keys(df, "k", 16, total=500).collect()
    }
    want = {tuple(r) for r in con.sql(skew.hot_keys_sql("t", "k", 16, n)).fetchall()}
    assert got == want and got  # non-empty: the quadratic residues skew
    got_pl = {
        tuple(r)
        for r in skew.partition_load(df, "k", 16, total=500).collect()
    }
    want_pl = {
        tuple(r)
        for r in con.sql(skew.partition_load_sql("t", "k", 16, n)).fetchall()
    }
    assert got_pl == want_pl


def test_auto_salt_crawl_parity_and_salt_applied(spark, tmp_path):
    """cfg.auto_salt closes the measure->plan loop: the politeness
    pre-prune salt follows hot_keys' measured salt_factor per round.
    Salt is physical-only, so the crawl must stay bit-identical to the
    oracle while the recorded salt_used exceeds 1 on a skewed frontier
    (host0 carries 2x the pages -> far above fair share of a 32-way
    shuffle)."""
    from spider_spark.config import CrawlConfig
    from spider_spark.fixtures import synth_web, write_web
    from spider_spark.oracle import crawl as oracle_crawl
    from tests.test_engine_vs_oracle import assert_match, engine_run

    web = synth_web(
        n_hosts=3, pages_per_host=40, links_per_page=6, seed=31
    )
    base = dict(scrape_parallelism=6, max_retries=1, max_rounds=200)
    oracle_res = oracle_crawl(web, CrawlConfig(**base))
    cfg = CrawlConfig(auto_salt=True, auto_salt_cap=16, **base)
    eng, _ = engine_run(spark, web, cfg, tmp_path, "autosalt")
    assert_match(eng, oracle_res)
    salts = [m["salt_used"] for m in eng.metrics if m["scheduled"]]
    assert any(s > 1 for s in salts), salts
    assert all(1 <= s <= 16 for s in salts), salts

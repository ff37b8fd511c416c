"""Bucketed lake layout (spider_spark/lake.py): co-located joins must
compile with ZERO Exchange operators, and results must equal the plain
shuffled join."""

import pyspark.sql.functions as F
import pytest

from spider_spark import lake


@pytest.fixture(scope="module")
def bucketed_state(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("lakewh"))
    cand = spark.range(5000).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias(
            "url"
        ),
        (F.col("id") % 7).alias("depth"),
    )
    seen = spark.range(0, 5000, 2).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias(
            "url"
        ),
        F.lit(1).alias("attempts"),
    )
    lake.write_bucketed(cand, "t_cand", "url", n_buckets=8, path=wh + "/cand")
    lake.write_bucketed(seen, "t_seen", "url", n_buckets=8, path=wh + "/seen")
    yield cand, seen, wh
    for t in ("t_cand", "t_seen", "t_seen_16"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def no_broadcast(spark):
    """At the 10^10 design point neither join side fits broadcast; the
    sandbox fixture does, so pin the big-big plan by disabling the
    broadcast path for these tests."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_anti_join_zero_exchange(spark, bucketed_state, no_broadcast):
    cand, seen, _wh = bucketed_state
    bc = lake.read_table(spark, "t_cand")
    bs = lake.read_table(spark, "t_seen")
    j = lake.bucketed_anti_join(bc, bs)
    assert lake.count_exchanges(j) == 0, "co-located join still shuffles"
    # the plain-parquet baseline of the SAME join shuffles both sides
    plain = lake.bucketed_anti_join(cand, seen)
    assert lake.count_exchanges(plain) >= 2
    # and results are identical either way
    got = sorted(r["url"] for r in j.collect())
    want = sorted(r["url"] for r in plain.collect())
    assert got == want and len(got) == 2500  # odd ids are unseen


def test_bucketed_join_reads_presorted_buckets(spark, bucketed_state, no_broadcast):
    """sortBy(key) at write time removes the Sort below SortMergeJoin."""
    bc = lake.read_table(spark, "t_cand")
    bs = lake.read_table(spark, "t_seen")
    j = bc.join(bs, "url")  # inner equi-join, both bucketed
    plan = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "simple"
    ).split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_mismatched_bucket_counts_still_correct(spark, bucketed_state):
    """A table written with a different bucket count joins correctly
    (Spark re-shuffles one side) — layout is a performance contract,
    never a correctness one."""
    cand, seen, _wh = bucketed_state
    lake.write_bucketed(seen, "t_seen_16", "url", n_buckets=16, path=_wh + "/seen16")
    j = lake.bucketed_anti_join(
        lake.read_table(spark, "t_cand"),
        lake.read_table(spark, "t_seen_16"),
    )
    assert j.count() == 2500

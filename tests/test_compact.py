"""compact_state: the Iceberg-style rewrite_data_files maintenance action
over the per-round delta dirs — row-for-row lossless, resumable after, and
crash-recoverable from either side of the commit marker."""

import json
import os
import shutil

from spider_spark.config import CrawlConfig
from spider_spark.engine import _COMPACT_MARKER, _COMPACT_TMP, CrawlEngine
from spider_spark.fixtures import synth_web, write_web
from spider_spark.oracle import crawl as oracle_crawl
from tests.test_engine_vs_oracle import (
    assert_match,
    engine_order,
    engine_seen,
    engine_urls,
)


def _round_dirs(work_dir, kind):
    base = os.path.join(work_dir, kind)
    return sorted(
        d for d in os.listdir(base) if d.startswith("round=")
    ) if os.path.isdir(base) else []


def test_compact_lossless_and_crawl_continues(spark, tmp_path):
    """Mid-crawl compaction: state tables identical before/after (including
    seen-row multiplicity, which R6 visit counts rely on), each kind merged
    to ONE dir, and the crawl finishes matching the oracle exactly."""
    web = synth_web(n_hosts=3, pages_per_host=40, links_per_page=5, seed=7)
    cfg = CrawlConfig(scrape_parallelism=10, max_retries=1, max_rounds=200)
    input_dir = write_web(web, str(tmp_path / "web_c"))
    work = str(tmp_path / "work_c")

    eng = CrawlEngine(spark, input_dir, work, cfg)
    eng.initialize()
    eng.run_round()
    eng.run_round()

    before = (engine_seen(eng), engine_urls(eng), engine_order(eng))
    assert len(_round_dirs(work, "seen")) == 3  # rounds 0..2
    compacted = eng.compact_state()
    assert compacted["seen"] > 0 and compacted["order"] > 0
    assert len(_round_dirs(work, "seen")) == 1
    assert len(_round_dirs(work, "urls")) == 1
    assert len(_round_dirs(work, "order")) == 1
    assert (engine_seen(eng), engine_urls(eng), engine_order(eng)) == before

    eng.run()  # finish from the compacted state
    assert_match(eng, oracle_crawl(web, cfg))

    # second compaction after more rounds folds new deltas into the base
    eng.compact_state()
    assert len(_round_dirs(work, "seen")) == 1
    assert_match(eng, oracle_crawl(web, cfg))


def test_resume_after_compaction(spark, tmp_path):
    """resume() from the latest checkpoint is exact after compaction."""
    web = synth_web(n_hosts=2, pages_per_host=30, links_per_page=4, seed=13)
    cfg = CrawlConfig(scrape_parallelism=6, max_retries=1)
    input_dir = write_web(web, str(tmp_path / "web_rc"))

    full = CrawlEngine(spark, input_dir, str(tmp_path / "work_rcfull"), cfg)
    full.run()

    part = CrawlEngine(spark, input_dir, str(tmp_path / "work_rc"), cfg)
    part.initialize()
    part.run_round()
    part.run_round()
    part.compact_state()
    resumed = CrawlEngine.resume(
        spark, input_dir, str(tmp_path / "work_rc"), cfg
    )
    assert resumed.round == 2
    resumed.run()
    assert engine_seen(full) == engine_seen(resumed)
    assert engine_order(full) == engine_order(resumed)
    assert engine_urls(full) == engine_urls(resumed)


def test_crash_recovery_rolls_forward_and_back(spark, tmp_path):
    """Marker present (data verified) -> recovery completes the swap;
    no marker -> a stale tmp is discarded and deltas stay untouched."""
    web = synth_web(n_hosts=2, pages_per_host=20, links_per_page=4, seed=5)
    cfg = CrawlConfig(scrape_parallelism=5, max_retries=1)
    input_dir = write_web(web, str(tmp_path / "web_cr"))
    work = str(tmp_path / "work_cr")
    eng = CrawlEngine(spark, input_dir, work, cfg)
    eng.initialize()
    eng.run_round()
    eng.run_round()
    before = engine_seen(eng)
    base = os.path.join(work, "seen")

    # crash AFTER marker, before any swap: stage the verified tmp by hand
    inputs = _round_dirs(work, "seen")
    tmp = os.path.join(base, _COMPACT_TMP)
    os.makedirs(tmp)
    for d in inputs:  # tmp = union of all deltas (flat copy of their files)
        for f in os.listdir(os.path.join(base, d)):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(base, d, f), os.path.join(tmp, f"{d}_{f}")
                )
    with open(os.path.join(base, _COMPACT_MARKER), "w") as f:
        json.dump({"upto": eng.round, "inputs": inputs}, f)
    eng2 = CrawlEngine(spark, input_dir, work, cfg)  # ctor runs recovery
    eng2.round = eng.round
    assert not os.path.exists(os.path.join(base, _COMPACT_MARKER))
    assert _round_dirs(work, "seen") == [f"round={eng.round}"]
    assert engine_seen(eng2) == before

    # crash BEFORE marker: stale tmp only -> discarded, deltas untouched
    os.makedirs(os.path.join(base, _COMPACT_TMP))
    eng3 = CrawlEngine(spark, input_dir, work, cfg)
    eng3.round = eng.round
    assert not os.path.exists(os.path.join(base, _COMPACT_TMP))
    assert engine_seen(eng3) == before


def test_crash_recovery_after_rename_keeps_output(spark, tmp_path):
    """The third crash window: marker present, tmp ALREADY renamed onto
    round=<upto> (crash between rename and marker removal). round=<upto>
    is both an input name and the output — recovery must NOT delete it."""
    web = synth_web(n_hosts=2, pages_per_host=20, links_per_page=4, seed=6)
    cfg = CrawlConfig(scrape_parallelism=5, max_retries=1)
    input_dir = write_web(web, str(tmp_path / "web_cr2"))
    work = str(tmp_path / "work_cr2")
    eng = CrawlEngine(spark, input_dir, work, cfg)
    eng.initialize()
    eng.run_round()
    eng.run_round()
    before = engine_seen(eng)
    base = os.path.join(work, "seen")

    inputs = _round_dirs(work, "seen")
    assert len(inputs) >= 2
    # run the real compaction, then resurrect the marker as if the
    # process died a microsecond before os.remove(marker)
    eng.compact_state(kinds=("seen",))
    assert _round_dirs(work, "seen") == [f"round={eng.round}"]
    with open(os.path.join(base, _COMPACT_MARKER), "w") as f:
        json.dump({"upto": eng.round, "inputs": inputs}, f)

    eng2 = CrawlEngine(spark, input_dir, work, cfg)  # ctor runs recovery
    eng2.round = eng.round
    assert not os.path.exists(os.path.join(base, _COMPACT_MARKER))
    assert _round_dirs(work, "seen") == [f"round={eng.round}"]
    assert engine_seen(eng2) == before  # the table survived


def test_bucketed_compaction_zero_exchange_and_parity(spark, tmp_path):
    """cfg.seen_bucketed: compaction writes the seen base via
    lake.write_bucketed; the R4 anti-join then reads the state side with
    NO Exchange and NO Sort (only the round-sized candidate set
    shuffles), rows stay identical, the crawl still matches the oracle,
    and a fresh engine re-registers the layout from the sidecar."""
    import pyspark.sql.functions as F

    from spider_spark import lake

    web = synth_web(n_hosts=3, pages_per_host=40, links_per_page=5, seed=9)
    cfg = CrawlConfig(
        scrape_parallelism=10,
        max_retries=1,
        max_rounds=200,
        seen_bucketed=True,
        seen_bucket_count=8,
    )
    input_dir = write_web(web, str(tmp_path / "web_b"))
    work = str(tmp_path / "work_b")

    eng = CrawlEngine(spark, input_dir, work, cfg)
    eng.initialize()
    eng.run_round()
    eng.run_round()
    before = engine_seen(eng)
    assert eng.compact_state()["seen"] > 0
    assert eng._seen_bucketed_round == eng.round
    assert engine_seen(eng) == before  # lossless, multiplicity intact

    # ---- plan pin: state side of R4 is Exchange- and Sort-free -------
    base, deltas = eng._seen_state()
    assert base is not None and deltas is None
    cand = spark.range(500).select(
        F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias(
            "url"
        )
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = eng._anti_seen(cand, base, deltas)
        # exactly ONE Exchange: the candidate side; zero on the seen side
        assert lake.count_exchanges(j) == 1
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        ).split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan, plan
        # the plain-parquet baseline shuffles BOTH sides
        plain = cand.join(
            spark.read.parquet(
                os.path.join(work, "seen", f"round={eng.round}")
            ).select("url"),
            "url",
            "left_anti",
        )
        assert lake.count_exchanges(plain) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # ---- crawl continues over the bucketed base, matches the oracle --
    eng.run()
    assert_match(eng, oracle_crawl(web, cfg))

    # deltas accumulated since the compaction anti-join as a second step
    base2, deltas2 = eng._seen_state()
    assert base2 is not None and deltas2 is not None
    assert not deltas2.rdd.isEmpty()

    # second compaction folds the deltas into a NEW bucketed base
    assert eng.compact_state()["seen"] > 0
    assert eng._seen_bucketed_round == eng.round
    assert_match(eng, oracle_crawl(web, cfg))

    # ---- restart: a fresh engine re-registers from the sidecar -------
    eng2 = CrawlEngine(spark, input_dir, work, cfg)
    assert eng2._seen_bucketed_round == eng._seen_bucketed_round
    t = spark.table(eng2._seen_table_name())
    assert t.columns == ["url", "host", "round"]
    assert t.count() == sum(engine_seen(eng).values())


def test_stale_bucket_sidecar_over_plain_files_is_ignored(spark, tmp_path):
    """A _bucketed.json surviving a crashed re-compaction under a
    toggled cfg must not attach bucket metadata to plain parquet files
    (that would mis-route the co-located join): registration verifies
    the bucket-id filename stamp and retires the sidecar otherwise."""
    import json

    web = synth_web(n_hosts=2, pages_per_host=20, links_per_page=4, seed=4)
    cfg = CrawlConfig(scrape_parallelism=8, max_rounds=50)
    input_dir = write_web(web, str(tmp_path / "web_s"))
    work = str(tmp_path / "work_s")
    eng = CrawlEngine(spark, input_dir, work, cfg)
    eng.initialize()
    eng.run_round()
    eng.compact_state()  # PLAIN compaction (seen_bucketed off)
    # forge a sidecar claiming the plain dir is bucketed
    with open(os.path.join(work, "seen", "_bucketed.json"), "w") as f:
        json.dump({"round": eng.round, "n_buckets": 8}, f)
    eng2 = CrawlEngine(spark, input_dir, work, cfg)
    assert eng2._seen_bucketed_round is None
    assert not os.path.exists(os.path.join(work, "seen", "_bucketed.json"))
    eng2.close()
    eng.close()

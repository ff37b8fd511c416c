"""Persistent spark-submit worker for interleaved A/B scaling runs.

The round-3 scaling attempts all self-marked inconclusive because the
shared VM's capacity drifted 11-30% across each ~35-minute sequential
run: the low leg and the high leg sampled DIFFERENT clock windows, so
their throughput ratio carried the drift. The fix is methodological:
keep one warm JVM per parallelism level alive for the whole run and
alternate short timed reps between them (A/B/B/A blocks), so both legs
sample the same few-minute clock windows and drift cancels in the ratio
instead of gating the run.

This module is the worker half: it starts a SparkSession under whatever
master spark-submit gives it, warms up (Python worker pool + an untimed
warm-up crawl), prints READY, then serves a line protocol read from the
``--control`` named pipe (Spark's PythonRunner does NOT forward the JVM's
stdin to the Python driver, so stdin cannot carry commands; stdout IS
forwarded, so replies ride it):

    RUN    -> wipe the work dir, initialize (untimed), run the timed
              crawl rounds, print one line: REP {json}
    FINAL  -> like RUN, but also compute the seen-set size and run
              finalize_fetched() (untimed, reported) for verification
    QUIT   -> stop the session and exit

The orchestrator (bench_scaling_interleaved.py) pins this process with
taskset and manages burner load so every timed rep runs at identical
machine-wide load.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

import pandas as pd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--budget", type=int, default=20000)
    ap.add_argument("--max-rounds", type=int, default=50)
    ap.add_argument("--bloom", action="store_true")
    ap.add_argument("--salt", type=int, default=1)
    ap.add_argument("--seen-buckets", type=int, default=32)
    ap.add_argument("--warmup-input", default=None)
    ap.add_argument(
        "--control",
        required=True,
        help="named pipe to read RUN/FINAL/QUIT commands from",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("spider_spark_crawl_worker")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    sc = spark.sparkContext
    cores = sc.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))
    sc.setLogLevel("ERROR")

    from spider_spark.config import CrawlConfig
    from spider_spark.engine import CrawlEngine

    @F.pandas_udf("int")
    def _warm(s: pd.Series) -> pd.Series:
        return s.str.len().fillna(0).astype("int32")

    warm_df = (
        spark.range(cores * 2000)
        .select(F.concat(F.lit("w"), F.col("id").cast("string")).alias("s"))
        .repartition(cores * 2)
    )
    warm_df.select(_warm("s").alias("n")).groupBy((F.col("n") % 4)).count().collect()

    cfg = CrawlConfig(
        scrape_parallelism=args.budget,
        max_retries=0,
        max_rounds=args.max_rounds,
        bloom_enabled=args.bloom,
        hot_host_salt=args.salt,
        num_seen_buckets=args.seen_buckets,
        sanity_check=False,
    )

    if args.warmup_input:
        wwork = args.work + "_warm"
        shutil.rmtree(wwork, ignore_errors=True)
        weng = CrawlEngine(spark, args.warmup_input, wwork, cfg)
        weng.run()
        weng.close()
        shutil.rmtree(wwork, ignore_errors=True)

    print(f"READY {json.dumps({'cores': cores, 'master': sc.master})}", flush=True)

    # opening the read end blocks until the orchestrator (which waits for
    # READY first) opens the write end — a clean rendezvous
    ctl = open(args.control, "r")
    # the document caches are pure functions of the immutable input
    # corpus: build once, share across reps (a steady-state crawler does
    # not re-fill multi-GB caches per crawl)
    docs_cache = None
    for line in ctl:
        cmd = line.strip().upper()
        if cmd == "QUIT":
            break
        if cmd not in ("RUN", "FINAL"):
            continue
        shutil.rmtree(args.work, ignore_errors=True)
        eng = CrawlEngine(
            spark, args.input, args.work, cfg, docs_cache=docs_cache
        )
        if docs_cache is None:
            docs_cache = eng.docs_cache()
        # seeding (round 0) is setup, same as the reference's pre-tick
        # work; the timed section is the crawl rounds (the metric)
        eng.initialize()
        t0 = time.time()
        summary = eng.run(finalize=False)
        wall = time.time() - t0
        rep = {
            "cores": cores,
            "urls_fetched": summary.urls_fetched,
            "rounds": summary.rounds,
            "wall_sec": round(wall, 3),
            "urls_per_sec": round(summary.urls_fetched / wall, 1),
        }
        if cmd == "FINAL":
            tf = time.time()
            eng.finalize_fetched()
            rep["finalize_sec"] = round(time.time() - tf, 3)
            rep["seen_urls"] = eng.seen_df().select("url").distinct().count()
        eng.close()
        print(f"REP {json.dumps(rep)}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()

"""R21 round-0 seeding bench on a sitemap-INDEX-heavy fixture.

The reference expands sitemap indexes by driver-side recursion
(SitemapInspector.scala:22-58); the engine's default path is the
distributed iterative self-join flatten (operators/expand.py) feeding
fifo_rank'd frontier writes — built precisely for hosts whose seed
frontier is itself big data. This bench evidences that design on a
fixture where it matters: every host publishes a depth-D index tree
(fanout^D urlsets x urls_per_leaf URLs).

Per driver instruction, scaling evidence = the SAME job on the SAME
input at two parallelism levels. Timed section = engine.initialize()
(expansion + robots gate + fifo_rank + frontier/seen writes). The
legacy driver-dict path (cfg.spark_seeding=False — the shape of the
reference's recursion) runs at the high level for contrast.

Usage: python scripts/bench_seeding.py [--hosts 8 --fanout 6 --depth 2
       --leaf 1000 --reps 2 --low 8 --high 32 [--json-out PATH]]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spider_spark.config import CrawlConfig
from spider_spark.engine import CrawlEngine
from spider_spark.fixtures import sitemap_heavy_web, write_web
from spider_spark.session import get_spark


def time_seeding(
    master: str, input_dir: str, work_base: str, reps: int, spark_seeding: bool
) -> dict:
    spark = get_spark(master=master, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(spark_seeding=spark_seeding)
    best, frontier_n = None, 0
    try:
        for rep in range(reps):
            wd = os.path.join(work_base, f"w_{master}_{spark_seeding}_{rep}")
            eng = CrawlEngine(spark, input_dir, wd, cfg)
            t0 = time.time()
            eng.initialize()
            dt = time.time() - t0
            frontier_n = eng._last_frontier_next
            eng.close()
            shutil.rmtree(wd, ignore_errors=True)
            best = dt if best is None else min(best, dt)
    finally:
        spark.stop()
    return {
        "master": master,
        "spark_seeding": spark_seeding,
        "best_sec": round(best, 3),
        "frontier_urls": frontier_n,
        "urls_per_sec": round(frontier_n / best, 1),
        "reps": reps,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--fanout", type=int, default=6)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--leaf", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    web = sitemap_heavy_web(args.hosts, args.fanout, args.depth, args.leaf)
    tmp = tempfile.mkdtemp(prefix="smheavy_")
    try:
        input_dir = write_web(web, os.path.join(tmp, "web"))
        n_sitemaps = len(web.sitemaps)
        legs = {
            "low": time_seeding(
                f"local[{args.low}]", input_dir, tmp, args.reps, True
            ),
            "high": time_seeding(
                f"local[{args.high}]", input_dir, tmp, args.reps, True
            ),
            "legacy_driver_high": time_seeding(
                f"local[{args.high}]", input_dir, tmp, args.reps, False
            ),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert legs["low"]["frontier_urls"] == legs["high"]["frontier_urls"]
    assert (
        legs["legacy_driver_high"]["frontier_urls"]
        == legs["high"]["frontier_urls"]
    ), "Spark and legacy seeding disagree on the frontier"
    core_ratio = args.high / args.low
    speedup = legs["low"]["best_sec"] / legs["high"]["best_sec"]
    result = {
        "metric": "round-0 seed URLs ranked+written per second, "
        "sitemap-index-heavy fixture",
        "fixture": {
            "hosts": args.hosts,
            "fanout": args.fanout,
            "index_depth": args.depth,
            "urls_per_leaf": args.leaf,
            "sitemap_nodes": n_sitemaps,
        },
        **legs,
        "core_ratio": core_ratio,
        "speedup": round(speedup, 2),
        "scaling_efficiency": round(speedup / core_ratio, 3),
        "spark_vs_legacy_driver": round(
            legs["legacy_driver_high"]["best_sec"] / legs["high"]["best_sec"],
            2,
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

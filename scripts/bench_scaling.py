"""Scaling-efficiency evidence for the north_rule (N vs 4N executors).

No real cluster exists in the sandbox, so per driver instruction the same
job runs on the same input at two parallelism levels — local[8] and
local[32] — via ``spark-submit --py-files`` (the north_rule deployment
shape). Reports throughput at both plus scaling efficiency
(= (thr_4N / thr_N) / 4; target ≥ 0.8) and writes BENCH_SCALING.json.

    python scripts/bench_scaling.py [--hosts 8] [--pages 12000] [--low 8]
                                    [--high 32] [--bloom] [--salt 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_web(cache: str, n_hosts: int, pages: int, links: int, filler: int) -> str:
    web_dir = os.path.join(cache, f"scaleweb_{n_hosts}_{pages}_{links}_{filler}")
    if os.path.exists(os.path.join(web_dir, "documents.parquet")):
        return web_dir
    from spider_spark.fixtures import synth_web, write_web

    t0 = time.time()
    web = synth_web(
        n_hosts=n_hosts,
        pages_per_host=pages,
        links_per_page=links,
        filler_chars=filler,
        seed=42,
    )
    write_web(web, web_dir)
    print(
        f"[bench_scaling] built web: {len(web.documents)} docs in "
        f"{time.time() - t0:.1f}s -> {web_dir}",
        file=sys.stderr,
    )
    return web_dir


def build_zip(cache: str) -> str:
    """Package spider_spark for --py-files (the cluster-ship artifact)."""
    zpath = os.path.join(cache, "spider_spark.zip")
    if os.path.exists(zpath):
        os.remove(zpath)
    shutil.make_archive(zpath[:-4], "zip", REPO, "spider_spark")
    return zpath


def run_once(cores: int, zip_path: str, web_dir: str, cache: str, args) -> dict:
    work = os.path.join(cache, f"scalework_{cores}")
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        "--conf",
        "spark.driver.memory=16g",
        "--py-files",
        zip_path,
        os.path.join(REPO, "scripts", "crawl_job.py"),
        "--input",
        web_dir,
        "--work",
        work,
        "--budget",
        str(args.budget),
        "--salt",
        str(args.salt),
    ]
    if args.bloom:
        cmd.append("--bloom")
    print(f"[bench_scaling] {' '.join(cmd)}", file=sys.stderr)
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(proc.stdout[-3000:], file=sys.stderr)
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"crawl_job produced no JSON at local[{cores}]")
    return json.loads(line[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--pages", type=int, default=12000)
    ap.add_argument("--links", type=int, default=12)
    ap.add_argument("--filler", type=int, default=600)
    ap.add_argument("--budget", type=int, default=20000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--bloom", action="store_true")
    ap.add_argument("--salt", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING.json"))
    args = ap.parse_args()

    cache = os.path.join(REPO, ".cache")
    os.makedirs(cache, exist_ok=True)
    web_dir = build_web(cache, args.hosts, args.pages, args.links, args.filler)
    zip_path = build_zip(cache)

    low = run_once(args.low, zip_path, web_dir, cache, args)
    high = run_once(args.high, zip_path, web_dir, cache, args)
    ratio = args.high / args.low
    eff = (high["urls_per_sec"] / low["urls_per_sec"]) / ratio
    out = {
        "metric": "URLs fetched+deduped per second, same input at two "
        "parallelism levels (sandbox stand-in for N vs 4N executors)",
        "low": low,
        "high": high,
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

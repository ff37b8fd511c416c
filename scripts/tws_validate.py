"""Standalone transformWithStateInPandas runtime validation job.

Runs BOTH custom StatefulProcessors (_HostTotalsProcessor,
_TokenBucketProcessor) through the REAL transformWithStateInPandas
state-server protocol — protobuf wire messages to the JVM, RocksDB
state store — and cross-checks every output row against the GroupState
fallback path and a pure-Python simulation on the same forced
micro-batch sequence.

When the interpreter has no google.protobuf, the vendored
spider_spark.protoshim mini-runtime is installed first (before the JVM
starts, so executor workers inherit it via PYTHONPATH). With neither
runtime available the job exits non-zero.

    python scripts/tws_validate.py [--cores 4] [--out TWS_VALIDATE.json]

Prints ONE JSON line:
  {"tws_available": true, "shim_active": true,
   "host_totals_match": true, "token_bucket_match": true,
   "rows": {...}, "wall_sec": t}
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


def _run_to_memory(df, name, ckpt):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from spider_spark import protoshim

    shim_active = protoshim.install()

    from spider_spark.session import get_spark
    from spider_spark.streaming.stateful import (
        TWS_AVAILABLE,
        rocksdb_conf,
        running_host_totals,
        token_bucket_schedule,
    )

    if not TWS_AVAILABLE:
        print(json.dumps({"tws_available": False, "error": "no protobuf"}))
        sys.exit(1)

    t0 = time.time()
    spark = get_spark(
        app_name="tws_validate",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
        extra_conf=rocksdb_conf(),
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="tws_validate_")
    try:
        schema = "host string, url string, seq long"
        batches = [
            [("h1", f"https://h1/{i}", i) for i in range(5)]
            + [("h2", "https://h2/0", 0)],
            [("h1", f"https://h1/{i}", i) for i in range(5, 7)]
            + [("h3", "https://h3/0", 0)],
            [("h2", "https://h2/1", 1), ("h3", "https://h3/1", 1)],
        ]
        src = os.path.join(work, "frontier")
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                os.path.join(src, f"part{i}")
            )

        def _stream():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(os.path.join(src, "part*"))
            )

        # --- host totals through both wire protocols ------------------
        totals = {}
        for api in ("tws", "legacy"):
            _run_to_memory(
                running_host_totals(_stream(), api=api),
                f"v_tot_{api}",
                os.path.join(work, f"ck_tot_{api}"),
            )
            totals[api] = {
                (r["host"], r["n_total"], r["n_batch"])
                for r in spark.table(f"v_tot_{api}").collect()
            }
        want_finals = {"h1": 7, "h2": 2, "h3": 2}
        got_finals = {}
        for host, n_total, _nb in totals["tws"]:
            got_finals[host] = max(got_finals.get(host, 0), n_total)
        host_totals_match = (
            totals["tws"] == totals["legacy"] and got_finals == want_finals
        )

        # --- token bucket through both wire protocols -----------------
        buckets = {}
        for api in ("tws", "legacy"):
            _run_to_memory(
                token_bucket_schedule(
                    _stream(), rate=2, capacity=3, api=api
                ),
                f"v_tb_{api}",
                os.path.join(work, f"ck_tb_{api}"),
            )
            buckets[api] = {
                (r["host"], r["url"], r["seq"], r["batch_pos"])
                for r in spark.table(f"v_tb_{api}").collect()
            }
        # pure-python simulation of the bucket discipline
        tokens: dict = {}
        want = set()
        for rows in batches:
            by_host: dict = {}
            for h, u, s in rows:
                by_host.setdefault(h, []).append((s, u))
            for h, items in by_host.items():
                t = tokens.get(h, 3)
                items.sort()
                take = min(t, len(items))
                for pos, (s, u) in enumerate(items[:take], 1):
                    want.add((h, u, s, pos))
                tokens[h] = min(3, t - take + 2)
        token_bucket_match = (
            buckets["tws"] == buckets["legacy"] and buckets["tws"] == want
        )

        result = {
            "tws_available": True,
            "shim_active": bool(shim_active),
            "host_totals_match": bool(host_totals_match),
            "token_bucket_match": bool(token_bucket_match),
            "rows": {
                "host_totals": len(totals["tws"]),
                "token_bucket": len(buckets["tws"]),
            },
            "cores": args.cores,
            "wall_sec": round(time.time() - t0, 2),
        }
        line = json.dumps(result)
        print(line)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(line + "\n")
        if not (host_totals_match and token_bucket_match):
            sys.exit(2)
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

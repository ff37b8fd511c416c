"""Local replica of the driver's correctness gate: run every queries()
entry against its oracle_sql() via DuckDB at a given sf and diff
row-counts + values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from spider_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            # 12 decimals ~ the driver's value-hash strictness for the
            # float columns this contract carries (every query pushes
            # real arithmetic to exact int/decimal precisely so engines
            # cannot diverge; floats appear only as final casts). The
            # old 4-decimal round was a looser gate than the driver's.
            df[c] = df[c].round(12)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_json: str | None = None,
         only: set[str] | None = None):
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    results: dict[str, dict] = {}
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            results[name] = {"status": "fail-spark", "err": str(e)[:300]}
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            results[name] = {"status": "rows-only", "rows": len(sdf)}
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            results[name] = {"status": "fail-duck", "err": str(e)[:300]}
            print(f"[FAIL-duck] {name}: {e}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"cols {list(a.columns)} != {list(b.columns)}"))
            results[name] = {"status": "fail-cols"}
            print(f"[FAIL-cols] {name}: {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append((name, f"rows {len(a)} != {len(b)}"))
            results[name] = {
                "status": "fail-rows", "rows": len(a), "oracle_rows": len(b),
            }
            print(f"[FAIL-rows] {name}: {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            diff = pd.concat(
                [a[neq].head(3).add_suffix("_spark"), b[neq].head(3).add_suffix("_duck")],
                axis=1,
            )
            failures.append((name, f"{int(neq.sum())} differing rows"))
            results[name] = {"status": "fail-vals", "diff_rows": int(neq.sum())}
            print(f"[FAIL-vals] {name}: {int(neq.sum())} differing rows\n{diff}")
            continue
        results[name] = {"status": "ok", "rows": len(a)}
        print(f"[OK] {name}: {len(a)} rows")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    # entry smoke
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry(): {n} rows, schema {edf.schema.simpleString()}")
    if out_json:
        import json

        with open(out_json, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "total": len(qs),
                    "passed": len(qs) - len(failures),
                    "entry_rows": n,
                    "results": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {out_json}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    for a in list(args):
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
            args.remove(a)
    main(
        args[0] if len(args) > 0 else "/root/testdata/sf0.01",
        args[1] if len(args) > 1 else None,
        only=only,
    )

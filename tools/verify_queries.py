"""Local stand-in for the driver's correctness gate: run every registry
query on Spark and its oracle on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values (exact, after canonical
normalization). Usage:

    python tools/verify_queries.py [--json SWEEP.json] [query ...]

--json additionally writes a machine-readable sweep result (one entry
per attempted query) — committed per round as SWEEP_r{N}.json so the
queries outside the driver's 50-entry correctness window still leave a
hard, reviewable signal.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


def main() -> int:
    from data_services_spark.registry import ORACLES, QUERIES
    from data_services_spark.session import get_spark

    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    only = set(argv)
    spark = get_spark("verify")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    results: dict[str, dict] = {}

    def record(name, status, rows, t0, reason=None):
        results[name] = {"status": status, "rows": rows,
                         "sec": round(time.time() - t0, 2)}
        if reason:
            results[name]["reason"] = reason

    failures = []
    attempted = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            record(name, "fail", None, t0, f"spark error: {exc}")
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in ORACLES:
            print(f"ok    {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append(name)
                record(name, "fail", 0, t0, "rows-only query returned 0 rows")
                print(f"FAIL  {name}: 0 rows")
            else:
                record(name, "rows_only", len(srows), t0)
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            record(name, "fail", len(srows), t0, f"duckdb error: {exc}")
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            record(name, "fail", len(srows), t0,
                   f"columns {sorted(scols)} vs {sorted(dcols)}")
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            record(name, "fail", len(srows), t0,
                   f"rowcount {len(srows)} vs {len(drows)}")
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if cs != cd:
            failures.append(name)
            bad = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b][:3]
            record(name, "fail", len(srows), t0,
                   f"value mismatch at sorted rows {bad}")
            print(f"FAIL  {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"      spark : {cs[i]}")
                print(f"      duckdb: {cd[i]}")
            continue
        record(name, "pass", len(srows), t0)
        print(f"ok    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{attempted - len(failures)}/{attempted} pass")
    if json_path:
        summary = {
            "sf_dir": SF_DIR,
            "attempted": attempted,
            "pass": attempted - len(failures),
            "fail": len(failures),
            "queries": results,
        }
        with open(json_path, "w") as fh:
            json.dump(summary, fh, indent=1)
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

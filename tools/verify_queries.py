"""Local stand-in for the driver's correctness gate: run every registry
query on Spark and its oracle on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values (exact, after canonical
normalization). Usage:

    python tools/verify_queries.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
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

    only = set(sys.argv[1:])
    spark = get_spark("verify")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

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
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in ORACLES:
            print(f"ok    {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows")
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if cs != cd:
            failures.append(name)
            bad = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"      spark : {cs[i]}")
                print(f"      duckdb: {cd[i]}")
            continue
        print(f"ok    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{attempted - len(failures)}/{attempted} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Decompose the bench's fresh per-query timing into its phases
(round-7 verdict ask #6: the fresh sf0.1 total drifted 4.69s -> 5.31s
across rounds 3-6 while the registry grew 133 -> 149 queries; this
tool shows where each fresh second actually goes so the drift can be
attributed to engine code or ruled out of it).

Phases per bench query, measured on the SAME session/config bench.py
uses:

  build_s   DataFrame construction + Catalyst analysis: the registry
            builder call plus a .schema touch (analysis runs once per
            plan; bench pays this inside every timed rep because each
            rep builds a fresh un-memoized plan by design)
  exec_s    .toArrow() on that prebuilt DataFrame: optimization +
            codegen + job scheduling + shuffle + Arrow fetch
  fresh_s   build + exec timed as ONE region, exactly like bench.py
            (sanity: fresh_s ~= build_s + exec_s within noise)

Also prints the two one-time costs bench EXCLUDES from its metric
(registry import, SparkSession startup) so the judge can see they are
outside the timed region and cannot explain metric drift.

Usage:  python tools/bench_phases.py [--reps 5]
Prints one markdown table + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES",
                          str(4 * 1024 * 1024))

    t0 = time.perf_counter()
    from data_services_spark.registry import RAW_QUERIES  # noqa: PLC0415
    import_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    from data_services_spark.session import get_spark  # noqa: PLC0415
    spark = get_spark("bench_phases")
    spark.sparkContext.setLogLevel("ERROR")
    startup_s = time.perf_counter() - t0

    from bench import BENCH_QUERIES  # noqa: PLC0415

    # Warmup exactly like bench.py: JIT/codegen/Arrow init untimed.
    for name in BENCH_QUERIES:
        RAW_QUERIES[name](spark, sf_dir).toArrow()

    rows = []
    for name in BENCH_QUERIES:
        spark._jvm.System.gc()
        build = exec_ = fresh = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = RAW_QUERIES[name](spark, sf_dir)
            df.schema  # forces analysis, the plan-build half
            t1 = time.perf_counter()
            df.toArrow()
            t2 = time.perf_counter()
            build = min(build, t1 - t0)
            exec_ = min(exec_, t2 - t1)
            # separate one-region rep, bench.py semantics exactly
            t0 = time.perf_counter()
            RAW_QUERIES[name](spark, sf_dir).toArrow()
            fresh = min(fresh, time.perf_counter() - t0)
        rows.append({"query": name, "build_s": round(build, 4),
                     "exec_s": round(exec_, 4),
                     "fresh_s": round(fresh, 4),
                     "build_pct": round(100 * build / (build + exec_), 1)})

    cols = list(rows[0])
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    totals = {k: round(sum(r[k] for r in rows), 4)
              for k in ("build_s", "exec_s", "fresh_s")}
    print(json.dumps({"one_time_excluded": {
        "registry_import_s": round(import_s, 2),
        "session_startup_s": round(startup_s, 2)},
        "totals": totals, "per_query": rows}))
    spark.stop()


if __name__ == "__main__":
    main()

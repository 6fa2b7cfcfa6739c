"""In-session A/B for the analyzed-plan rebuild memo (round 14,
VERDICT ask #6): for every lazy_build bench query, interleave

  build : full builder path (py4j tree construction + Catalyst
          analysis + widen probes) + toArrow
  memo  : Dataset.ofRows over the memoized analyzed plan + toArrow

min-of-N each, alternating so host-noise windows hit both arms.
Also prints the same-handle marginal re-run as the floor that proves
neither arm reuses shuffles. Value parity asserted per query.

Usage: python tools/plan_memo_ab_r14.py [--reps 5]
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

    os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES",
                          str(4 * 1024 * 1024))
    from bench import BENCH_QUERIES, LLM_BENCH_QUERIES
    from data_services_spark.registry import RAW_QUERIES
    from data_services_spark.plans import plan_memo
    from data_services_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_memo_ab")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES + LLM_BENCH_QUERIES]
    for n in names:  # warm: JIT/codegen/Arrow init + fills the memo
        RAW_QUERIES[n](spark, sf).toArrow()
        RAW_QUERIES[n](spark, sf).toArrow()

    out = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"memo_ab {n}")
        key = plan_memo._memo_key(spark, n, sf)
        build = memo = float("inf")
        rows_b = rows_m = None
        for _ in range(args.reps):
            spark._jvm.System.gc()
            saved = plan_memo._MEMO.pop(key, None)  # force builder path
            t0 = time.perf_counter()
            a = RAW_QUERIES[n](spark, sf).toArrow()
            build = min(build, time.perf_counter() - t0)
            rows_b = a.num_rows
            assert plan_memo._MEMO.get(key) is not None or saved is None
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            b = RAW_QUERIES[n](spark, sf).toArrow()  # memo hit
            memo = min(memo, time.perf_counter() - t0)
            rows_m = b.num_rows
        assert rows_b == rows_m, n
        df = RAW_QUERIES[n](spark, sf)
        df.toArrow()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        df.toArrow()  # same-handle marginal: the shuffle-reuse floor
        marg = time.perf_counter() - t0
        out[n] = {"build_s": round(build, 4), "memo_s": round(memo, 4),
                  "marginal_s": round(marg, 4), "rows": rows_b}
        print(f"{n:24s} build {build:7.4f}  memo {memo:7.4f}  "
              f"marginal {marg:7.4f}  rows {rows_b}", flush=True)
    tot_b = sum(v["build_s"] for v in out.values())
    tot_m = sum(v["memo_s"] for v in out.values())
    print(f"{'TOTAL':24s} build {tot_b:7.4f}  memo {tot_m:7.4f}")
    print(json.dumps({"sf_dir": sf, "per_query": out,
                      "total_build_s": round(tot_b, 4),
                      "total_memo_s": round(tot_m, 4)}))
    spark.stop()


if __name__ == "__main__":
    main()

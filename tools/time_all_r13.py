"""Warm noop-sink timing of EVERY registry query at sf0.1 (round-13
optimization checklist, guide §1.4): one untimed warm pass, then
min-of-3 fresh-plan executions into the noop sink per query.

Usage: python tools/time_all_r13.py [--out FILE] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    out_path = None
    args = sys.argv[1:]
    if args and args[0] == "--out":
        out_path = args[1]
        args = args[2:]
    os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES",
                          str(4 * 1024 * 1024))
    from data_services_spark.registry import RAW_QUERIES
    from data_services_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_all_r13")
    spark.sparkContext.setLogLevel("ERROR")

    names = args or sorted(RAW_QUERIES)
    res: dict[str, float] = {}
    for n in names:
        try:
            spark.sparkContext.setJobDescription(f"r13 {n}")
            df = RAW_QUERIES[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                RAW_QUERIES[n](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            res[n] = round(best, 4)
            print(f"{n:32s} {best:8.4f}", flush=True)
        except Exception as e:  # a query that cannot noop (rare) is noted
            res[n] = -1.0
            print(f"{n:32s} ERR {type(e).__name__}: {e}"[:160], flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "timings": res}, f, indent=1,
                      sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()

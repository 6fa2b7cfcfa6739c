"""Round-13 optimization measurement harness (guide §1).

Isolates each bench query's cost with the noop sink (computation only,
no Arrow fetch) next to the bench's toArrow() fetch-all timing, plus
targeted stage decompositions for the expensive queries, so each
optimization targets the measured phase rather than a guess.

Usage: python tools/decompose_r13.py [names...]   (default: bench set)
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def t_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def t_arrow(df) -> float:
    t0 = time.perf_counter()
    df.toArrow()
    return time.perf_counter() - t0


def main() -> None:
    from data_services_spark.registry import RAW_QUERIES
    from data_services_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES",
                          str(4 * 1024 * 1024))
    spark = get_spark("decompose_r13")
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or [
        "q1_pricing_summary", "q3_shipping_priority", "kgx_edge_merge",
        "kgx_node_merge", "window_running_sum", "tumbling_window",
        "knn_cosine", "crawl_ingest", "text_dedup_exact",
        "bpe_tokenize", "bpe_tokenize_dict",
    ]

    # warmup (2 passes, mirrors bench.py)
    for _ in range(2):
        for n in names:
            RAW_QUERIES[n](spark, sf_dir).toArrow()

    out = {}
    for n in names:
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"r13 noop {n}")
        noop = min(t_noop(RAW_QUERIES[n](spark, sf_dir)) for _ in range(5))
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"r13 arrow {n}")
        arrow = min(t_arrow(RAW_QUERIES[n](spark, sf_dir)) for _ in range(5))
        out[n] = {"noop_s": round(noop, 4), "arrow_s": round(arrow, 4),
                  "fetch_s": round(arrow - noop, 4)}
        print(f"{n:28s} noop {noop:7.4f}  arrow {arrow:7.4f}  "
              f"fetch {arrow - noop:7.4f}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-14 A/B: union_lists collect_list vs collect_set (map-side set
dedup before the exchange, guide §2.3) on graph_build / kgx_node_merge /
graph_build_nodes. Parity by full sorted-row comparison."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))

import pyspark.sql.functions as F

NAMES = ["kgx_node_merge", "graph_build", "graph_build_nodes"]


def set_variant(on: bool):
    from data_services_spark.operators import merge

    def ul_list(col):
        c = F.col(col) if isinstance(col, str) else col
        return F.array_sort(F.array_distinct(F.flatten(F.collect_list(c))))

    def ul_set(col):
        c = F.col(col) if isinstance(col, str) else col
        return F.array_sort(F.array_distinct(F.flatten(F.collect_set(c))))

    merge.union_lists = ul_set if on else ul_list


def main():
    from data_services_spark.registry import RAW_QUERIES
    from data_services_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ul_ab_r14")
    spark.sparkContext.setLogLevel("ERROR")

    for n in NAMES:
        set_variant(False)
        ref = sorted(map(tuple, RAW_QUERIES[n](spark, sf_dir).collect()))
        set_variant(True)
        got = sorted(map(tuple, RAW_QUERIES[n](spark, sf_dir).collect()))
        print(f"parity {n}: rows={len(got)} match={got == ref}", flush=True)
        assert got == ref, n

    for on in (False, True, False, True):
        set_variant(on)
        label = "set " if on else "list"
        for n in NAMES:
            spark.sparkContext.setJobDescription(f"ul {label} {n}")
            RAW_QUERIES[n](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                RAW_QUERIES[n](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            print(f"{label} {n:20s} {best:8.4f}", flush=True)
    spark.stop()


main()

"""Round-14: why does the widened slim lineitem scan cost ~0.9s noop?"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))


def main():
    from data_services_spark.catalog import load_table
    from data_services_spark.plans.widen import widen_if_narrow
    from data_services_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scan_decomp_r14")
    spark.sparkContext.setLogLevel("ERROR")

    def slim(s, d):
        return load_table(s, d, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_partkey", "l_suppkey",
            "l_linenumber")

    stages = {
        "scan_bare": lambda s, d: slim(s, d),
        "scan_widen": lambda s, d: widen_if_narrow(slim(s, d)),
        "scan_repart32": lambda s, d: slim(s, d).repartition(32),
        "scan_repart8": lambda s, d: slim(s, d).repartition(8),
        "scan_full_lineitem": lambda s, d: load_table(s, d, "lineitem"),
    }
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"scan {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:20s} {best:8.4f}", flush=True)
    df = widen_if_narrow(slim(spark, sf_dir))
    print("widen nparts:", df.rdd.getNumPartitions())
    df.explain("formatted")
    spark.stop()


main()

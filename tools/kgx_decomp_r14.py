"""Round-14 decomposition of kgx_edge_merge (guide §1.1): where does the
noop time go? Warm min-of-3 fresh plans per stage prefix."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))

import pyspark.sql.functions as F


def main():
    from data_services_spark.catalog import load_table
    from data_services_spark.plans import kgx_fixture as kgx
    from data_services_spark.registry import RAW_QUERIES
    from data_services_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kgx_decomp_r14")
    spark.sparkContext.setLogLevel("ERROR")
    key = ("subject", "predicate", "object", "primary_knowledge_source")

    def slim(s, d):
        from data_services_spark.plans.widen import widen_if_narrow
        return widen_if_narrow(load_table(s, d, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_partkey", "l_suppkey",
            "l_linenumber"))

    stages = {
        "scan_slim": lambda s, d: slim(s, d),
        "edges_strings": lambda s, d: kgx.kgx_edges(s, d),
        "agg_count_only": lambda s, d: kgx.kgx_edges(s, d)
            .groupBy(*key).agg(F.count(F.lit(1)).alias("n")),
        "agg_lists": lambda s, d: kgx.kgx_edges(s, d).groupBy(*key).agg(
            F.collect_list("publications").alias("p"),
            F.collect_list("aggregator_knowledge_sources").alias("a"),
            F.count(F.lit(1)).alias("n")),
        "agg_lists_sorted": lambda s, d: kgx.kgx_edges(s, d)
            .groupBy(*key).agg(
                F.array_sort(F.array_distinct(
                    F.flatten(F.collect_list("publications")))).alias("p"),
                F.array_sort(F.array_distinct(F.flatten(
                    F.collect_list("aggregator_knowledge_sources"))))
                .alias("a"),
                F.count(F.lit(1)).alias("n")),
        "full_query": lambda s, d: RAW_QUERIES["kgx_edge_merge"](s, d),
    }
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"decomp {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:18s} {best:8.4f}", flush=True)
    spark.stop()


main()

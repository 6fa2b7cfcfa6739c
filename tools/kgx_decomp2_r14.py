"""Round-14 second decomposition of kgx_edge_merge's CURRENT int-proxy
shape (guide §1.1): noop-timed stage prefixes plus the bench's toArrow
action, warm min-of-3 fresh plans."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))

import pyspark.sql.functions as F


def main():
    from data_services_spark.catalog import load_table
    from data_services_spark.plans.widen import widen_by_key
    from data_services_spark.registry import RAW_QUERIES
    from data_services_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kgx_decomp2_r14")
    spark.sparkContext.setLogLevel("ERROR")

    def slim(s, d):
        return widen_by_key(
            load_table(s, d, "lineitem").select(
                "l_orderkey", "l_returnflag", "l_partkey", "l_suppkey",
                "l_linenumber"), "l_orderkey")

    def agg(s, d):
        return (slim(s, d).groupBy(
            F.col("l_orderkey"),
            F.col("l_returnflag").eqNullSafe(F.lit("R")).alias("__ret"),
            F.col("l_partkey"),
            (F.col("l_suppkey") % 3).alias("__pks"))
            .agg(F.collect_set("l_linenumber").alias("__lns"),
                 F.collect_set(F.col("l_suppkey") % 2).alias("__aggs"),
                 F.count(F.lit(1)).alias("n_merged")))

    def agg_count(s, d):
        return (slim(s, d).groupBy(
            F.col("l_orderkey"),
            F.col("l_returnflag").eqNullSafe(F.lit("R")).alias("__ret"),
            F.col("l_partkey"),
            (F.col("l_suppkey") % 3).alias("__pks"))
            .agg(F.count(F.lit(1)).alias("n_merged")))

    stages = {
        "scan_bare": lambda s, d: load_table(s, d, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_partkey", "l_suppkey",
            "l_linenumber"),
        "scan_widen_key": slim,
        "agg_count_only": agg_count,
        "agg_sets": agg,
        "full_noop": lambda s, d: RAW_QUERIES["kgx_edge_merge"](s, d),
    }
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"decomp2 {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:18s} {best:8.4f}", flush=True)
    # the bench action: full materialization to driver Arrow
    spark.sparkContext.setJobDescription("decomp2 full_toArrow")
    RAW_QUERIES["kgx_edge_merge"](spark, sf_dir).toArrow()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        RAW_QUERIES["kgx_edge_merge"](spark, sf_dir).toArrow()
        best = min(best, time.perf_counter() - t0)
    print(f"{'full_toArrow':18s} {best:8.4f}", flush=True)
    spark.stop()


main()

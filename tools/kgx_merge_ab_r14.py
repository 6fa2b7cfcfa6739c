"""Round-14 A/B: kgx_edge_merge aggregate variants (guide §2.3).

Variants:
  A current   : merge_edges (collect_list -> flatten -> distinct -> sort)
  B set       : same shape but collect_set (map-side dedup of list buffers)
  C intproxy  : group by int proxies, collect_set(int), build strings AFTER
                the aggregate (shuffle ints, stringify 60k rows not 600k)
Each timed warm noop min-of-3 with a fresh plan; value parity checked
against A by full sorted-row comparison at the given SF.

Usage: SPARK_GRAFT_SF_DIR=... python tools/kgx_merge_ab_r14.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))

import pyspark.sql.functions as F


def variant_a(spark, sf_dir):
    from data_services_spark.registry import RAW_QUERIES
    return RAW_QUERIES["kgx_edge_merge"](spark, sf_dir)


def variant_b(spark, sf_dir):
    from data_services_spark.plans import kgx_fixture as kgx
    e = kgx.kgx_edges(spark, sf_dir)
    key = ("subject", "predicate", "object", "primary_knowledge_source")

    def ul(c):
        return F.array_sort(F.array_distinct(F.flatten(F.collect_set(c))))

    m = e.groupBy(*key).agg(
        ul("publications").alias("publications"),
        ul("aggregator_knowledge_sources")
        .alias("aggregator_knowledge_sources"),
        F.count(F.lit(1)).alias("n_merged"))
    return (m.withColumn("publications", F.array_join("publications", "|"))
            .withColumn("aggregator_knowledge_sources",
                        F.array_join("aggregator_knowledge_sources", "|")))


def variant_c(spark, sf_dir):
    from data_services_spark.catalog import load_table
    from data_services_spark.plans.widen import widen_if_narrow
    li = widen_if_narrow(load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_partkey", "l_suppkey",
        "l_linenumber"))
    g = (li.groupBy(
            F.col("l_orderkey").alias("__ord"),
            F.col("l_returnflag").eqNullSafe(F.lit("R")).alias("__ret"),
            F.col("l_partkey").alias("__part"),
            (F.col("l_suppkey") % 3).alias("__pks"))
         .agg(F.collect_set("l_linenumber").alias("__lns"),
              F.collect_set(F.col("l_suppkey") % 2).alias("__aggs"),
              F.count(F.lit(1)).alias("n_merged")))
    return g.select(
        F.concat(F.lit("ORD:"), F.col("__ord").cast("string"))
        .alias("subject"),
        F.when(F.col("__ret"), F.lit("biolink:returned"))
        .otherwise(F.lit("biolink:contains")).alias("predicate"),
        F.concat(F.lit("PART:"), F.col("__part").cast("string"))
        .alias("object"),
        F.concat(F.lit("infores:src"), F.col("__pks").cast("string"))
        .alias("primary_knowledge_source"),
        F.array_join(F.array_sort(F.transform(
            "__lns",
            lambda x: F.concat(F.lit("PMID:"), (x * 7).cast("string")))),
            "|").alias("publications"),
        F.array_join(F.array_sort(F.transform(
            "__aggs",
            lambda x: F.concat(F.lit("infores:agg"), x.cast("string")))),
            "|").alias("aggregator_knowledge_sources"),
        F.col("n_merged"))


def main():
    from data_services_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kgx_ab_r14")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"A_current": variant_a, "B_set": variant_b,
                "C_intproxy": variant_c}

    # parity first (collect sorted rows)
    ref = sorted(map(tuple, variant_a(spark, sf_dir).collect()))
    for name, fn in variants.items():
        if name == "A_current":
            continue
        got = sorted(map(tuple, fn(spark, sf_dir).collect()))
        print(f"parity {name}: rows={len(got)} match={got == ref}",
              flush=True)
        assert got == ref, name

    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"ab {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} {best:8.4f}", flush=True)
    spark.stop()


main()

"""Round-14: kgx_edge_merge exchange-sharing variants (guide §2.4/§2.5).

E0 current         : round-robin widen (sorts!) + separate agg exchange
E1 hash_int_widen  : repartition(N, l_orderkey) + string groupBy (2 exch,
                     first unsorted)
E2 hash_subject    : strings built serially, repartition(N, subject),
                     groupBy reuses the exchange (1 exch, strings)
E3 int_shared      : repartition(N, l_orderkey), groupBy int proxies
                     (exchange REUSED - 1 exch of ints), stringify after
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))

import pyspark.sql.functions as F

KEY = ("subject", "predicate", "object", "primary_knowledge_source")


def _slim(s, d):
    from data_services_spark.catalog import load_table
    return load_table(s, d, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_partkey", "l_suppkey",
        "l_linenumber")


def _strings(df):
    return df.select(
        F.concat(F.lit("ORD:"), F.col("l_orderkey").cast("string"))
        .alias("subject"),
        F.when(F.col("l_returnflag") == "R", F.lit("biolink:returned"))
        .otherwise(F.lit("biolink:contains")).alias("predicate"),
        F.concat(F.lit("PART:"), F.col("l_partkey").cast("string"))
        .alias("object"),
        F.concat(F.lit("infores:src"), (F.col("l_suppkey") % 3)
                 .cast("string")).alias("primary_knowledge_source"),
        F.array(F.concat(F.lit("PMID:"), (F.col("l_linenumber") * 7)
                         .cast("string"))).alias("publications"),
        F.array(F.concat(F.lit("infores:agg"), (F.col("l_suppkey") % 2)
                         .cast("string")))
        .alias("aggregator_knowledge_sources"))


def _merge_str(e):
    def ul(c):
        return F.array_sort(F.array_distinct(F.flatten(F.collect_list(c))))
    m = e.groupBy(*KEY).agg(
        ul("publications").alias("publications"),
        ul("aggregator_knowledge_sources")
        .alias("aggregator_knowledge_sources"),
        F.count(F.lit(1)).alias("n_merged"))
    return (m.withColumn("publications", F.array_join("publications", "|"))
            .withColumn("aggregator_knowledge_sources",
                        F.array_join("aggregator_knowledge_sources", "|")))


def e0(s, d):
    from data_services_spark.registry import RAW_QUERIES
    return RAW_QUERIES["kgx_edge_merge"](s, d)


def e1(s, d):
    return _merge_str(_strings(_slim(s, d).repartition(32, "l_orderkey")))


def e2(s, d):
    return _merge_str(_strings(_slim(s, d)).repartition(32, "subject"))


def e3(s, d):
    li = _slim(s, d).repartition(32, "l_orderkey")
    g = (li.groupBy(
            F.col("l_orderkey"),
            F.col("l_returnflag").eqNullSafe(F.lit("R")).alias("__ret"),
            F.col("l_partkey"),
            (F.col("l_suppkey") % 3).alias("__pks"))
         .agg(F.sort_array(F.collect_set("l_linenumber")).alias("__lns"),
              F.sort_array(F.collect_set(F.col("l_suppkey") % 2))
              .alias("__aggs"),
              F.count(F.lit(1)).alias("n_merged")))
    return g.select(
        F.concat(F.lit("ORD:"), F.col("l_orderkey").cast("string"))
        .alias("subject"),
        F.when(F.col("__ret"), F.lit("biolink:returned"))
        .otherwise(F.lit("biolink:contains")).alias("predicate"),
        F.concat(F.lit("PART:"), F.col("l_partkey").cast("string"))
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
    spark = get_spark("kgx_exch_r14")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"E0_current": e0, "E1_hash_int": e1, "E2_hash_subject": e2,
                "E3_int_shared": e3}

    ref = sorted(map(tuple, e0(spark, sf_dir).collect()))
    for name, fn in variants.items():
        if name == "E0_current":
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
        print(f"{name:16s} {best:8.4f}", flush=True)
    # exchange counts
    for name, fn in variants.items():
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        print(name, "exchanges:", txt.count("Exchange ("),
              "objagg:", txt.count("ObjectHashAggregate"))
    spark.stop()


main()

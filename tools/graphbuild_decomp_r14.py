"""Round-14 decomposition of graph_build (guide §1.1)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))


def main():
    from data_services_spark import registry as R
    from data_services_spark.plans.graph_build import build_graph
    from data_services_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("gb_decomp_r14")
    spark.sparkContext.setLogLevel("ERROR")

    def nodes_only(s, d):
        nodes, _ = build_graph(R._graph_build_spec(s, d))
        return nodes

    def spec_union_edges(s, d):
        spec = R._graph_build_spec(s, d)
        import pyspark.sql.functions as F
        e = None
        for src in spec.sources:
            if src.merge_strategy != "default":
                continue
            st = src.edges.withColumn(
                "source_rank", F.lit(src.merge_priority).cast("int"))
            e = st if e is None else e.unionByName(
                st, allowMissingColumns=True)
        return e

    stages = {
        "union_default_edges": spec_union_edges,
        "merged_nodes": nodes_only,
        "full_graph_build": lambda s, d: R.RAW_QUERIES["graph_build"](s, d),
        "graph_build_nodes": lambda s, d:
            R.RAW_QUERIES["graph_build_nodes"](s, d),
    }
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"gb {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:20s} {best:8.4f}", flush=True)
    df = R.RAW_QUERIES["graph_build"](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    print("exchanges:", txt.count("Exchange ("),
          "objagg:", txt.count("ObjectHashAggregate ("),
          "scans:", txt.count("Scan parquet"))
    spark.stop()


main()

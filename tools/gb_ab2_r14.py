"""Round-14 2x2 in-session A/B for the graph_build regression seen in
the whole-registry sweep: (union_lists collect_list vs collect_set) x
(admission ids: distinct pre-merge vs merged relation). Interleaved,
warm noop min-of-3, two rounds per cell."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(4 * 1024 * 1024))

import pyspark.sql.functions as F


def set_ul(use_set: bool):
    from data_services_spark.operators import merge

    def ul_list(col):
        c = F.col(col) if isinstance(col, str) else col
        return F.array_sort(F.array_distinct(F.flatten(F.collect_list(c))))

    def ul_set(col):
        c = F.col(col) if isinstance(col, str) else col
        return F.array_sort(F.array_distinct(F.flatten(F.collect_set(c))))

    merge.union_lists = ul_set if use_set else ul_list


def build(spark, sf_dir, distinct_ids: bool):
    from data_services_spark import registry as R
    from data_services_spark.operators.merge import merge_edges, merge_nodes
    from data_services_spark.operators.subset import connected_edge_subset
    spec = R._graph_build_spec(spark, sf_dir)

    def stamp(df, rank):
        return df.withColumn("source_rank", F.lit(rank).cast("int"))

    nodes_u = edges_u = None
    for s in spec.sources:
        if s.merge_strategy != "default":
            continue
        n, e = stamp(s.nodes, s.merge_priority), stamp(s.edges,
                                                       s.merge_priority)
        nodes_u = n if nodes_u is None else nodes_u.unionByName(
            n, allowMissingColumns=True)
        edges_u = e if edges_u is None else edges_u.unionByName(
            e, allowMissingColumns=True)
    if distinct_ids:
        node_ids = nodes_u.select("id").distinct()
    else:
        node_ids = merge_nodes(nodes_u,
                               scalar_props=spec.node_scalar_props,
                               list_props=spec.node_list_props).select("id")
    for s in spec.sources:
        if s.merge_strategy != "connected_edge_subset":
            continue
        admitted = connected_edge_subset(s.edges, node_ids)
        edges_u = edges_u.unionByName(stamp(admitted, s.merge_priority),
                                      allowMissingColumns=True)
    merged = merge_edges(edges_u)
    return (merged
            .withColumn("publications", F.array_join("publications", "|"))
            .withColumn("aggregator_knowledge_sources",
                        F.array_join("aggregator_knowledge_sources", "|")))


def main():
    from data_services_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("gb_ab2_r14")
    spark.sparkContext.setLogLevel("ERROR")
    cells = [(ul, di) for ul in (False, True) for di in (False, True)]
    # warm every cell once
    for ul, di in cells:
        set_ul(ul)
        build(spark, sf_dir, di).write.format("noop").mode(
            "overwrite").save()
    for rnd in range(2):
        for ul, di in cells:
            set_ul(ul)
            label = f"ul={'set ' if ul else 'list'} ids={'dist' if di else 'merg'}"
            spark.sparkContext.setJobDescription(f"gb2 {label}")
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                build(spark, sf_dir, di).write.format("noop").mode(
                    "overwrite").save()
                best = min(best, time.perf_counter() - t0)
            print(f"r{rnd} {label} {best:8.4f}", flush=True)
    spark.stop()


main()

"""Graph-subset and graph-summary operators.

- J3 ``connected_edge_subset``: the reference merge strategy that admits a
  secondary source's edges only when *both* endpoints already exist in the
  merged node set (`[R: Common/kgx_file_merger.py —
  merge_strategy='connected_edge_subset' — unverified]`). Two left-semi
  joins; Spark plans broadcast semi joins when the node-id set is small.
- A5 ``meta_kg``: (subject category, predicate, object category) triple
  counts for graph metadata (`[R: Common/meta_kg.py — unverified]`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_edge_subset(edges: DataFrame, nodes: DataFrame,
                          node_id_col: str = "id") -> DataFrame:
    """Keep edges whose subject AND object both appear in `nodes`."""
    ids = nodes.select(F.col(node_id_col).alias("__nid")).distinct()
    out = edges.join(ids, edges["subject"] == ids["__nid"], "left_semi")
    return out.join(ids, out["object"] == ids["__nid"], "left_semi")


def meta_kg(edges: DataFrame, nodes: DataFrame,
            category_col: str = "node_category") -> DataFrame:
    """Count edges per (subject_category, predicate, object_category).

    `nodes` must expose one category string per id (explode array categories
    upstream if needed).
    """
    subj = nodes.select(F.col("id").alias("__sid"),
                        F.col(category_col).alias("subject_category"))
    obj = nodes.select(F.col("id").alias("__oid"),
                       F.col(category_col).alias("object_category"))
    return (edges
            .join(F.broadcast(subj), edges["subject"] == subj["__sid"], "inner")
            .join(F.broadcast(obj), edges["object"] == obj["__oid"], "inner")
            .groupBy("subject_category", "predicate", "object_category")
            .agg(F.count(F.lit(1)).alias("n_edges")))

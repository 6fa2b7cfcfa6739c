"""KGX file model: schemas, JSONL read/write, Neo4j bulk-CSV export.

Reference: KGX nodes/edges as one-JSON-object-per-line files (`[R:
Common/kgxmodel.py, Common/kgx_file_writer.py — unverified]`), Neo4j CSV
export with `:ID`/`:LABEL`/`:START_ID`/`:END_ID`/`:TYPE` headers (`[R:
Common/neo4j_tools.py — unverified]`).

Engine policy (SURVEY §1.3): Parquet is the internal interchange format;
JSONL/CSV appear only at this export boundary. The reference's in-memory
seen-id ``set`` dedup-on-write becomes ``dropDuplicates`` — distributed and
spillable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType, IntegerType, MapType, StringType, StructField, StructType,
)

KGX_NODE_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("name", StringType(), True),
    StructField("category", ArrayType(StringType()), True),
    StructField("source_rank", IntegerType(), True),
    StructField("properties", MapType(StringType(), StringType()), True),
])

KGX_EDGE_SCHEMA = StructType([
    StructField("subject", StringType(), False),
    StructField("predicate", StringType(), False),
    StructField("object", StringType(), False),
    StructField("primary_knowledge_source", StringType(), True),
    StructField("aggregator_knowledge_sources", ArrayType(StringType()), True),
    StructField("publications", ArrayType(StringType()), True),
    StructField("source_rank", IntegerType(), True),
])


def read_kgx_nodes(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(KGX_NODE_SCHEMA).json(path)


def read_kgx_edges(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(KGX_EDGE_SCHEMA).json(path)


def write_kgx(nodes: DataFrame, edges: DataFrame, out_dir: str,
              single_file: bool = False) -> None:
    """KGX JSONL sink (K1) with dedup-on-write semantics.

    `single_file=True` coalesces to 1 task — only for the contractual
    single-file export, never upstream of it.
    """
    n = nodes.dropDuplicates(["id"])
    e = edges.dropDuplicates(["subject", "predicate", "object",
                              "primary_knowledge_source"])
    if single_file:
        n, e = n.coalesce(1), e.coalesce(1)
    n.write.mode("overwrite").json(f"{out_dir}/nodes")
    e.write.mode("overwrite").json(f"{out_dir}/edges")


def write_neo4j_csv(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """K2 Neo4j bulk-import CSV sink; the `neo4j-admin import` subprocess
    stays orchestration outside the engine."""
    (nodes.select(
        F.col("id").alias(":ID"),
        F.col("name").alias("name"),
        F.concat_ws(";", F.col("category")).alias(":LABEL"))
     .write.mode("overwrite").option("header", True)
     .csv(f"{out_dir}/nodes_csv"))
    (edges.select(
        F.col("subject").alias(":START_ID"),
        F.col("object").alias(":END_ID"),
        F.col("predicate").alias(":TYPE"),
        F.concat_ws(";", F.col("publications")).alias("publications"))
     .write.mode("overwrite").option("header", True)
     .csv(f"{out_dir}/edges_csv"))

from data_services_spark.sources.readers import (
    read_csv, read_jsonl, read_parquet,
)
from data_services_spark.sources.kgx import (
    KGX_NODE_SCHEMA, KGX_EDGE_SCHEMA,
    read_kgx_nodes, read_kgx_edges, write_kgx, write_neo4j_csv,
)

__all__ = [
    "read_csv", "read_jsonl", "read_parquet",
    "KGX_NODE_SCHEMA", "KGX_EDGE_SCHEMA",
    "read_kgx_nodes", "read_kgx_edges", "write_kgx", "write_neo4j_csv",
]

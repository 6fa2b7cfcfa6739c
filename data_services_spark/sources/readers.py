"""Source readers (SURVEY §2.1 S2/S3/S6/S7).

The reference pulls ~25 biomedical sources as delimited/JSONL/XML/RDF/SQL
dumps and row-iterates them in Python (`[R: parsers/*/src/load*.py —
unverified]`). Here every format routes through Spark's native readers so
scans parallelize, push down predicates, and prune columns. gzip is
transparent. XML/RDF (S4/S5) would ride `spark.read.text` + a parse stage;
they are out of the driver surface and intentionally not built (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, sep: str = "\t",
             header: bool = True, schema: StructType | str | None = None,
             comment: str | None = None) -> DataFrame:
    """Delimited scan (GAF-style comment rows supported via `comment`)."""
    reader = spark.read.option("sep", sep).option("header", header)
    if comment:
        reader = reader.option("comment", comment)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType | str | None = None) -> DataFrame:
    """JSON-Lines scan. Always pass a schema in production — schema
    inference is a full extra pass over 100 TB."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              num_partitions: int = 8, **properties: str) -> DataFrame:
    """RDBMS scan (S6: PHAROS MySQL / DrugCentral Postgres in the
    reference). Partitioned reads when a numeric partition column exists."""
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column:
        bounds = (spark.read.format("jdbc").option("url", url)
                  .option("query",
                          f"SELECT MIN({partition_column}) lo, "
                          f"MAX({partition_column}) hi FROM {table}")
                  .load().head())
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", bounds["lo"])
                  .option("upperBound", bounds["hi"])
                  .option("numPartitions", num_partitions))
    return reader.load()

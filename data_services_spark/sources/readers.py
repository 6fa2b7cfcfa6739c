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


def read_parquet_evolved(spark: SparkSession, path: str,
                         schema: StructType | str | None = None) -> DataFrame:
    """Parquet scan across schema generations — a long-lived ETL landing
    zone accumulates files written before and after a column was added
    (the reference re-parses whole sources on schema change; an engine
    should just read through it). With ``schema=None`` Spark merges all
    file footers (`mergeSchema`): correct, but at 100 TB that is one
    footer read per file at planning time — pass the current superset
    ``schema`` explicitly instead, which skips the merge pass entirely
    and null-fills columns missing from old files."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("mergeSchema", True)
    return reader.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (PushedFilters + ReadSchema reach the scan; asserted in
    tests/test_sources.py). Avro, by contrast, is an external Spark
    module (spark-avro jar) not shipped in this container: route Avro
    through `spark.read.format("avro")` where the jar is deployed."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).orc(path)


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              num_partitions: int = 8, quote: str = '"',
              **properties: str) -> DataFrame:
    """RDBMS scan (S6: PHAROS MySQL / DrugCentral Postgres in the
    reference). Partitioned reads when a numeric partition column exists
    (the bounds probe is one 1-row query; the scan then splits into
    num_partitions range predicates the database serves concurrently).

    ``quote`` is the identifier quote for the bounds probe — ANSI double
    quote by default (Derby/Postgres; MySQL wants a backtick). Spark
    writes lowercase quoted identifiers, so the probe must quote them
    too or case-folding databases won't resolve the column. End-to-end
    tested against embedded Derby (tests/test_sources.py)."""
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column:
        q = quote
        probe = (spark.read.format("jdbc").option("url", url)
                 .option("query",
                         f'SELECT MIN({q}{partition_column}{q}) AS {q}lo{q},'
                         f' MAX({q}{partition_column}{q}) AS {q}hi{q}'
                         f' FROM {table}'))
        for k, v in properties.items():
            probe = probe.option(k, v)
        bounds = probe.load().head()
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", bounds["lo"])
                  .option("upperBound", bounds["hi"])
                  .option("numPartitions", num_partitions))
    return reader.load()

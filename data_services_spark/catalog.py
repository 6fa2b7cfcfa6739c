"""Table catalog: load the driver-generated parquet tables with normalized
schemas.

All ten tables (region nation customer supplier part orders lineitem events
documents embeddings) load via ``spark.read.parquet`` so Catalyst gets full
pushdown/pruning. The single normalization: ``events.ts`` arrives as LongType
nanoseconds (see session._RUNTIME_CONFS) and is converted to a microsecond
TIMESTAMP with integer arithmetic (``DIV 1000`` — never a double round-trip,
which would corrupt epochs beyond 2^53 ns).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from data_services_spark.session import configure_session

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (session_id, sf_dir, name) -> DataFrame. DataFrames are immutable plan
# handles, so reuse is safe; caching skips the per-call file listing and
# parquet footer/schema read (~100ms of driver I/O per load_table call).
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; returns a DataFrame with engine-normalized schema."""
    key = (id(spark._jsparkSession), sf_dir, name)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # lossless ns -> us (data verified to carry no sub-us precision)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    _CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}

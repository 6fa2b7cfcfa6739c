"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``data_services_spark`` package; this module is
the thin registry facade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the KGX node merge (the reference's core operator, SURVEY §2.4
    A1) over the derived multi-source fixture.
    """
    from data_services_spark.registry import QUERIES

    return QUERIES["kgx_node_merge"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_services_spark.registry import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from data_services_spark.registry import oracle_sql as _oracle_sql

    return _oracle_sql()

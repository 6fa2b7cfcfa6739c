"""data_services_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of RENCI-AUTOMAT/Data_services (a biomedical KGX
ETL pipeline), rebuilt Spark-first, plus the LLM-data-pipeline operator surface
(dedup, similarity search, multimodal columns, text analysis).

Design: everything is a DataFrame -> DataFrame transform so Catalyst owns the
physical plan (predicate pushdown, column pruning, AQE, broadcast selection).
Python only crosses the JVM boundary at explicitly-marked Arrow-batched
operators (mapInPandas / pandas_udf).

Reference provenance: /root/reference was empty at survey time; semantics are
reconstructed from the public RENCI-AUTOMAT/Data_services repo (see SURVEY.md
section 0 for the citation convention `[R: path — unverified]`).
"""

from data_services_spark.session import get_spark, configure_session
from data_services_spark.catalog import load_table, load_tables

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "configure_session",
    "load_table",
    "load_tables",
]

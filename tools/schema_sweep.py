"""Flag registry queries whose OUTPUT schema contains non-scalar columns.

The driver's canonicalizer sorts result rows with pandas; array / map /
struct cells raise ``TypeError: unhashable type: 'numpy.ndarray'`` and the
query scores as broken regardless of the Spark result. Every registered
query must therefore emit scalars only (stringify arrays with
``array_join`` — see registry.py kgx_node_merge). This sweep builds each
query's plan at sf0.001 (analysis only, no execution) and prints offenders.

    python tools/schema_sweep.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import types as T  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
NON_SCALAR = (T.ArrayType, T.MapType, T.StructType)


def main() -> int:
    from data_services_spark.registry import QUERIES
    from data_services_spark.session import get_spark

    spark = get_spark("schema-sweep")
    bad = []
    for name, fn in QUERIES.items():
        try:
            schema = fn(spark, SF_DIR).schema
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            bad.append((name, f"BUILD ERROR: {e}"))
            continue
        hazards = [f.name for f in schema.fields
                   if isinstance(f.dataType, NON_SCALAR)]
        if hazards:
            bad.append((name, f"non-scalar cols: {hazards}"))
    for name, msg in bad:
        print(f"{name}: {msg}")
    print(f"\n{len(bad)} hazardous / {len(QUERIES)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

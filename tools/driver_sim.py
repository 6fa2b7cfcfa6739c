"""Simulate the driver harness: a BARE SparkSession (no engine-tuned
build confs — exactly what the driver hands us) running entry() plus
every registry query at sf0.01. Catches any hidden dependency on
get_spark()-only configuration (the ns-parquet flag, UTC tz, Arrow,
UDTF-arrow are all runtime confs applied by configure_session on first
table load — this proves it). Usage:

    python tools/driver_sim.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import SparkSession

    # Deliberately minimal: master + shuffle partitions only, like a
    # harness would. No nanosAsLong, no Arrow, no AQE flags.
    spark = (SparkSession.builder.appName("driver_sim")
             .master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    rows = m.entry(spark).collect()
    assert rows, "entry() returned no rows"
    print(f"entry ok ({len(rows)} rows)")

    queries = m.queries()
    oracle = m.oracle_sql()
    assert set(oracle) <= set(queries)
    names = sys.argv[1:] or sorted(queries)
    failed = []
    for name in names:
        t0 = time.perf_counter()
        try:
            n = queries[name](spark, SF_DIR).count()
            print(f"ok    {name}: {n} rows ({time.perf_counter()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 - report and continue
            failed.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:160]}")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries ran on a "
          "bare session")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()

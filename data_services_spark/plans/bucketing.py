"""Bucketed-table co-location (100 TB posture, SURVEY §4 item 4).

At scale, the dominant cost of fact⋈fact equi-joins and repeated
same-key aggregations is the shuffle. Bucketing pre-partitions data on
disk by a stable key hash: every table written with ``bucketBy(N, k)``
lays out rows so bucket i of one table joins only bucket i of another.
Spark's scan then reports the bucket distribution and Catalyst drops the
Exchange on both sides — the join runs shuffle-free, stage-local.

This is the engine's answer for the KGX merge keys: land normalized
nodes bucketed by ``id`` and edges by ``subject`` once per build, and
every downstream merge / connected-subset / meta-KG pass over them skips
its shuffle. (The hand-rolled equivalent in the reference is re-sorting
JSONL chunks per run `[R: Common/merging.py (DiskGraphMerger) —
unverified]`.)

Caveats encoded here: both sides must have the SAME bucket count (or a
divisor, with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
bucket pruning applies only to equality predicates on the bucket key;
``saveAsTable`` is required — plain ``.parquet(path)`` writes lose the
bucket metadata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   num_buckets: int, sort_cols: Sequence[str] | None = None,
                   path: str | None = None) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table. ``sort_cols`` additionally sorts within buckets, which lets a
    later sort-merge join skip its Sort too."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(num_buckets, keys[0], *keys[1:]))
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def co_located_join(spark: SparkSession, left_table: str, right_table: str,
                    left_key: str, right_key: str,
                    how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the join key: zero Exchange operators
    when bucket specs line up (asserted by tests/test_bucketing.py).

    Forces sort-merge ("merge" hint): for fact⋈fact sizes a broadcast is
    impossible anyway, and the hint keeps the plan shape deterministic in
    tests regardless of the autoBroadcast threshold."""
    left, right = spark.table(left_table), spark.table(right_table)
    return left.hint("merge").join(right, left[left_key] == right[right_key],
                                   how)


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: Sequence[str]) -> None:
    """Hive-style partitioned parquet layout (`path/col=value/...`).

    The scale twin of bucketing: partition columns turn selective
    predicates into directory pruning — a filtered scan lists only the
    matching partitions (PartitionFilters in the plan) instead of reading
    100 TB to discard 99% of it. Partition on low-cardinality, always-
    filtered columns (event date, source id); bucket on high-cardinality
    join keys."""
    (df.write.mode("overwrite").partitionBy(*partition_cols)
     .parquet(path))


def compact(spark: SparkSession, src_dir: str, dest_dir: str,
            target_file_bytes: int = 256 * 1024 * 1024) -> int:
    """Rewrite a parquet directory into ~target-size files; returns the
    output file count.

    The small-files problem is the quiet killer of 100 TB scans: a
    landing zone of 10^6 tiny files costs more in listing + task
    scheduling than in I/O. Output count is computed from actual input
    bytes (driver-side file listing — metadata only, no data read), and
    the rewrite is a single shuffle-free coalesce when shrinking."""
    import os

    # Walk the tree: partitioned/nested layouts keep data files below
    # col=value subdirectories, where a flat scandir would sum 0 bytes and
    # coalesce arbitrarily large input into one file (and one task).
    total = 0
    for root, dirs, files in os.walk(src_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if not f.startswith(("_", ".")))
    n = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.coalesce(n).write.mode("overwrite").parquet(dest_dir)
    return n


def physical_plan(df: DataFrame) -> str:
    """The final physical plan string (AQE-resolved where possible) —
    used by tests to assert shuffle absence."""
    return df._jdf.queryExecution().executedPlan().toString()

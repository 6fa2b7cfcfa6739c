"""Partitioned layout prunes at the directory level (SURVEY §4 posture)."""

from __future__ import annotations

import pytest

from data_services_spark.catalog import load_table
from data_services_spark.plans.bucketing import (
    physical_plan, write_partitioned,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_by_type(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_part") / "events")
    write_partitioned(load_table(spark, SF_DIR, "events"), d,
                      ["event_type"])
    return d


def test_partition_filter_prunes_scan(spark, events_by_type):
    df = spark.read.parquet(events_by_type)
    one = df.filter(df.event_type == "purchase")
    plan = physical_plan(one)
    assert "PartitionFilters" in plan
    assert "purchase" in plan  # the predicate reached the file listing

    want = (load_table(spark, SF_DIR, "events")
            .filter("event_type = 'purchase'").count())
    assert one.count() == want


def test_partition_values_roundtrip(spark, events_by_type):
    df = spark.read.parquet(events_by_type)
    got = {r.event_type for r in df.select("event_type").distinct().collect()}
    want = {r.event_type for r in load_table(spark, SF_DIR, "events")
            .select("event_type").distinct().collect()}
    assert got == want


def test_compact_rewrites_to_computed_file_count(spark, tmp_path):
    from data_services_spark.plans.bucketing import compact

    src = str(tmp_path / "many")
    load_table(spark, SF_DIR, "events").repartition(16).write.parquet(src)
    import os
    n_in = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_in == 16

    dest = str(tmp_path / "compacted")
    n = compact(spark, src, dest)
    n_out = sum(1 for f in os.listdir(dest) if f.endswith(".parquet"))
    assert n == 1 and n_out == 1  # tiny input -> one target-size file
    assert spark.read.parquet(dest).count() == \
        load_table(spark, SF_DIR, "events").count()

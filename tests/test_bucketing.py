"""Bucketed co-located joins eliminate the shuffle (SURVEY §4 item 4)."""

from __future__ import annotations

import pytest

from data_services_spark.catalog import load_table
from data_services_spark.plans.bucketing import (
    co_located_join, physical_plan, write_bucketed,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(o, "orders_b", ["o_orderkey"], 4,
                   sort_cols=["o_orderkey"], path=str(d / "orders"))
    write_bucketed(l, "lineitem_b", ["l_orderkey"], 4,
                   sort_cols=["l_orderkey"], path=str(d / "lineitem"))
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = co_located_join(spark, left, right,
                             "o_orderkey", "l_orderkey")
    plan = physical_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan

    n = joined.count()
    want = (load_table(spark, SF_DIR, "orders")
            .join(load_table(spark, SF_DIR, "lineitem"),
                  load_table(spark, SF_DIR, "orders").o_orderkey
                  == load_table(spark, SF_DIR, "lineitem").l_orderkey)
            .count())
    assert n == want


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    _, right = bucketed_tables
    agg = spark.table(right).groupBy("l_orderkey").count()
    plan = physical_plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == load_table(spark, SF_DIR, "lineitem") \
        .select("l_orderkey").distinct().count()


def test_compact_sizes_partitioned_source(spark, tmp_path):
    """compact() must sum data-file bytes recursively: a Hive-partitioned
    source keeps files under col=value subdirs where a flat scandir sees
    0 bytes and would collapse everything into one file/task."""
    from data_services_spark.plans.bucketing import compact, write_partitioned

    src = tmp_path / "src"
    o = load_table(spark, SF_DIR, "orders")
    write_partitioned(o, str(src), ["o_orderstatus"])
    n = compact(spark, str(src), str(tmp_path / "out"),
                target_file_bytes=16 * 1024)
    assert n > 1  # nonzero recursive size -> multiple target files
    got = spark.read.parquet(str(tmp_path / "out")).count()
    assert got == o.count()

"""Driver-shaped correctness gate at sf0.001: every registry query vs its
DuckDB oracle (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from data_services_spark.registry import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_same_result


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    assert_same_result(sdf, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns

"""Z-order clustering + min/max row-group skipping (operators/layout.py).

The claim under test is the 100 TB one: a Z-ordered layout lets a
range predicate on ANY interleaved dimension prove most row groups
irrelevant from footer statistics alone, where a single-key sort skips
only on its own key — while returning byte-identical query results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_services_spark.operators.layout import (
    linear_write, rowgroup_skipping_stats, zorder_key, zorder_write,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_zorder_key_is_deterministic_and_bounded(spark, lineitem):
    df = lineitem.select("l_orderkey", "l_partkey")
    a = zorder_key(df, ["l_orderkey", "l_partkey"], bits=8)
    mx = a.agg(F.max("zkey"), F.min("zkey")).first()
    assert 0 <= mx[1] and mx[0] < (1 << 16)
    b = zorder_key(df, ["l_orderkey", "l_partkey"], bits=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_zorder_key_rejects_overflow_and_empty():
    import pandas as pd  # noqa: F401  (documents the pure-plan nature)
    from data_services_spark.session import get_spark
    spark = get_spark("tests")
    df = spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"),
        (F.col("id") * 3).alias("c"))
    with pytest.raises(ValueError, match="does not fit"):
        zorder_key(df, ["a", "b", "c"], bits=22)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [], bits=8)


def test_zorder_write_preserves_rows(spark, lineitem, tmp_path):
    path = str(tmp_path / "z")
    zorder_write(lineitem, path, ["l_orderkey", "l_partkey"],
                 bits=16, num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == lineitem.count()
    assert sorted(back.columns) == sorted(lineitem.columns)
    # multiset equality on the primary key + a payload column
    key = ["l_orderkey", "l_linenumber", "l_quantity"]
    assert back.select(key).exceptAll(lineitem.select(key)).count() == 0
    assert lineitem.select(key).exceptAll(back.select(key)).count() == 0


def test_zorder_skips_on_secondary_dimension(spark, lineitem, tmp_path):
    zp, lp = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_write(lineitem, zp, ["l_orderkey", "l_partkey"],
                 bits=16, num_files=8)
    linear_write(lineitem, lp, "l_orderkey", num_files=8)

    rng = lineitem.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    lo, hi = rng[0], rng[0] + (rng[1] - rng[0]) // 20
    pred = {"l_partkey": (lo, hi)}

    z = rowgroup_skipping_stats(zp, pred)
    lin = rowgroup_skipping_stats(lp, pred)
    # the linear layout sorts on l_orderkey only: l_partkey min/max
    # spans every file, nothing can be proven skippable
    assert lin["skipped_row_groups"] == 0
    # the z-ordered layout proves a large share of row groups
    # irrelevant (range-exchange boundary sampling jitters the exact
    # count; 0.4 of 8+ groups is already decisive vs linear's 0)
    assert z["skip_fraction"] >= 0.4
    assert z["row_groups"] >= 8

    # and the skipping is an optimization, not a semantics change
    za = (spark.read.parquet(zp)
          .filter(F.col("l_partkey").between(lo, hi)).count())
    la = (spark.read.parquet(lp)
          .filter(F.col("l_partkey").between(lo, hi)).count())
    want = lineitem.filter(F.col("l_partkey").between(lo, hi)).count()
    assert za == la == want


def test_zorder_skips_on_primary_dimension_too(spark, lineitem, tmp_path):
    """Z-order trades a little single-key locality for locality in all
    dimensions — a primary-dimension predicate must still skip."""
    zp = str(tmp_path / "z")
    zorder_write(lineitem, zp, ["l_orderkey", "l_partkey"],
                 bits=16, num_files=8)
    rng = lineitem.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    lo, hi = rng[0], rng[0] + (rng[1] - rng[0]) // 20
    z = rowgroup_skipping_stats(zp, {"l_orderkey": (lo, hi)})
    assert z["skip_fraction"] >= 0.3


def test_zorder_constant_column_degenerates(spark):
    from data_services_spark.session import get_spark
    spark = get_spark("tests")
    df = spark.range(100).select(
        F.col("id").alias("a"), F.lit(7).alias("b"))
    out = zorder_key(df, ["a", "b"], bits=8)
    # constant column contributes zero bits; key is injective in `a`
    assert out.select("zkey").distinct().count() == 100


def test_zorder_exact_on_full_int64_range(spark):
    """Snowflake-scale / hash-derived id ranges (> 2^47) used to
    overflow the int64 normalization multiply — ANSI runtime error, or
    silently wrapped zkeys with ANSI off (round-6 advisor). The decimal
    widening keeps the key exact over the whole int64 domain and
    bit-identical to the int64 formula where that one was valid."""
    big = 1 << 62
    df = spark.createDataFrame(
        [(-big, 0), (-1, 3), (0, 5), (big, 10)], "a long, b long")
    got = {r.a: r.zkey for r in zorder_key(df, ["a", "b"], bits=16)
           .collect()}
    top = (1 << 16) - 1

    def norm(v, mn, mx):
        return ((v - mn) * top) // (mx - mn)

    def inter(z1, z2):
        r = 0
        for p in range(16):
            r |= (((z1 >> p) & 1) << (p * 2)) | (((z2 >> p) & 1)
                                                 << (p * 2 + 1))
        return r

    rows = {-big: 0, -1: 3, 0: 5, big: 10}
    for a, b in rows.items():
        assert got[a] == inter(norm(a, -big, big), norm(b, 0, 10))

"""Narrow-scan widening guard (plans/widen.py, round 12 — the r11
verdict's What's-wrong #1): the serial-chain queries repartition to
cores exactly when (splits < cores) AND (input >= threshold), and the
small-sf pinned 0-exchange plans stay untouched."""

from __future__ import annotations

import os


SF_DIR = "/root/testdata/sf0.01"


def _n_parts(df) -> int:
    return df.rdd.getNumPartitions()


def test_widen_noop_below_threshold(spark):
    """sf0.01 documents (65 KB) sits under the 2 MB default: the scan
    keeps its single split and the plan gains no exchange — the
    pinned map-only shapes hold."""
    from data_services_spark.plans.widen import widen_if_narrow

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    out = widen_if_narrow(d)
    assert out is d  # unchanged handle: no Repartition node at all


def test_widen_repartitions_large_narrow_scan(spark):
    """Past the threshold a 1-split scan widens to defaultParallelism
    via ONE round-robin exchange; results are identical row-for-row
    (repartition changes partitioning, never values)."""
    from data_services_spark.operators.bpe import bpe_tokenize
    from data_services_spark.plans.widen import widen_if_narrow

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    cores = spark.sparkContext.defaultParallelism
    wide = widen_if_narrow(d, min_bytes=1)  # force: any size qualifies
    assert _n_parts(wide) == cores
    plan = wide._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" in plan

    base = sorted(tuple(r) for r in bpe_tokenize(d).collect())
    widened = sorted(tuple(r) for r in bpe_tokenize(wide).collect())
    assert widened == base


def test_widen_noop_when_already_wide(spark):
    """splits >= cores: no shuffle is ever added, whatever the size."""
    from data_services_spark.plans.widen import widen_if_narrow

    d = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
    assert widen_if_narrow(d, min_bytes=1) is d


def test_widened_tokenizers_stay_value_exact(spark):
    """End to end at a forced-low threshold: bpe_tokenize and
    bpe_tokenize_dict both gain the exchange and still produce the
    exact same rows as their unwidened forms (the sf1 correctness
    contract for the widen fix)."""
    from data_services_spark.operators.bpe import (
        bpe_tokenize, bpe_tokenize_dict,
    )

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    os.environ["SPARK_GRAFT_WIDEN_MIN_BYTES"] = "1"
    try:
        chain = bpe_tokenize(d)
        kern = bpe_tokenize_dict(d)
        assert _n_parts(chain) == spark.sparkContext.defaultParallelism
        assert _n_parts(kern) == spark.sparkContext.defaultParallelism
        rows_c = sorted(tuple(r) for r in chain.collect())
        rows_k = sorted(tuple(r) for r in kern.collect())
    finally:
        del os.environ["SPARK_GRAFT_WIDEN_MIN_BYTES"]
    base = sorted(tuple(r) for r in bpe_tokenize(d).collect())
    assert rows_c == base
    assert rows_k == base


def test_rebalance_if_small_gate(spark):
    """rebalance_if_small: repartitions to cores when the SOURCE scan
    is under the gate, is a no-op above it (a real-scale plan must
    never pay the extra shuffle), and never changes values."""
    import pyspark.sql.functions as F

    from data_services_spark.plans.widen import rebalance_if_small

    src = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    grouped = src.groupBy((F.col("doc_id") % 7).alias("g")) \
        .agg(F.count(F.lit(1)).alias("n"))

    on = rebalance_if_small(grouped, src)  # 65 KB source: gate ON
    assert "Repartition" in on._jdf.queryExecution().optimizedPlan() \
        .toString()
    off = rebalance_if_small(grouped, src, max_bytes=1)  # gate OFF
    assert off is grouped

    rows_on = sorted(tuple(r) for r in on.collect())
    rows_off = sorted(tuple(r) for r in grouped.collect())
    assert rows_on == rows_off


def test_scan_partition_memo_matches_direct_probe(spark):
    """Round 13: the file-backed partition-count memo returns exactly
    what the direct .rdd probe reports — for different projections of
    the same files (the count is projection-independent) — and keys on
    the split confs, so a conf change re-probes instead of returning a
    stale count."""
    from data_services_spark.plans.widen import (
        _NPARTS_MEMO, _scan_partitions)

    path = os.path.join(SF_DIR, "lineitem.parquet")
    a = spark.read.parquet(path).select("l_orderkey")
    b = spark.read.parquet(path).select("l_orderkey", "l_partkey",
                                        "l_shipdate")
    direct = a.rdd.getNumPartitions()
    assert _scan_partitions(a) == direct
    assert _scan_partitions(b) == direct  # memo hit, same files

    # non-file plans bypass the memo entirely (direct probe)
    mem = spark.createDataFrame([(1,), (2,)], "x int")
    assert _scan_partitions(mem) == mem.rdd.getNumPartitions()

    # a split-conf change must invalidate: force a tiny split size and
    # check the memo re-probes (more partitions for the same file)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       str(256 * 1024))
        c = spark.read.parquet(path).select("l_orderkey")
        assert _scan_partitions(c) == c.rdd.getNumPartitions()
        assert _scan_partitions(c) > direct
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    _NPARTS_MEMO.clear()


def test_stream_chain_widen_gates(spark, tmp_path):
    """Round 13: the streaming chain-widen gate. None for a missing
    dir (unknown size -> leave the stream alone), None under the chain
    byte gate, cores for a large narrow dir, and None once the dir's
    estimated splits reach the core count."""
    from data_services_spark.plans.widen import (
        chain_min_bytes, stream_chain_widen)

    assert stream_chain_widen(spark, str(tmp_path / "missing")) is None

    small = tmp_path / "small"
    small.mkdir()
    (small / "f.parquet").write_bytes(b"x" * 1024)
    assert stream_chain_widen(spark, str(small)) is None  # under gate

    big = tmp_path / "big"
    big.mkdir()
    (big / "f.parquet").write_bytes(b"x" * (chain_min_bytes() + 1))
    cores = spark.sparkContext.defaultParallelism
    assert stream_chain_widen(spark, str(big)) == cores

    # many files -> estimated splits >= cores -> no widen
    wide = tmp_path / "wide"
    wide.mkdir()
    per = max(1, (chain_min_bytes() // cores) + 1)
    for i in range(cores):
        (wide / f"f{i}.parquet").write_bytes(b"x" * per)
    assert stream_chain_widen(spark, str(wide)) is None

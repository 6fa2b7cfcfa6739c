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


def test_widen_by_key_gates_and_exchange_reuse(spark):
    """widen_by_key (round 14): gates exactly like widen_if_narrow
    (unchanged handle under the byte floor and when already wide), and
    when it fires the exchange is HASH partitioning on the key — no
    sort-before-repartition — which a groupBy on a key superset reuses
    (exactly ONE exchange in the whole aggregate plan)."""
    import pyspark.sql.functions as F

    from data_services_spark.plans.widen import widen_by_key

    d = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")) \
        .select("l_orderkey", "l_partkey")
    # below the byte floor: unchanged handle, no Repartition node
    assert widen_by_key(d, "l_orderkey",
                        min_bytes=10 * 1024 * 1024 * 1024) is d
    # already wide: unchanged handle whatever the size
    wide_in = spark.range(0, 1000, 1,
                          spark.sparkContext.defaultParallelism)
    assert widen_by_key(wide_in, "id", min_bytes=1) is wide_in

    cores = spark.sparkContext.defaultParallelism
    w = widen_by_key(d, "l_orderkey", min_bytes=1)  # force the widen
    assert _n_parts(w) == cores
    plan = w._jdf.queryExecution().toString()
    assert "hashpartitioning(l_orderkey" in plan
    # a groupBy on a SUPERSET of the widen key reuses the exchange
    agg = w.groupBy("l_orderkey", "l_partkey").agg(F.count("*").alias("n"))
    phys = agg._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") == 1
    # values identical to the unwidened groupBy
    base = sorted(tuple(r) for r in
                  d.groupBy("l_orderkey", "l_partkey")
                  .agg(F.count("*").alias("n")).collect())
    assert sorted(tuple(r) for r in agg.collect()) == base


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

    # round 14 (r13 ADVICE): a DERIVED plan over the same files — same
    # inputFiles(), partition count set by its shuffle, not the scan —
    # must take the direct probe and must NOT poison the bare-scan memo
    cores = spark.sparkContext.defaultParallelism
    derived = spark.read.parquet(path).select("l_orderkey") \
        .repartition(cores)
    assert _scan_partitions(derived) == cores
    assert _scan_partitions(a) == direct  # memo unpoisoned

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


def test_chain_min_bytes_env_precedence(monkeypatch):
    """Round 14 (r13 ADVICE): the generic $SPARK_GRAFT_WIDEN_MIN_BYTES
    applies to chain sites in BOTH directions when the chain-specific
    env is unset (raising it to suppress widening globally now works);
    the chain env, when set, wins outright."""
    from data_services_spark.plans.widen import (
        CHAIN_MIN_BYTES, chain_min_bytes)

    monkeypatch.delenv("SPARK_GRAFT_WIDEN_MIN_BYTES", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_CHAIN_WIDEN_MIN_BYTES", raising=False)
    assert chain_min_bytes() == CHAIN_MIN_BYTES
    monkeypatch.setenv("SPARK_GRAFT_WIDEN_MIN_BYTES", "1")
    assert chain_min_bytes() == 1          # lower: force-on still works
    monkeypatch.setenv("SPARK_GRAFT_WIDEN_MIN_BYTES",
                       str(10 * CHAIN_MIN_BYTES))
    assert chain_min_bytes() == 10 * CHAIN_MIN_BYTES  # raise: suppresses
    monkeypatch.setenv("SPARK_GRAFT_CHAIN_WIDEN_MIN_BYTES", "7")
    assert chain_min_bytes() == 7          # chain-specific wins outright


def test_dir_data_file_sizes_recursive(tmp_path):
    """Round 14 (r13 ADVICE): nested partition subdirs are walked (the
    flat listdir counted them as ~4 KB inodes), metadata entries are
    skipped at every level, and a missing dir reports None."""
    from data_services_spark.plans.widen import dir_data_file_sizes

    d = tmp_path / "landing"
    (d / "p=1").mkdir(parents=True)
    (d / "p=1" / "part-0.parquet").write_bytes(b"x" * 1000)
    (d / "top.parquet").write_bytes(b"y" * 50)
    (d / "_spark_metadata").mkdir()
    (d / "_spark_metadata" / "0").write_bytes(b"z" * 9999)
    (d / "_SUCCESS").write_bytes(b"")
    (d / "p=1" / ".part-0.parquet.crc").write_bytes(b"c" * 11)
    assert sorted(dir_data_file_sizes(str(d))) == [50, 1000]
    assert dir_data_file_sizes(str(tmp_path / "nope")) is None


def test_release_all_slots_frees_previous_queries_cache(spark):
    """Round 14 (r13 ADVICE): building any fresh query releases every
    one-slot persist left by PREVIOUS queries — the corpus text no
    longer stays pinned for the rest of the session."""
    from data_services_spark.functions.cache import (
        persist_slot, release_all_slots)

    slot_a: list = []
    slot_b: list = []
    df_a = persist_slot(slot_a, spark.range(10))
    assert df_a.storageLevel.useMemory and slot_a
    persist_slot(slot_b, spark.range(20))
    release_all_slots()
    assert not slot_a and not slot_b
    assert not df_a.storageLevel.useMemory


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

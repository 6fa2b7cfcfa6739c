"""Round-7 state-layer behaviors: pin/vacuum serialization, torn-archive
tolerance, prefix bucket_cols + pruned reads, and the streaming near-dup
probe's bucket pruning / max-df cap / aged-out-replay guard."""

import json
import os
import threading
import time

import pytest
import pyspark.sql.functions as F

import data_services_spark.streaming.ingest as ing
from data_services_spark.streaming.ingest import (
    merge_upsert_batch, pin_snapshot, read_merged_state, vacuum_state,
)

NODE = ("id string, name string, category array<string>, "
        "source_rank int")


def _commit(spark, state_dir, batch_id, node_id="n0"):
    batch = spark.createDataFrame(
        [(node_id, f"name{batch_id}", ["c"], 1)], NODE)
    merge_upsert_batch(spark, batch, state_dir, batch_id)


def test_pin_vacuum_race_serialized(spark, tmp_path, monkeypatch):
    """A pin racing a vacuum sweep must never 'succeed' against
    directories the sweep then deletes (round-6 advisor): pin
    write+verify and vacuum scan+delete each hold the state dir's
    mutex, so the pin either lands before the scan (retained) or fails
    cleanly after the sweep — a torn read is impossible."""
    state_dir = str(tmp_path / "state")
    # same key every batch -> the same bucket rewrites, so old
    # generations become fully unreferenced (vacuumable)
    for b in range(3):
        _commit(spark, state_dir, b)

    real_rmtree = ing.shutil.rmtree
    in_sweep = threading.Event()

    def slow_rmtree(path, *a, **k):
        in_sweep.set()
        time.sleep(0.8)  # hold the sweep open while the pin races in
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(ing.shutil, "rmtree", slow_rmtree)
    vac_err = []

    def run_vacuum():
        try:
            vacuum_state(state_dir, keep_last=1)
        except Exception as e:  # surfaced after join
            vac_err.append(e)

    vac = threading.Thread(target=run_vacuum)
    vac.start()
    assert in_sweep.wait(timeout=30), "vacuum never reached its sweep"
    # the sweep is mid-delete and holds the mutex: this pin blocks, then
    # verifies AFTER the deletions and must fail cleanly
    try:
        pin = pin_snapshot(state_dir, generation=0)
    except FileNotFoundError:
        pin = None
    vac.join(timeout=60)
    assert not vac_err, vac_err
    if pin is not None:
        # only acceptable if every referenced directory actually survived
        m = ing._pinned_manifest(state_dir, pin["gen"])
        assert all(os.path.isdir(p)
                   for p in ing._bucket_paths(state_dir, m)), \
            "pin succeeded over vacuumed data — torn read"
    else:
        # the half-pin must have been removed
        pins = [f for f in os.listdir(os.path.join(state_dir, "_pins"))
                if f.endswith(".json")]
        assert pins == []
    # current state stays readable either way
    assert read_merged_state(spark, state_dir).count() == 1


def test_vacuum_tolerates_torn_archive(spark, tmp_path):
    """A torn (truncated) archived manifest — pre-round-7 crash damage —
    must not wedge vacuum or retention: it is skipped without consuming
    a keep_last slot and aged out like any stale history."""
    state_dir = str(tmp_path / "state")
    for b in range(4):
        _commit(spark, state_dir, b)
    hist = os.path.join(state_dir, ing._MANIFESTS)
    torn = os.path.join(hist, "1.json")
    with open(torn, "w") as fh:
        fh.write('{"gen": 1, "batch_water')  # truncated mid-write
    deleted = vacuum_state(state_dir, keep_last=2)
    assert deleted, "old generations should have been swept"
    assert not os.path.exists(torn), "torn archive should be aged out"
    # the newest 2 LOADABLE manifests (gens 3 and 2) are retained
    kept = sorted(f for f in os.listdir(hist) if f.endswith(".json"))
    assert kept == ["2.json", "3.json"]
    assert read_merged_state(spark, state_dir).count() == 1
    read_merged_state(spark, state_dir, generation=2)  # time travel ok


def test_commit_archives_atomically(spark, tmp_path):
    """Every archived manifest is a complete JSON document (written via
    tmp + rename) and carries the layout/lineage fields."""
    state_dir = str(tmp_path / "state")
    for b in range(2):
        _commit(spark, state_dir, b)
    hist = os.path.join(state_dir, ing._MANIFESTS)
    for f in os.listdir(hist):
        assert f.endswith(".json"), f"stray tmp file {f} in archive"
        with open(os.path.join(hist, f)) as fh:
            m = json.load(fh)
        assert m["bucket_cols"] == ["id"]
        assert m["num_buckets"] == 16
        assert m["first_batch"] == 0


def test_bucket_cols_prefix_layout_and_pruned_read(spark, tmp_path):
    """A state bucketed by a key PREFIX supports pruned reads: reading
    only a key's hash buckets returns exactly the full read filtered to
    those buckets, and the recorded layout is enforced on later batches."""
    state_dir = str(tmp_path / "state")
    schema = "k1 long, k2 long, v string, source_rank int"
    nb = 8
    rows0 = [(i % 5, i, f"a{i}", 1) for i in range(40)]
    rows1 = [(i % 5, i + 100, f"b{i}", 1) for i in range(40)]
    for bid, rows in enumerate([rows0, rows1]):
        merge_upsert_batch(
            spark, spark.createDataFrame(rows, schema), state_dir, bid,
            scalar_props=("v",), list_props=(), key_cols=("k1", "k2"),
            bucket_cols=("k1",), num_buckets=nb)

    m = ing._read_manifest(state_dir)
    assert m["bucket_cols"] == ["k1"] and m["num_buckets"] == nb

    # which bucket does k1=3 hash to? (computed with the writer's hash)
    probe = (spark.range(1)
             .select(F.pmod(F.xxhash64(F.lit(3).cast("long")), F.lit(nb))
                     .cast("int").alias("b")).collect()[0].b)
    pruned = read_merged_state(spark, state_dir, buckets=[probe])
    full = read_merged_state(spark, state_dir)
    got = {(r.k1, r.k2, r.v) for r in pruned.filter("k1 = 3").collect()}
    want = {(r.k1, r.k2, r.v) for r in full.filter("k1 = 3").collect()}
    assert got == want and len(want) == 16  # 8 per batch for k1=3
    # pruned read touches a strict subset of the state's files
    assert pruned.count() <= full.count()

    # layout is enforced: changing bucket_cols or num_buckets raises
    nxt = spark.createDataFrame([(1, 999, "c", 1)], schema)
    with pytest.raises(RuntimeError, match="bucketed by"):
        merge_upsert_batch(spark, nxt, state_dir, 2, scalar_props=("v",),
                           list_props=(), key_cols=("k1", "k2"),
                           bucket_cols=("k1", "k2"), num_buckets=nb)
    with pytest.raises(RuntimeError, match="num_buckets"):
        merge_upsert_batch(spark, nxt, state_dir, 2, scalar_props=("v",),
                           list_props=(), key_cols=("k1", "k2"),
                           bucket_cols=("k1",), num_buckets=nb * 2)
    # bucket_cols outside the key would split keys across buckets
    with pytest.raises(ValueError, match="subset of key_cols"):
        merge_upsert_batch(spark, nxt, state_dir, 2, scalar_props=("v",),
                           list_props=(), key_cols=("k1", "k2"),
                           bucket_cols=("v",), num_buckets=nb)


def _neardup_decisions(spark, state_dir, batches, **kw):
    from data_services_spark.streaming.neardup import (
        dedup_batch_against_state, read_decisions,
    )
    DOCS = "doc_id long, text string"
    for bid, rows in enumerate(batches):
        dedup_batch_against_state(
            spark, spark.createDataFrame(rows, DOCS), state_dir, bid,
            **kw)
    return {r.doc_id: (r.status, r.duplicate_of, r.batch_id)
            for r in read_decisions(spark, state_dir).collect()}


T_A = "the quick brown fox jumps over the lazy dog again and again"
T_B = "completely different words about streaming state machinery"
T_C = "a third unique document concerning winnowing and minhash"
BATCHES = [
    [(1, T_A), (2, T_A), (3, T_B)],
    [(4, T_A), (5, T_C)],
    [(6, T_C), (7, T_B)],
]


def test_neardup_pruned_probe_decision_parity(spark, tmp_path):
    """Bucket-pruning the corpus-state probe changes I/O, never
    decisions: the pruned and full-read runs classify identically, and
    the band state is bucketed by the probe-able (band, bh) prefix."""
    pruned = _neardup_decisions(spark, str(tmp_path / "s1"), BATCHES,
                                num_buckets=16, prune_state_read=True)
    full = _neardup_decisions(spark, str(tmp_path / "s2"), BATCHES,
                              num_buckets=16, prune_state_read=False)
    assert pruned == full
    assert pruned[4] == ("dup_of_corpus", 1, 1)
    m = ing._read_manifest(str(tmp_path / "s1"))
    assert m["bucket_cols"] == ["band", "bh"]


def test_neardup_max_bucket_df_cap(spark, tmp_path):
    """The in-batch pair-join cap: untouched decisions on a diverse
    batch; on an adversarial all-identical batch the capped run
    proposes no in-batch pairs (documented degradation — every doc
    survives to the corpus probe) instead of an O(n^2) bucket blow-up."""
    capped = _neardup_decisions(spark, str(tmp_path / "s1"), BATCHES,
                                max_bucket_df=8)
    plain = _neardup_decisions(spark, str(tmp_path / "s2"), BATCHES)
    assert capped == plain

    adv = [[(i, T_A) for i in range(1, 7)]]  # 6 identical docs, one batch
    with_cap = _neardup_decisions(spark, str(tmp_path / "s3"), adv,
                                  max_bucket_df=1)
    no_cap = _neardup_decisions(spark, str(tmp_path / "s4"), adv)
    assert all(s == "kept" for s, _, _ in with_cap.values()), \
        "cap drops hot buckets from proposal: no in-batch pairs"
    assert sum(s == "kept" for s, _, _ in no_cap.values()) == 1
    # ...and cross-BATCH dedup still works under the cap: batch 1's
    # copy of the text is a corpus duplicate of a batch-0 survivor
    from data_services_spark.streaming.neardup import (
        dedup_batch_against_state, read_decisions,
    )
    b1 = spark.createDataFrame([(100, T_A)], "doc_id long, text string")
    dedup_batch_against_state(spark, b1, str(tmp_path / "s3"), 1,
                              max_bucket_df=1)
    d = {r.doc_id: r.status
         for r in read_decisions(spark, str(tmp_path / "s3"))
         .filter("batch_id = 1").collect()}
    assert d == {100: "dup_of_corpus"}


def test_neardup_replay_aged_out_raises(spark, tmp_path):
    """An at-least-once replay whose pre-batch snapshot aged out of
    retention must FAIL, not silently rewrite the original verdicts as
    'kept' (round-6 advisor); replaying the state's first batch stays
    legitimate (pre-batch corpus empty by definition)."""
    from data_services_spark.streaming.neardup import (
        dedup_batch_against_state,
    )
    DOCS = "doc_id long, text string"
    state_dir = str(tmp_path / "state")
    b0 = spark.createDataFrame([(1, T_A)], DOCS)
    b1 = spark.createDataFrame([(2, T_A)], DOCS)  # corpus dup of 1
    dedup_batch_against_state(spark, b0, state_dir, 0)
    dedup_batch_against_state(spark, b1, state_dir, 1)
    vacuum_state(state_dir, keep_last=1)  # ages out batch 1's snapshot
    with pytest.raises(RuntimeError, match="aged out"):
        dedup_batch_against_state(spark, b1, state_dir, 1)


def test_probe_bucket_list_saturates_to_full_read(spark, tmp_path):
    """When a batch's band keys touch every bucket, _probe_buckets
    returns None (the full-read path) instead of an all-buckets list —
    measured round 8: a saturated list is pure bookkeeping overhead
    over an identical read. A small-key batch still returns a real
    subset."""
    import pyspark.sql.functions as F

    from data_services_spark.streaming import neardup

    manifest = {"bucket_cols": list(neardup.BUCKET_COLS), "num_buckets": 8}
    wide = spark.range(4000).select(
        (F.col("id") % 4).cast("int").alias("band"),
        F.xxhash64("id").alias("bh"))
    assert neardup._probe_buckets(wide, manifest) is None
    narrow = spark.range(2).select(
        F.lit(0).cast("int").alias("band"), F.xxhash64("id").alias("bh"))
    got = neardup._probe_buckets(narrow, manifest)
    assert got is not None and 0 < len(got) <= 2

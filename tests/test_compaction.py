"""Small-file compaction of the incremental-merge state (the
OPTIMIZE/bin-packing half of the transactional-table contract).

Invariants driven here:
- compaction is invisible to every reader: byte-identical visible
  records, empty change-data-feed across the compaction generation;
- it is invisible to the WRITER protocol too: the batch watermark is
  untouched, so streaming retry/sync guards behave exactly as if the
  compaction never happened (retry no-op, stale-batch error, next batch
  merges normally and equals a from-scratch merge);
- it actually compacts: file counts drop to the bin-packed target;
- it composes with time travel, snapshot pins, and vacuum retention.
"""

from __future__ import annotations

import json
import os

import pytest

from data_services_spark.streaming.ingest import (
    bucket_file_stats, compact_state, merge_upsert_batch,
    read_merged_state, state_changes, vacuum_state,
)

NODES = "id string, name string, category array<string>, source_rank int"


def _batch(spark, rows):
    return spark.createDataFrame(rows, NODES)


def _visible(df):
    return (tuple(sorted(df.columns)),
            sorted(tuple(tuple(sorted(v)) if isinstance(v, list) else v
                         for v in row)
                   for row in df.select(*sorted(df.columns)).collect()))


def _fragmented_state(spark, state, n_batches=4, num_buckets=4):
    """Build a state whose buckets span multiple files per directory —
    the shape a real multi-task merge shuffle produces (AQE coalescing
    hides it at toy scale, so pin it off while writing the fixture)."""
    coalesce_conf = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_conf, "true")
    spark.conf.set(coalesce_conf, "false")
    try:
        for i in range(n_batches):
            rows = [(f"X:{j}", f"n{i}-{j}", [f"c{i}"], i + 1)
                    for j in range(32)]
            merge_upsert_batch(spark, _batch(spark, rows), str(state),
                               batch_id=i, num_buckets=num_buckets)
    finally:
        spark.conf.set(coalesce_conf, prev)
    return state


def test_compact_preserves_visible_state_and_shrinks_files(spark, tmp_path):
    state = _fragmented_state(spark, tmp_path / "state")
    before = _visible(read_merged_state(spark, str(state)))
    stats_before = bucket_file_stats(str(state))
    assert sum(n for n, _ in stats_before.values()) > len(stats_before), \
        "fixture should actually be fragmented"

    res = compact_state(spark, str(state), min_files=2)
    assert res["gen"] is not None
    assert res["files_after"] <= len(res["buckets_compacted"])
    assert res["files_after"] < res["files_before"]

    after = _visible(read_merged_state(spark, str(state)))
    assert after == before
    # every compacted bucket is now a single file (all well under target)
    stats_after = bucket_file_stats(str(state))
    for b in res["buckets_compacted"]:
        assert stats_after[b][0] == 1


def test_compact_does_not_consume_batch_ids(spark, tmp_path):
    """The critical decoupling: a maintenance commit advances the
    generation but NOT the batch watermark, so the stream's replay and
    sync guards are oblivious to it."""
    state = _fragmented_state(spark, tmp_path / "state", n_batches=3)
    res = compact_state(spark, str(state), min_files=2)
    with open(state / "_CURRENT") as fh:
        m = json.load(fh)
    assert m["gen"] == res["gen"] and m["batch_watermark"] == 2

    # retry of the last merged batch is still a no-op (not an error, and
    # not a double merge)
    before = _visible(read_merged_state(spark, str(state)))
    rows = [(f"X:{j}", f"n2-{j}", ["c2"], 3) for j in range(32)]
    merge_upsert_batch(spark, _batch(spark, rows), str(state), batch_id=2,
                       num_buckets=4)
    assert _visible(read_merged_state(spark, str(state))) == before

    # a genuinely stale batch still fails loudly
    with pytest.raises(RuntimeError, match="out of sync"):
        merge_upsert_batch(spark, _batch(spark, rows), str(state),
                           batch_id=1, num_buckets=4)

    # and the next real batch merges to exactly the from-scratch answer
    new = [("X:0", "late-zero", ["z"], 1), ("Y:9", "nine", ["c9"], 1)]
    merge_upsert_batch(spark, _batch(spark, new), str(state), batch_id=3,
                       num_buckets=4)
    from data_services_spark.operators.merge import merge_nodes
    all_rows = [(f"X:{j}", f"n{i}-{j}", [f"c{i}"], i + 1)
                for i in range(3) for j in range(32)] + new
    want = _visible(merge_nodes(_batch(spark, all_rows)))
    assert _visible(read_merged_state(spark, str(state))) == want


def test_compact_cdf_is_empty_and_time_travel_survives(spark, tmp_path):
    state = _fragmented_state(spark, tmp_path / "state", n_batches=3)
    pre_gen = json.load(open(state / "_CURRENT"))["gen"]
    pre = _visible(read_merged_state(spark, str(state)))
    res = compact_state(spark, str(state), min_files=2)
    # rows moved, nothing changed: the CDF across the compaction
    # generation is empty
    assert state_changes(spark, str(state), pre_gen, res["gen"]).count() == 0
    # pre-compaction snapshot is still byte-readable (retention window)
    assert _visible(read_merged_state(spark, str(state),
                                      generation=pre_gen)) == pre


def test_compact_respects_pins_through_vacuum(spark, tmp_path):
    from data_services_spark.streaming.ingest import (
        pin_snapshot, release_snapshot_pin,
    )
    state = _fragmented_state(spark, tmp_path / "state", n_batches=3)
    pre_gen = json.load(open(state / "_CURRENT"))["gen"]
    pre = _visible(read_merged_state(spark, str(state)))
    pin = pin_snapshot(str(state), generation=pre_gen)
    compact_state(spark, str(state), min_files=2)
    # aggressive retention: only the pin should keep gen<=pre_gen alive
    vacuum_state(str(state), keep_last=1)
    assert _visible(read_merged_state(spark, str(state),
                                      generation=pre_gen)) == pre
    release_snapshot_pin(str(state), pin["pin_id"])
    vacuum_state(str(state), keep_last=1)
    with pytest.raises(FileNotFoundError):
        read_merged_state(spark, str(state), generation=pre_gen)


def test_compact_noop_cases(spark, tmp_path):
    # empty state dir
    res = compact_state(spark, str(tmp_path / "never"), min_files=2)
    assert res["gen"] is None
    # already-compact state: nothing at or above min_files
    state = _fragmented_state(spark, tmp_path / "state", n_batches=1)
    stats = bucket_file_stats(str(state))
    floor = max(n for n, _ in stats.values()) + 1
    res = compact_state(spark, str(state), min_files=floor)
    assert res["gen"] is None and res["buckets_compacted"] == []


def test_compact_splits_oversized_buckets(spark, tmp_path):
    state = _fragmented_state(spark, tmp_path / "state", n_batches=3)
    before = bucket_file_stats(str(state))
    # absurdly small target forces buckets to split into the bin-packed
    # ceil(bytes/target) file count
    target = 2048
    res = compact_state(spark, str(state), min_files=1,
                        target_file_bytes=target)
    after = bucket_file_stats(str(state))
    for b in res["buckets_compacted"]:
        cap = -(-before[b][1] // target)
        assert 1 <= after[b][0] <= cap
    # at least one bucket actually split (fixture buckets are > 2 KiB)
    assert any(after[b][0] > 1 for b in res["buckets_compacted"])


def test_compact_legacy_manifest_without_watermark(spark, tmp_path):
    """A pre-watermark manifest (no batch_watermark field) compacts and
    keeps merging: watermark defaults to gen."""
    state = _fragmented_state(spark, tmp_path / "state", n_batches=2)
    # strip the watermark field to simulate a legacy manifest
    cur = json.load(open(state / "_CURRENT"))
    cur.pop("batch_watermark", None)
    with open(state / "_CURRENT", "w") as fh:
        json.dump(cur, fh)
    hist = state / "_manifests" / f"{cur['gen']}.json"
    if hist.exists():
        doc = json.load(open(hist))
        doc.pop("batch_watermark", None)
        with open(hist, "w") as fh:
            json.dump(doc, fh)

    res = compact_state(spark, str(state), min_files=2)
    m = json.load(open(state / "_CURRENT"))
    assert m["batch_watermark"] == 1 and m["gen"] == res["gen"]
    rows = [("Z:1", "zed", ["c"], 1)]
    merge_upsert_batch(spark, _batch(spark, rows), str(state), batch_id=2,
                       num_buckets=4)
    ids = {r.id for r in read_merged_state(spark, str(state)).collect()}
    assert "Z:1" in ids


def test_stream_merge_with_inline_compaction(spark, tmp_path):
    """compact_every cadence inside the foreachBatch sink: final state
    still equals the from-scratch merge, and a maintenance generation
    actually landed (gen ran ahead of the batch watermark)."""
    from data_services_spark.operators.merge import merge_nodes
    from data_services_spark.streaming.ingest import stream_merge_nodes

    rows1 = [("X:1", None, ["c1"], 1), ("X:2", "two", ["c2"], 1)]
    rows2 = [("X:1", "one-late", ["c3"], 2), ("X:3", "three", [], 2)]
    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(rows1, NODES).coalesce(1).write.parquet(
        str(src / "batch1"))
    spark.createDataFrame(rows2, NODES).coalesce(1).write.parquet(
        str(src / "batch2"))
    stream = (spark.readStream.schema(NODES)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/batch*/"))
    q = stream_merge_nodes(stream, str(tmp_path / "state"),
                           str(tmp_path / "ckpt"), compact_every=1,
                           compact_kwargs={"min_files": 1})
    q.awaitTermination()

    m = json.load(open(tmp_path / "state" / "_CURRENT"))
    assert m["gen"] > m["batch_watermark"], \
        "compaction generations should have run ahead of the watermark"
    got = _visible(read_merged_state(spark, str(tmp_path / "state")))
    want = _visible(merge_nodes(_batch(spark, rows1 + rows2)))
    assert got == want


def test_compact_preserves_schema_evolution_nulls(spark, tmp_path):
    """Buckets last written before a column existed read as NULL; after
    compaction those NULLs are materialized, not invented values."""
    state = tmp_path / "state"
    rows1 = [(f"A:{j}", f"a{j}", ["c"], 1) for j in range(6)]
    merge_upsert_batch(spark, _batch(spark, rows1), str(state), batch_id=0,
                       num_buckets=4)
    wide = ("id string, name string, category array<string>, "
            "source_rank int, extra string")
    rows2 = [("B:1", "b1", ["c"], 1, "E")]
    merge_upsert_batch(spark, spark.createDataFrame(rows2, wide),
                       str(state), batch_id=1, num_buckets=4,
                       scalar_props=("name", "extra"))
    compact_state(spark, str(state), min_files=1)
    got = {(r.id, r.name, r.extra) for r in
           read_merged_state(spark, str(state)).collect()}
    want = {(f"A:{j}", f"a{j}", None) for j in range(6)} | {("B:1", "b1",
                                                             "E")}
    assert got == want


def test_export_snapshot_manifest_duckdb_roundtrip(spark, tmp_path):
    """The exported file listing is the external-engine interop bridge
    (symlink-manifest analog): DuckDB reading exactly the listed files
    sees the same visible records as read_merged_state; with a pin the
    listing survives vacuum, and exporting a vacuumed generation fails
    loudly instead of emitting a dangling listing."""
    import duckdb

    from data_services_spark.streaming.ingest import (
        export_snapshot_manifest, pin_snapshot, release_snapshot_pin,
    )

    state = tmp_path / "state"
    merge_upsert_batch(spark, _batch(
        spark, [("X:1", "one", ["c1"], 1), ("X:2", "two", [], 1)]),
        str(state), batch_id=0)
    merge_upsert_batch(spark, _batch(
        spark, [("X:1", "one-upd", ["c2"], 0), ("X:3", "three", [], 1)]),
        str(state), batch_id=1)

    pre_gen = json.load(open(state / "_CURRENT"))["gen"]
    pin = pin_snapshot(str(state), generation=pre_gen)
    exp = export_snapshot_manifest(str(state))
    assert exp["generation"] == pre_gen and exp["n_files"] > 0

    files = [ln for ln in open(exp["path"]).read().splitlines() if ln]
    con = duckdb.connect()
    got = con.execute(
        "SELECT id, name, category FROM read_parquet(?) ORDER BY id",
        [files]).fetchall()
    want = sorted((r.id, r.name, r.category) for r in
                  read_merged_state(spark, str(state))
                  .select("id", "name", "category").collect())
    assert [(i, n, list(c)) for i, n, c in want] == \
        [(i, n, list(c)) for i, n, c in got]

    # a later generation + vacuum: the pinned export stays readable
    merge_upsert_batch(spark, _batch(
        spark, [("X:4", "four", [], 1)]), str(state), batch_id=2)
    vacuum_state(str(state), keep_last=1)
    for f in files:
        assert os.path.exists(f), "pinned export lost a data file"
    release_snapshot_pin(str(state), pin["pin_id"])
    vacuum_state(str(state), keep_last=1)
    with pytest.raises(FileNotFoundError):
        export_snapshot_manifest(str(state), generation=pre_gen)


def test_delete_flag_removes_keys(spark, tmp_path):
    """Key-level deletes: the flagged key leaves the state (no
    tombstone rows), a same-batch delete beats a same-batch upsert,
    deleting an absent key is a no-op, time travel still sees the
    pre-delete record, CDF reports 'removed', and a re-add after delete
    starts merge history fresh."""
    from data_services_spark.streaming.ingest import state_changes

    DEL = "id string, name string, category array<string>, " \
          "source_rank int, is_deleted boolean"
    state = tmp_path / "state"
    merge_upsert_batch(spark, _batch(
        spark, [("X:1", "one", ["c1"], 1), ("X:2", "two", [], 1),
                ("X:3", "three", [], 1)]), str(state), batch_id=0)
    pre_gen = json.load(open(state / "_CURRENT"))["gen"]

    # delete X:1; delete+upsert X:2 in one batch (delete wins);
    # delete absent X:9 (no-op); plain upsert of X:3
    rows = [("X:1", None, None, 1, True),
            ("X:2", "two-upd", ["c9"], 0, False),
            ("X:2", None, None, 1, True),
            ("X:9", None, None, 1, True),
            ("X:3", "three-upd", [], 0, False)]
    merge_upsert_batch(spark, spark.createDataFrame(rows, DEL),
                       str(state), batch_id=1, delete_flag="is_deleted")

    got = {r.id: (r.name, r.n_merged)
           for r in read_merged_state(spark, str(state)).collect()}
    assert set(got) == {"X:3"}, got
    assert got["X:3"] == ("three-upd", 2)

    # time travel: the pre-delete snapshot still has all three
    old = {r.id for r in read_merged_state(
        spark, str(state), generation=pre_gen).collect()}
    assert old == {"X:1", "X:2", "X:3"}
    cur_gen = json.load(open(state / "_CURRENT"))["gen"]
    changes = {r.id: r.change for r in state_changes(
        spark, str(state), pre_gen, cur_gen).collect()}
    assert changes == {"X:1": "removed", "X:2": "removed",
                       "X:3": "changed"}

    # re-add X:1: merge history starts fresh (n_merged back to 1)
    merge_upsert_batch(spark, _batch(
        spark, [("X:1", "one-again", [], 2)]), str(state), batch_id=2)
    got = {r.id: (r.name, r.n_merged)
           for r in read_merged_state(spark, str(state)).collect()}
    assert got["X:1"] == ("one-again", 1) and set(got) == {"X:1", "X:3"}


def test_delete_only_bucket_leaves_manifest(spark, tmp_path):
    """A bucket whose ONLY key is deleted must drop out of the manifest
    — otherwise the next read resurrects the old generation's copy."""
    DEL = "id string, name string, category array<string>, " \
          "source_rank int, is_deleted boolean"
    state = tmp_path / "state"
    # num_buckets=1: one bucket holds everything; delete ALL keys
    merge_upsert_batch(spark, _batch(
        spark, [("X:1", "one", [], 1)]), str(state), batch_id=0,
        num_buckets=1)
    merge_upsert_batch(
        spark, spark.createDataFrame([("X:1", None, None, 1, True)], DEL),
        str(state), batch_id=1, delete_flag="is_deleted", num_buckets=1)
    m = json.load(open(state / "_CURRENT"))
    assert m["buckets"] == {}, m
    with pytest.raises(FileNotFoundError):
        read_merged_state(spark, str(state))  # empty == no visible rows
    # and the state keeps working: a later upsert revives the bucket
    merge_upsert_batch(spark, _batch(
        spark, [("X:2", "two", [], 1)]), str(state), batch_id=2,
        num_buckets=1)
    got = {r.id for r in read_merged_state(spark, str(state)).collect()}
    assert got == {"X:2"}

"""Streaming incremental near-duplicate dedup — L2's streaming twin:
dedupe an unbounded document feed against the ENTIRE corpus seen so
far, without ever recomputing over history.

Contract per micro-batch (first-arrival-wins):

1. band-hash the batch (operators.dedup.band_hashes — MinHash LSH, the
   same banding the batch pair join uses);
2. intra-batch: LSH candidate pairs -> connected components -> only
   each cluster's min-id document survives the batch;
3. cross-corpus: a survivor whose ANY (band, bh) bucket already exists
   in the persisted kept-corpus band state is a duplicate of an
   earlier arrival;
4. the remaining survivors are KEPT — their band rows merge into the
   band state via the same generational bucketed parquet state the KGX
   merge uses (streaming/ingest.py), so the writer lease, snapshot
   pins, time travel, vacuum, and compaction all apply to the dedup
   index for free;
5. per-document decisions land as one parquet directory per batch id
   (overwritten on at-least-once retry — idempotent like the merge).

Scale shape: per-batch cost is the in-batch LSH bucket join (micro-
batch sized) plus ONE equi join of the batch's bands against the band
state on (band, bh). The batch side is small by construction, so the
planner broadcasts it and the corpus-sized state never shuffles — and
the state read is BUCKET-PRUNED: the band state is hash-bucketed by the
``(band, bh)`` key prefix (``bucket_cols`` on the generational state),
so the probe first computes which of the ``num_buckets`` buckets the
batch's own band hashes fall in (a metadata-scale job — at most
num_buckets ints reach the driver) and reads ONLY those bucket
directories. Per-batch I/O is therefore O(batch-touched buckets), not
O(corpus): at a 100 TB kept-corpus the probe cost stays flat as the
state grows (measured in SCALE.md). Nothing ever touches the full
document history; state grows at `bands` rows per KEPT document —
dropped duplicates add nothing.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from data_services_spark.operators.components import connected_components
from data_services_spark.operators.dedup import band_hashes
from data_services_spark.streaming.ingest import (
    _MANIFESTS, _bucket_paths, _read_manifest, merge_upsert_batch,
    read_merged_state,
)

BAND_KEY = ("band", "bh", "doc_id")
BUCKET_COLS = ("band", "bh")  # state bucketed by the probe-able prefix


def _decisions_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "_decisions")


def _probe_buckets(surv_bands: DataFrame, manifest: dict | None,
                   bucket_cols: tuple = BUCKET_COLS):
    """The state buckets this batch's key prefix can possibly match —
    computable because the state is bucketed by exactly that prefix. A
    metadata-scale job: at most ``num_buckets`` distinct ints reach
    the driver (the same discovery pattern the merge's touched-bucket
    job uses). Returns None when the manifest predates prefix
    bucketing (legacy full-key layout — prune unsafe, fall back to a
    full state read). ``bucket_cols`` parameterizes the prefix so
    other key-probed states (streaming/crawl.py's canonical-URL
    state) share this ONE encoding of the pmod(xxhash64(prefix))
    layout contract instead of copying it (round-10 review: three
    copies of a layout contract is how probes silently read the wrong
    buckets)."""
    if manifest is None:
        return None
    if manifest.get("bucket_cols") != list(bucket_cols):
        return None
    nb = manifest.get("num_buckets")
    if not nb:
        return None
    rows = (surv_bands
            .select(F.pmod(F.xxhash64(*bucket_cols), F.lit(nb))
                    .cast("int").alias("__b"))
            .distinct().collect())
    if len(rows) >= nb:
        # production-size batches touch EVERY bucket (measured round 8,
        # tools/neardup_scale_bench.py: a 10k-doc batch's 40k band keys
        # saturate 1024 buckets), at which point a bucket list is pure
        # overhead — per-path filtering of the state listing plus this
        # job's own cost — for a read identical to the full one. None
        # tells the state reader to take the plain full-scan path; the
        # pruning win belongs to the small-batch/low-latency regime
        # (and to num_buckets sized well above the batch's key count).
        return None
    return sorted(r[0] for r in rows)


def _state_before_batch(spark: SparkSession, state_dir: str,
                        batch_id: int, buckets=None):
    """The band state as of the last generation whose batch watermark
    precedes `batch_id` — the current state on a first delivery, an
    archived snapshot on an at-least-once replay. None when no prior
    batch ever committed, or when ``buckets`` is given and none of those
    buckets hold any corpus rows (no match is possible).

    A replay whose pre-batch snapshot has AGED OUT of retention raises
    instead of guessing: reading the current state would reclassify
    every kept document as a corpus duplicate of itself, and treating
    the corpus as empty (the pre-round-7 behavior) would silently
    rewrite the original dup_of_corpus verdicts as 'kept'. Run
    :func:`data_services_spark.streaming.ingest.vacuum_state` with
    ``keep_last >= 2`` so at-least-once replays always find their
    pre-batch snapshot."""
    cur = _read_manifest(state_dir)
    if cur is None:
        return None
    gen = None
    manifest = cur
    if not cur.get("batch_watermark", cur["gen"]) < batch_id:
        best = None  # replay: walk the archived manifest history
        hist = os.path.join(state_dir, _MANIFESTS)
        if os.path.isdir(hist):
            for name in os.listdir(hist):
                if not name.endswith(".json"):
                    continue
                try:
                    with open(os.path.join(hist, name)) as fh:
                        m = json.load(fh)
                except json.JSONDecodeError:
                    continue  # torn pre-round-7 archive, vacuum skips too
                if m.get("batch_watermark", m["gen"]) < batch_id and \
                        (best is None or m["gen"] > best["gen"]):
                    best = m
        if best is None:
            if batch_id <= cur.get("first_batch", 0):
                # replaying the state's very first batch: the pre-batch
                # corpus is empty by definition — no snapshot to find
                return None
            raise RuntimeError(
                f"replay of batch {batch_id} against {state_dir}: the "
                "corpus state is at batch watermark "
                f"{cur.get('batch_watermark', cur['gen'])} but no "
                "retained manifest precedes this batch — vacuum_state "
                "retention aged out the pre-batch snapshot, so the "
                "original kept/dup_of_corpus verdicts cannot be "
                "reproduced. Re-running against the current state (which "
                "already contains this batch's bands) or an empty corpus "
                "would both silently flip decisions; keep keep_last >= 2 "
                "so at-least-once replays always find their snapshot.")
        manifest, gen = best, best["gen"]
    if buckets is not None and not _bucket_paths(state_dir, manifest,
                                                 buckets):
        return None  # none of the probe's buckets hold corpus rows
    return read_merged_state(spark, state_dir, generation=gen,
                             buckets=buckets)


def dedup_batch_against_state(spark: SparkSession, batch: DataFrame,
                              state_dir: str, batch_id: int,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              num_hashes: int = 16, bands: int = 4,
                              shingle_n: int = 3,
                              hash_family: str = "xxhash64",
                              num_buckets: int = 64,
                              max_bucket_df: int | None = None,
                              prune_state_read: bool = True) -> None:
    """The foreachBatch body (callable directly for batch backfills):
    decide kept/duplicate for every document in `batch`, update the
    band state with the kept ones, write the decisions parquet.

    ``num_buckets`` sizes the generational band state's hash-bucket
    layout (recorded in the state's manifest on first commit and
    enforced thereafter) — size it so one micro-batch touches a
    fraction of the buckets, since per-batch probe I/O is
    O(touched buckets). ``max_bucket_df`` caps the in-batch LSH pair
    join: (band, bh) buckets shared by more than that many batch
    documents are dropped from candidate PROPOSAL only (the
    stop-fingerprint max-df move from winnow_shared_pairs), bounding an
    adversarial all-near-identical batch's pair count at
    O(buckets x max_df^2); capped documents still probe the corpus and
    still merge into the state. ``prune_state_read=False`` forces the
    full-corpus state read (measurement/debug only)."""
    # NULL text would silently VANISH from the banding (the shingle
    # explode drops null arrays), leaving those docs with no decision
    # row at all; hash them as empty text instead — all-empty docs
    # dedup among themselves, and every input doc gets a decision.
    batch = batch.withColumn(text_col,
                             F.coalesce(F.col(text_col), F.lit("")))
    bands_df = (band_hashes(batch, text_col, id_col, num_hashes, bands,
                            shingle_n, hash_family)
                .select(F.col("id").alias("doc_id"), "band", "bh"))

    # The band hashes feed the CC iteration and three later consumers;
    # persist so the minhash explode+groupBy runs once per batch, and
    # unpersist before returning (no cached blocks may outlive the
    # batch — the session is long-lived).
    bands_df = bands_df.persist()
    try:
        _decide_and_commit(spark, bands_df, state_dir, batch_id,
                           num_buckets, max_bucket_df, prune_state_read)
    finally:
        bands_df.unpersist()


def _decide_and_commit(spark: SparkSession, bands_df: DataFrame,
                       state_dir: str, batch_id: int,
                       num_buckets: int = 64,
                       max_bucket_df: int | None = None,
                       prune_state_read: bool = True) -> None:
    # In-batch candidate proposal, optionally max-df capped: a (band,
    # bh) bucket hit by > max_bucket_df batch docs contributes
    # O(df^2) pairs but near-zero discrimination (every doc in it is
    # near-identical to every other) — drop the bucket from PROPOSAL
    # the way winnow_shared_pairs drops stop-fingerprints. Docs whose
    # every bucket is hot simply propose no pairs (each survives
    # in-batch and is decided by the corpus probe); normal corpora are
    # untouched (property-tested).
    pair_src = bands_df
    if max_bucket_df is not None:
        hot = (bands_df.groupBy("band", "bh")
               .agg(F.count(F.lit(1)).alias("__df"))
               .filter(F.col("__df") > max_bucket_df)
               .select("band", "bh"))
        pair_src = bands_df.join(hot, ["band", "bh"], "left_anti")
    a, b = pair_src.alias("a"), pair_src.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bh") == F.col("b.bh"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"))
             .distinct())
    docs = bands_df.select("doc_id").distinct()
    # Most production batches have NO in-batch candidate pair (an
    # in-batch dup needs two near-identical docs in the SAME
    # micro-batch); probing one row costs one short-circuit job where
    # the CC iteration costs ~6-8 (eager checkpoints per round) —
    # measured fixed floors dominate per-batch cost at micro-batch
    # sizes (SCALE.md), so the probe pays for itself immediately.
    if pairs.limit(1).count() == 0:
        clustered = docs.select(
            "doc_id", F.col("doc_id").alias("cluster_id"))
    else:
        comp = connected_components(pairs, src="id_a", dst="id_b")
        clustered = (docs.join(comp, docs.doc_id == comp.node, "left")
                     .select("doc_id",
                             F.coalesce("component", F.col("doc_id"))
                             .alias("cluster_id")))
    in_batch_dup = clustered.filter(F.col("doc_id") != F.col("cluster_id"))
    survivors = clustered.filter(F.col("doc_id") == F.col("cluster_id")) \
        .select("doc_id")

    # Step 3: one equi join against the corpus band state. The batch
    # side is micro-batch sized -> broadcast; the state side is first
    # BUCKET-PRUNED to the batch's own (band, bh) hash buckets — the
    # probe can only match buckets containing its keys, and the state
    # is bucketed by exactly that prefix — then streams (never
    # shuffles). The state must be AS OF the last generation merged
    # BEFORE this batch: on an at-least-once replay (crash between the
    # merge commit and the streaming checkpoint) the current state
    # already contains this batch's own bands, and reading it would
    # re-classify every kept document as a corpus duplicate of itself.
    # The merge skips replays via its batch-watermark guard; the
    # decisions stay idempotent by time-traveling to the pre-batch
    # snapshot.
    id_type = bands_df.schema["doc_id"].dataType
    surv_bands = bands_df.join(survivors, "doc_id", "left_semi")
    probe = _probe_buckets(surv_bands, _read_manifest(state_dir)) \
        if prune_state_read else None
    state = _state_before_batch(spark, state_dir, batch_id, buckets=probe)
    if state is not None:
        corpus_dup = (state.select("band", "bh",
                                   F.col("doc_id").alias("kept_id"))
                      .join(F.broadcast(surv_bands), ["band", "bh"])
                      .groupBy("doc_id")
                      .agg(F.min("kept_id").cast(id_type)
                           .alias("duplicate_of")))
    else:  # batch 0: no corpus yet — typed-empty, schema-stable
        corpus_dup = (survivors.select("doc_id")
                      .withColumn("duplicate_of",
                                  F.lit(None).cast(id_type))
                      .limit(0))
    kept = survivors.join(corpus_dup.select("doc_id"), "doc_id",
                          "left_anti")

    # Step 4: merge kept docs' bands into the generational band state.
    # key = (band, bh, doc_id), no properties — merge_upsert_batch's
    # idempotent-retry / lease / manifest machinery is reused verbatim.
    # Buckets hash the (band, bh) PREFIX so the step-3 probe can prune.
    kept_bands = bands_df.join(kept, "doc_id", "left_semi")
    merge_upsert_batch(spark, kept_bands, state_dir, batch_id,
                       scalar_props=(), list_props=(),
                       key_cols=BAND_KEY, bucket_cols=BUCKET_COLS,
                       num_buckets=num_buckets)

    # Step 5: decisions, one dir per batch id (overwrite = idempotent).
    decisions = (kept.select("doc_id",
                             F.lit("kept").alias("status"),
                             F.lit(None).cast(id_type)
                             .alias("duplicate_of"))
                 .unionByName(in_batch_dup.select(
                     "doc_id", F.lit("dup_in_batch").alias("status"),
                     F.col("cluster_id").cast(id_type)
                     .alias("duplicate_of")))
                 .unionByName(corpus_dup.select(
                     "doc_id", F.lit("dup_of_corpus").alias("status"),
                     "duplicate_of"))
                 .withColumn("batch_id", F.lit(batch_id).cast("long")))
    (decisions.coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(_decisions_dir(state_dir), f"b{batch_id}")))


def stream_dedup_near(doc_stream: DataFrame, state_dir: str,
                      checkpoint_dir: str, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 16,
                      bands: int = 4, shingle_n: int = 3,
                      hash_family: str = "xxhash64",
                      num_buckets: int = 64,
                      max_bucket_df: int | None = None):
    """Attach the incremental near-dup sink to a streaming document
    DataFrame; returns the started StreamingQuery. See
    :func:`dedup_batch_against_state` for the num_buckets /
    max_bucket_df knobs."""
    os.makedirs(state_dir, exist_ok=True)
    spark = doc_stream.sparkSession

    def sink(batch: DataFrame, batch_id: int) -> None:
        dedup_batch_against_state(spark, batch, state_dir, batch_id,
                                  text_col, id_col, num_hashes, bands,
                                  shingle_n, hash_family,
                                  num_buckets=num_buckets,
                                  max_bucket_df=max_bucket_df)

    return (doc_stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_decisions(spark: SparkSession, state_dir: str) -> DataFrame:
    """All per-batch dedup decisions (doc_id, status, duplicate_of,
    batch_id)."""
    return spark.read.parquet(os.path.join(_decisions_dir(state_dir), "b*"))

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
planner broadcasts it and the corpus-sized state never shuffles;
nothing ever touches the full document history. State grows at `bands`
rows per KEPT document — dropped duplicates add nothing.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from data_services_spark.operators.components import connected_components
from data_services_spark.operators.dedup import band_hashes
from data_services_spark.streaming.ingest import (
    _MANIFESTS, _read_manifest, merge_upsert_batch, read_merged_state,
)

BAND_KEY = ("band", "bh", "doc_id")


def _decisions_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "_decisions")


def _state_before_batch(spark: SparkSession, state_dir: str,
                        batch_id: int):
    """The band state as of the last generation whose batch watermark
    precedes `batch_id` — the current state on a first delivery, an
    archived snapshot on an at-least-once replay. None when no prior
    batch ever committed (or its manifests aged out: then every prior
    batch's bands are in whatever generation survives, so the nearest
    retained earlier snapshot is still decision-correct)."""
    cur = _read_manifest(state_dir)
    if cur is None:
        return None
    if cur.get("batch_watermark", cur["gen"]) < batch_id:
        return read_merged_state(spark, state_dir)
    best = None  # replay: walk the archived manifest history
    hist = os.path.join(state_dir, _MANIFESTS)
    if os.path.isdir(hist):
        for name in os.listdir(hist):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(hist, name)) as fh:
                m = json.load(fh)
            if m.get("batch_watermark", m["gen"]) < batch_id and \
                    (best is None or m["gen"] > best["gen"]):
                best = m
    if best is None:
        return None
    return read_merged_state(spark, state_dir, generation=best["gen"])


def dedup_batch_against_state(spark: SparkSession, batch: DataFrame,
                              state_dir: str, batch_id: int,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              num_hashes: int = 16, bands: int = 4,
                              shingle_n: int = 3,
                              hash_family: str = "xxhash64") -> None:
    """The foreachBatch body (callable directly for batch backfills):
    decide kept/duplicate for every document in `batch`, update the
    band state with the kept ones, write the decisions parquet."""
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
        _decide_and_commit(spark, bands_df, state_dir, batch_id)
    finally:
        bands_df.unpersist()


def _decide_and_commit(spark: SparkSession, bands_df: DataFrame,
                       state_dir: str, batch_id: int) -> None:
    a, b = bands_df.alias("a"), bands_df.alias("b")
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
    # side is micro-batch sized -> broadcast; the state side streams.
    # The state must be AS OF the last generation merged BEFORE this
    # batch: on an at-least-once replay (crash between the merge commit
    # and the streaming checkpoint) the current state already contains
    # this batch's own bands, and reading it would re-classify every
    # kept document as a corpus duplicate of itself. The merge skips
    # replays via its batch-watermark guard; the decisions stay
    # idempotent by time-traveling to the pre-batch snapshot.
    id_type = bands_df.schema["doc_id"].dataType
    state = _state_before_batch(spark, state_dir, batch_id)
    if state is not None:
        surv_bands = bands_df.join(survivors, "doc_id", "left_semi")
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
    kept_bands = bands_df.join(kept, "doc_id", "left_semi")
    merge_upsert_batch(spark, kept_bands, state_dir, batch_id,
                       scalar_props=(), list_props=(),
                       key_cols=BAND_KEY)

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
                      hash_family: str = "xxhash64"):
    """Attach the incremental near-dup sink to a streaming document
    DataFrame; returns the started StreamingQuery."""
    os.makedirs(state_dir, exist_ok=True)
    spark = doc_stream.sparkSession

    def sink(batch: DataFrame, batch_id: int) -> None:
        dedup_batch_against_state(spark, batch, state_dir, batch_id,
                                  text_col, id_col, num_hashes, bands,
                                  shingle_n, hash_family)

    return (doc_stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_decisions(spark: SparkSession, state_dir: str) -> DataFrame:
    """All per-batch dedup decisions (doc_id, status, duplicate_of,
    batch_id)."""
    return spark.read.parquet(os.path.join(_decisions_dir(state_dir), "b*"))

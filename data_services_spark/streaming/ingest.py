"""Streaming KGX ingest: incremental node merge via ``foreachBatch``
(SURVEY §2.9 + EP1 bridge — the streaming twin of the batch graph build).

Each micro-batch of incoming nodes is merged (A1 semantics: first-wins by
rank, list-union) into a persistent parquet state, so the graph stays
query-ready while sources stream in. State is **generational**: batch N
reads ``gen=N-1``, merges, writes ``gen=N`` — never overwriting the
directory it is reading (parquet has no transactional overwrite; the
read-your-own-overwrite race corrupts state). ``_CURRENT`` points at the
committed generation, written only after the new generation lands, giving
crash consistency: a died-mid-write generation is simply orphaned.

At cluster scale the same operator targets a transactional table format
(Delta/Iceberg ``MERGE INTO``) instead of generation swapping; the
foreachBatch structure is identical. Merge cost per batch is one shuffle
of (state + batch) on ``id`` — for huge states, bucket the state table by
``id`` (plans/bucketing.py) so only the batch side shuffles.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_CURRENT = "_CURRENT"


def _committed_gen(state_dir: str) -> int | None:
    ptr = os.path.join(state_dir, _CURRENT)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def _read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    gen = _committed_gen(state_dir)
    if gen is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"gen={gen}"))


def read_merged_state(spark: SparkSession, state_dir: str,
                      internal: bool = False) -> DataFrame:
    """The committed merged-node state (empty-state error is the caller's
    signal that no batch has ever committed). ``internal=True`` keeps the
    per-scalar `*__rank` bookkeeping columns."""
    df = _read_state(spark, state_dir)
    if df is None:
        raise FileNotFoundError(f"no committed generation in {state_dir}")
    if not internal:
        df = df.drop(*[c for c in df.columns if c.endswith("__rank")])
    return df


def _to_stateful(batch: DataFrame, scalar_props, list_props,
                 rank_col: str) -> DataFrame:
    """Raw node rows -> stateful-merge shape: each scalar carries its own
    winning rank (`p__rank` = rank where p was non-null). A single
    carried rank per row would be WRONG: a scalar may have been resolved
    from a lower-priority source because the top source had it null, and
    a later batch from the top source must still be able to win it."""
    cols = [F.col("id")]
    for p in scalar_props:
        cols.append(F.col(p))
        cols.append(F.when(F.col(p).isNotNull(), F.col(rank_col))
                    .alias(f"{p}__rank"))
    cols += [F.col(p) for p in list_props]
    cols.append(F.lit(1).cast("long").alias("n_merged"))
    return batch.select(*cols)


def _merge_stateful(df: DataFrame, scalar_props, list_props) -> DataFrame:
    aggs = []
    for p in scalar_props:
        aggs.append(F.min_by(F.col(p), F.col(f"{p}__rank")).alias(p))
        aggs.append(F.min(f"{p}__rank").alias(f"{p}__rank"))
    for p in list_props:
        aggs.append(F.array_sort(F.array_distinct(
            F.flatten(F.collect_list(p)))).alias(p))
    aggs.append(F.sum("n_merged").alias("n_merged"))
    return df.groupBy("id").agg(*aggs)


def merge_upsert_batch(spark: SparkSession, batch: DataFrame,
                       state_dir: str, batch_id: int,
                       scalar_props=("name",),
                       list_props=("category",),
                       rank_col: str = "source_rank") -> None:
    """foreachBatch body: merge `batch` into the committed state and
    commit a new generation. Idempotent per batch_id (re-running a failed
    batch overwrites its own uncommitted generation). The per-scalar-rank
    state makes incremental merge EXACTLY equal to a from-scratch batch
    merge in any arrival order (asserted in tests/test_streaming.py)."""
    # foreachBatch is at-least-once: a crash between the _CURRENT swap and
    # the streaming checkpoint commit re-runs this batch_id on restart.
    # Without this guard the retry would read gen=<batch_id> and overwrite
    # the very directory the lazy plan is reading (Spark refuses -> stream
    # permanently wedged) — and a successful re-merge would double-count.
    committed = _committed_gen(state_dir)
    if committed is not None and committed == batch_id:
        return  # legitimate foreachBatch retry of the just-committed batch
    if committed is not None and committed > batch_id:
        # batch ids restart at 0 when the streaming checkpoint is reset;
        # pairing a fresh checkpoint with old state would silently drop
        # every batch until batch_id catches up — fail loudly instead.
        raise RuntimeError(
            f"state_dir {state_dir} is at generation {committed} but the "
            f"stream delivered batch {batch_id}: the streaming checkpoint "
            "and merge state are out of sync (checkpoint reset against "
            "retained state?). Clear one or the other.")
    incoming = _to_stateful(batch, scalar_props, list_props, rank_col)
    state = _read_state(spark, state_dir)
    if state is not None:
        incoming = state.unionByName(incoming)
    merged = _merge_stateful(incoming, scalar_props, list_props)
    gen_dir = os.path.join(state_dir, f"gen={batch_id}")
    merged.write.mode("overwrite").parquet(gen_dir)
    tmp = os.path.join(state_dir, f"{_CURRENT}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, os.path.join(state_dir, _CURRENT))


def stream_merge_nodes(node_stream: DataFrame, state_dir: str,
                       checkpoint_dir: str,
                       scalar_props=("name",),
                       list_props=("category",)):
    """Attach the incremental merge sink to a streaming node DataFrame;
    returns the StreamingQuery."""
    os.makedirs(state_dir, exist_ok=True)
    spark = node_stream.sparkSession

    def sink(batch: DataFrame, batch_id: int) -> None:
        merge_upsert_batch(spark, batch, state_dir, batch_id,
                           scalar_props, list_props)

    return (node_stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())

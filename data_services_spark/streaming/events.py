"""Structured Streaming surface (SURVEY §2.9 T1-T5).

The reference is pure batch; this is the engine's added streaming veneer.
Design rule: every streaming transform has a batch twin in
``operators/windows.py`` producing identical results on the same data —
tests assert that equivalence (stream with availableNow trigger == batch).

At scale: file-source streams read new files incrementally; watermarks bound
state for window aggs and dedup; ``foreachBatch`` handles sinks Spark lacks
native streaming writers for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from data_services_spark.session import configure_session

EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                 "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over events parquet. The parquet `ts` is μs
    TIMESTAMP_NTZ; watermarks only accept LTZ TIMESTAMP, so cast — a
    wall-clock no-op under the pinned UTC session timezone."""
    configure_session(spark)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).withColumn(
        "ts", F.col("ts").cast("timestamp"))


def stream_tumbling_counts(events: DataFrame, duration: str = "1 hour",
                           watermark: str = "10 minutes") -> DataFrame:
    """T1+T4: watermarked tumbling-window counts per event type."""
    from data_services_spark.functions.numeric import dsum

    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", duration).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("value", "sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value"))


def stream_session_counts(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """T3 streaming: session windows per user."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    "n_events"))


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T5: stateful dedup by event id within the watermark horizon."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def stream_interval_join(views: DataFrame, purchases: DataFrame,
                         horizon: str = "1 hour",
                         watermark: str = "10 minutes") -> DataFrame:
    """T-family: watermarked stream-stream interval join — attribute each
    purchase to the same user's view within the preceding `horizon`
    (the classic streaming attribution join).

    Both sides carry watermarks plus a bounded time condition, so Spark
    can expire buffered rows: view-side state lives `horizon` +
    `watermark`, purchase-side `watermark` — without both bounds the
    state store grows forever. The batch twin is a plain range-condition
    join (operators/asof.py's range join family); tests assert
    stream == batch after draining."""
    v = (views.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("v_ts")))
    p = (purchases.withWatermark("ts", watermark)
         .select("user_id", F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts")))
    cond = ((F.col("v_user") == F.col("user_id"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr(
                f"INTERVAL {horizon}")))
    return (p.join(v, cond)
            .select("user_id", "purchase_id", "view_id",
                    (F.unix_micros(F.col("p_ts").cast("timestamp"))
                     - F.unix_micros(F.col("v_ts").cast("timestamp")))
                    .cast("long").alias("gap_us")))


def run_to_memory_sink(stream: DataFrame, name: str,
                       output_mode: str = "append") -> DataFrame:
    """Drain a stream with the availableNow trigger into an in-memory table
    and return it as a batch DataFrame (test/bench harness)."""
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return stream.sparkSession.table(name)


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         on) -> DataFrame:
    """T-family stream-static join: enrich a stream against a batch
    dimension. Stateless — no watermark, no state store; Spark re-plans
    the static side per micro-batch (so a slowly-refreshed dim table is
    picked up on re-read) and broadcasts it under AQE exactly as in the
    batch twin. Append output mode; every input row emits at most once."""
    return stream.join(F.broadcast(dim), on)

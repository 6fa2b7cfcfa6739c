"""Structured Streaming twins == batch results on the same data
(SURVEY §2.9 T1/T3/T5)."""

from __future__ import annotations

import shutil

import pytest

from data_services_spark.catalog import load_table
from data_services_spark.streaming.events import (
    read_event_stream, run_to_memory_sink, stream_dedup,
    stream_session_counts, stream_tumbling_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def test_stream_tumbling_equals_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_to_memory_sink(
        stream_tumbling_counts(stream), "t1_sink").collect()
    batch = load_table(spark, SF_DIR, "events")
    from data_services_spark.operators.windows import tumbling
    import pyspark.sql.functions as F
    from data_services_spark.functions.numeric import dsum

    want = tumbling(batch, "ts", "1 hour", ["event_type"],
                    F.count(F.lit(1)).alias("n"),
                    dsum("value", "sum_value")).collect()
    # append mode only emits windows the final watermark closed: the last
    # in-flight window is (correctly) withheld — compare below the cutoff.
    import datetime as dt

    max_ts = batch.agg(F.max("ts")).head()[0]
    cutoff = max_ts - dt.timedelta(minutes=70)  # window size + watermark
    gset = {(r["window_start"], r["event_type"], r["n"], r["sum_value"])
            for r in got if r["window_start"] <= cutoff}
    wset = {(dt.datetime.utcfromtimestamp(r["window_start_ms"] / 1000),
             r["event_type"], r["n"], r["sum_value"])
            for r in want
            if dt.datetime.utcfromtimestamp(r["window_start_ms"] / 1000)
            <= cutoff}
    assert gset and gset == wset


def test_stream_sessions_run(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_to_memory_sink(stream_session_counts(stream), "t3_sink")
    assert got.count() > 0


def test_stream_dedup_drops_replays(spark, events_dir, tmp_path):
    # write the same file twice into the stream dir -> every event replayed
    d = tmp_path / "dup_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "b.parquet")
    stream = read_event_stream(spark, str(d))
    got = run_to_memory_sink(stream_dedup(stream), "t5_sink")
    batch_n = load_table(spark, SF_DIR, "events").count()
    assert got.count() == batch_n

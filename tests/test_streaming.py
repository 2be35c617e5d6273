"""Streaming/batch consistency: the same windowed aggregates over events
computed via Structured Streaming (availableNow → memory sink) must equal
the batch plan — the backfill-vs-live property."""

from __future__ import annotations

import pytest

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    session_stats,
    tumbling_counts,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # stage events as micro-batch-able parquet files with µs timestamps
    # (streaming can't read the TIMESTAMP(NANOS) original directly)
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def _collect_sorted(df, cols):
    return sorted([tuple(r) for r in df.select(*cols).collect()])


def test_tumbling_stream_equals_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir, SCHEMA, max_files_per_trigger=2)
    q = run_stream_to_memory(tumbling_counts(stream), "tumbling_t", "complete")
    got = spark.table("tumbling_t")
    want = tumbling_counts(load_table(spark, sf_dir, "events"))
    cols = ["window_start", "window_end", "event_type", "n"]
    assert _collect_sorted(got, cols) == _collect_sorted(want, cols)
    q.stop()


def test_session_stream_equals_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir, SCHEMA, max_files_per_trigger=2)
    q = run_stream_to_memory(session_stats(stream), "sessions_t", "complete")
    got = spark.table("sessions_t")
    want = session_stats(load_table(spark, sf_dir, "events"))
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    assert _collect_sorted(got, cols) == _collect_sorted(want, cols)
    q.stop()


def test_streaming_dedup_equals_batch(spark, sf_dir, events_dir):
    from scripts_toolkit_spark.streaming.windows import streaming_dedup

    stream = read_events_stream(spark, events_dir, SCHEMA, max_files_per_trigger=2)
    q = (
        streaming_dedup(stream, ["user_id", "event_type"])
        .select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["user_id"], r["event_type"]) for r in spark.table("dedup_t").collect()}
    want = {
        (r["user_id"], r["event_type"])
        for r in load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct().collect()
    }
    assert got == want
    # streaming dedup emits exactly one row per key
    assert spark.table("dedup_t").count() == len(want)
    q.stop()

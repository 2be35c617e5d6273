"""Stream-stream interval join == batch join over the same events."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.streaming.joins import purchases_with_recent_clicks
from scripts_toolkit_spark.streaming.windows import read_events_stream

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_joins"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, events_dir):
    s1 = read_events_stream(spark, events_dir, SCHEMA, max_files_per_trigger=2)
    s2 = read_events_stream(spark, events_dir, SCHEMA, max_files_per_trigger=2)
    joined = purchases_with_recent_clicks(
        s1.where(F.col("event_type") == "purchase"),
        s2.where(F.col("event_type") == "click"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("stream_join_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["purchase_id"], r["click_id"]) for r in spark.table("stream_join_t").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    want_df = purchases_with_recent_clicks(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
    )
    want = {(r["purchase_id"], r["click_id"]) for r in want_df.collect()}
    assert got == want
    assert len(want) > 0  # non-degenerate: matches exist in the data
    q.stop()

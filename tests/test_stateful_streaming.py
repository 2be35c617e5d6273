"""applyInPandasWithState: final per-key state after consuming the whole
stream must equal the batch groupBy aggregate (state survives across
micro-batches — maxFilesPerTrigger forces several)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.streaming.stateful import running_user_stats
from scripts_toolkit_spark.streaming.windows import read_events_stream

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stateful"))
    load_table(spark, sf_dir, "events").repartition(6).write.mode("overwrite").parquet(path)
    return path


def test_stateful_running_stats_equals_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir, SCHEMA, max_files_per_trigger=2)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # "update" emits one row per key per touching micro-batch → keep the
    # final state per key (max n_events is monotone)
    got = (
        spark.table("user_stats_t")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
            F.max("last_ts").alias("last_ts"),
        )
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
    )
    g = {r["user_id"]: r for r in got.collect()}
    w = {r["user_id"]: r for r in want.collect()}
    assert set(g) == set(w)
    for uid in w:
        assert g[uid]["n_events"] == w[uid]["n_events"], uid
        assert abs(g[uid]["sum_value"] - w[uid]["sum_value"]) < 1e-6, uid
        assert g[uid]["last_ts"] == w[uid]["last_ts"], uid
    q.stop()

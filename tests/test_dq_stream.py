"""Streaming data-quality monitor: merged partials == one-shot batch
metrics (exact for scalars, bit-exact for the HLL register merge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.streaming.dq_stream import (
    HLL_M,
    _hll_parts,
    current_metrics,
    make_dq_processor,
    start_dq_monitor,
)


def _batch_truth(ev):
    row = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_value"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("decimal(28,2)").alias("v_sum"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    ).collect()[0]
    reg, rho = _hll_parts("user_id")
    sk = (
        ev.select(reg.alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("mx"))
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s_hit"),
            F.count(F.lit(1)).alias("n_hit"),
        )
        .collect()[0]
    )
    est = 0.709 * HLL_M * HLL_M / (sk["s_hit"] + (HLL_M - sk["n_hit"]))
    return row, est


def test_streaming_dq_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "ev_in")
    ev.where(F.col("event_id") <= mid).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("event_id") > mid).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = str(tmp_path / "dq_store")
    q = start_dq_monitor(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = current_metrics(spark, store).collect()[0]
    truth, est = _batch_truth(ev)
    assert got["n_rows"] == truth["n_rows"] > 0
    assert got["value_completeness"] == 1.0
    assert got["value_sum"] == float(truth["v_sum"])
    assert got["v_min"] == truth["v_min"] and got["v_max"] == truth["v_max"]
    # register MAX merge is associative → the streaming estimate is
    # BIT-EQUAL to the one-shot sketch
    assert got["distinct_est"] == est


def test_dq_replay_is_idempotent(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(400).localCheckpoint()
    store = str(tmp_path / "store")
    process = make_dq_processor(store)
    process(ev, 0)
    snap = current_metrics(spark, store).collect()[0].asDict()
    process(ev, 0)  # crash replay of the same batch
    assert current_metrics(spark, store).collect()[0].asDict() == snap

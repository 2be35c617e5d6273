"""Streaming CDC upsert == one-shot batch apply_changelog, plus replay
idempotency and log compaction invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators.spans import apply_changelog
from scripts_toolkit_spark.streaming.upsert_stream import (
    compact,
    current_state,
    make_upsert_processor,
    start_cdc_upsert,
)

def _op():
    return (
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
    )


def _state_rows(df):
    return {
        r["user_id"]: (r["last_op"], r["event_type"], r["ts"], r["value"])
        for r in df.collect()
    }


def test_streaming_upsert_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # split history in half BY TIME so later files override earlier state
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "cl_in")
    ev.where(F.col("event_id") <= mid).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("event_id") > mid).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = str(tmp_path / "state_store")
    q = start_cdc_upsert(
        stream, store, str(tmp_path / "ckpt"), "user_id", _op(), ["ts", "event_id"]
    )
    q.awaitTermination()

    got = _state_rows(current_state(spark, store, "user_id", ["ts", "event_id"]))
    expected = _state_rows(
        apply_changelog(ev, "user_id", _op(), ["ts", "event_id"]).select(
            "user_id", "last_op", "event_type", "ts", "value"
        )
    )
    assert got == expected and len(got) > 0

    # compaction folds the log without changing the merged state
    import pathlib

    max_bid = max(
        int(p.name.split("=", 1)[1]) for p in pathlib.Path(store).glob("batch_id=*")
    )
    assert max_bid >= 1  # two files → at least two micro-batches
    compact(spark, store, "user_id", ["ts", "event_id"], up_to_batch=max_bid)
    assert (
        _state_rows(current_state(spark, store, "user_id", ["ts", "event_id"])) == expected
    )
    assert {
        int(p.name.split("=", 1)[1]) for p in pathlib.Path(store).glob("batch_id=*")
    } == {max_bid}


def test_upsert_replay_is_idempotent(spark, sf_dir, tmp_path):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .limit(500)
        .localCheckpoint()
    )
    store = str(tmp_path / "store")
    process = make_upsert_processor(store, "user_id", _op(), ["ts", "event_id"])
    process(ev, 0)
    snap1 = _state_rows(current_state(spark, store, "user_id", ["ts", "event_id"]))
    process(ev, 0)  # crash-replay of the same batch
    assert _state_rows(current_state(spark, store, "user_id", ["ts", "event_id"])) == snap1


def test_delete_masks_older_batches(spark, tmp_path):
    store = str(tmp_path / "store")
    process = make_upsert_processor(store, "k", F.col("o"), ["t"])
    b0 = spark.createDataFrame([(1, 1, "I", 1.0), (2, 1, "I", 2.0)], "k bigint, t bigint, o string, v double")
    b1 = spark.createDataFrame([(1, 2, "D", 0.0), (2, 2, "U", 9.0)], "k bigint, t bigint, o string, v double")
    process(b0, 0)
    process(b1, 1)
    got = {r["k"]: (r["last_op"], r["v"]) for r in current_state(spark, store, "k", ["t"]).collect()}
    assert got == {2: ("U", 9.0)}
    # re-insert after delete resurrects the key
    b2 = spark.createDataFrame([(1, 3, "I", 7.0)], "k bigint, t bigint, o string, v double")
    process(b2, 2)
    got = {r["k"]: (r["last_op"], r["v"]) for r in current_state(spark, store, "k", ["t"]).collect()}
    assert got == {1: ("I", 7.0), 2: ("U", 9.0)}


def test_state_as_of_time_travel(spark, sf_dir, tmp_path):
    """state_as_of(b) must equal apply_changelog over the event PREFIX
    that had arrived by batch b — for every batch — and compaction keeps
    as-of reads at/above the horizon unchanged while (documented trade)
    history below it is folded away."""
    from scripts_toolkit_spark.streaming.upsert_stream import state_as_of

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).limit(900)
    thirds = ev.approxQuantile("event_id", [0.34, 0.67], 0.0)
    slices = [
        ev.where(F.col("event_id") <= thirds[0]),
        ev.where((F.col("event_id") > thirds[0]) & (F.col("event_id") <= thirds[1])),
        ev.where(F.col("event_id") > thirds[1]),
    ]
    store = str(tmp_path / "tt_store")
    proc = make_upsert_processor(store, "user_id", _op(), ["ts", "event_id"])
    for b, sl in enumerate(slices):
        proc(sl, b)

    prefix = None
    for b, sl in enumerate(slices):
        prefix = sl if prefix is None else prefix.unionByName(sl)
        got = _state_rows(state_as_of(spark, store, "user_id", ["ts", "event_id"], b))
        expected = _state_rows(
            apply_changelog(prefix, "user_id", _op(), ["ts", "event_id"]).select(
                "user_id", "last_op", "event_type", "ts", "value"
            )
        )
        assert got == expected and got, f"as-of batch {b} mismatch"

    before = _state_rows(state_as_of(spark, store, "user_id", ["ts", "event_id"], 1))
    compact(spark, store, "user_id", ["ts", "event_id"], up_to_batch=1)
    after = _state_rows(state_as_of(spark, store, "user_id", ["ts", "event_id"], 1))
    assert before == after  # as-of AT the compaction horizon is unchanged
    final = _state_rows(state_as_of(spark, store, "user_id", ["ts", "event_id"], 2))
    full = _state_rows(current_state(spark, store, "user_id", ["ts", "event_id"]))
    assert final == full

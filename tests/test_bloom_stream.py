"""Streaming Bloom membership store: merged per-batch words must be
BIT-EXACT equal to the one-shot bitmap (OR is associative/commutative/
idempotent), every streamed key must probe true (no false negatives),
and crash replay must not change state — which for OR holds even
WITHOUT the overwrite discipline, pinned separately."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.streaming.bloom_stream import (
    make_bloom_processor,
    merged_bloom,
    probe_members,
    start_bloom_monitor,
    word_partials,
)


def _keys(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
    )


def test_streaming_bloom_matches_one_shot(spark, sf_dir, tmp_path):
    keys = _keys(spark, sf_dir).localCheckpoint()
    src = str(tmp_path / "keys_in")
    keys.where(F.pmod("k", F.lit(2)) == 0).coalesce(1).write.mode("append").parquet(src)
    keys.where(F.pmod("k", F.lit(2)) == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k bigint").option("maxFilesPerTrigger", 1).parquet(src)
    )
    store = str(tmp_path / "bloom_store")
    q = start_bloom_monitor(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {(r["word_idx"], r["word"]) for r in merged_bloom(spark, store).collect()}
    want = {(r["word_idx"], r["word"]) for r in word_partials(keys, "k").collect()}
    assert got == want and len(got) > 0


def test_no_false_negatives_and_probe_flags(spark, sf_dir, tmp_path):
    keys = _keys(spark, sf_dir).localCheckpoint()
    store = str(tmp_path / "store")
    make_bloom_processor(store)(keys, 0)
    # every streamed key probes member
    members = probe_members(spark, store, keys, "k").collect()
    assert len(members) > 0 and all(r["bloom_member"] for r in members)
    # unseen keys (HIGH priority — disjoint set) are mostly non-members
    other = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "2-HIGH")
        .select(F.col("o_orderkey").alias("k"))
    )
    flags = probe_members(spark, store, other, "k").collect()
    n_fp = sum(1 for r in flags if r["bloom_member"])
    assert n_fp / max(len(flags), 1) < 0.05  # sized bitmap: FP well under 5%
    # input cardinality is preserved (advisor r12): duplicate candidate
    # rows each keep their own output row rather than silently merging
    dup = keys.limit(3).unionAll(keys.limit(3))
    assert probe_members(spark, store, dup, "k").count() == 6


def test_replay_idempotent_even_without_overwrite(spark, sf_dir, tmp_path):
    keys = _keys(spark, sf_dir).limit(500).localCheckpoint()
    store = str(tmp_path / "store")
    process = make_bloom_processor(store)
    process(keys, 0)
    snap = sorted((r["word_idx"], r["word"]) for r in merged_bloom(spark, store).collect())
    process(keys, 0)  # crash replay, same batch_id (overwrite path)
    assert snap == sorted(
        (r["word_idx"], r["word"]) for r in merged_bloom(spark, store).collect()
    )
    # OR-idempotence: even a DUPLICATE batch id (append, not overwrite)
    # cannot change the merged bitmap
    word_partials(keys, "k").withColumn("batch_id", F.lit(99)).write.mode(
        "append"
    ).partitionBy("batch_id").parquet(store)
    assert snap == sorted(
        (r["word_idx"], r["word"]) for r in merged_bloom(spark, store).collect()
    )


def test_incremental_twin_matches_streaming_recipe(spark, sf_dir):
    """The registered batch twin's merged bitmap == the store's one-shot
    word partials (same hash recipe end-to-end)."""
    from scripts_toolkit_spark.plans.scale_demos import incremental_bloom_members

    rows = incremental_bloom_members(spark, sf_dir).collect()
    urgent = [r for r in rows if r["o_orderpriority"] == "1-URGENT"]
    assert len(urgent) > 0 and all(r["bloom_member"] for r in urgent)
    high = [r for r in rows if r["o_orderpriority"] == "2-HIGH"]
    assert len(high) > 0 and sum(r["bloom_member"] for r in high) / len(high) < 0.05

"""Incremental winnowing substring-overlap dedup == one-shot batch
pairing (uncapped — the df boilerplate guard is retrospective and
batch-only; see streaming/winnow_stream.py docstring), including pairs
that SPAN micro-batches, plus foreachBatch replay idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.ext.text import kgram_hashes, winnow_min_hashes
from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.streaming.winnow_stream import (
    make_batch_processor,
    start_incremental_winnow,
)


def _batch_pairs_uncapped(spark, corpus, k=8, window=16, min_shared=4):
    h = corpus.select("doc_id", kgram_hashes("text", k).alias("h")).localCheckpoint()
    fps = h.select(
        "doc_id", F.explode(winnow_min_hashes(F.col("h"), window)).alias("fp")
    ).localCheckpoint()
    a = fps.select(F.col("doc_id").alias("id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def test_incremental_winnow_matches_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    dup = docs.limit(40).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    corpus = docs.unionByName(dup)
    src = str(tmp_path / "docs_in")
    docs.coalesce(1).write.mode("append").parquet(src)
    dup.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_incremental_winnow(
        stream,
        store_path=str(tmp_path / "fp_store"),
        pairs_path=str(tmp_path / "pairs_out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in spark.read.parquet(str(tmp_path / "pairs_out")).collect()
    }
    expected = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in _batch_pairs_uncapped(spark, corpus).collect()
    }
    assert got == expected and expected
    cross = {(a, b) for (a, b) in expected if b >= 1000000 and a < 1000000}
    assert cross and cross <= set(got)


def test_winnow_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    dup = docs.limit(20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    process = make_batch_processor(
        store_path=str(tmp_path / "fp_store"),
        pairs_path=str(tmp_path / "pairs_out"),
    )
    process(docs, 0)
    process(dup, 1)

    def snapshot():
        pairs = sorted(
            (r["id_a"], r["id_b"], r["n_shared"])
            for r in spark.read.parquet(str(tmp_path / "pairs_out")).collect()
        )
        fps = sorted(
            (r["doc_id"], r["fp"], r["batch_id"])
            for r in spark.read.parquet(str(tmp_path / "fp_store")).collect()
        )
        return pairs, fps

    first = snapshot()
    assert first[0], "expected overlap pairs before replay"
    process(dup, 1)  # replay
    assert snapshot() == first

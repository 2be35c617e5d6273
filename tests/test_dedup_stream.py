"""Incremental streaming near-dup == one-shot batch near-dup.

Documents arrive across several files; the foreachBatch pipeline joins
each micro-batch against the persisted signature store. The emitted pair
set must equal `minhash_lsh_pairs` over the full corpus in one shot —
including pairs that SPAN micro-batches (the case a naive per-batch dedup
misses entirely)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.ext.dedup import minhash_lsh_pairs
from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.streaming.dedup_stream import (
    make_batch_processor,
    start_incremental_dedup,
)


def test_incremental_dedup_matches_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    dup = docs.limit(40).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    corpus = docs.unionByName(dup)

    # land originals and perturbed copies in SEPARATE files so near-dup
    # pairs span micro-batches
    src = str(tmp_path / "docs_in")
    docs.coalesce(1).write.mode("append").parquet(src)
    dup.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_incremental_dedup(
        stream,
        store_path=str(tmp_path / "sig_store"),
        pairs_path=str(tmp_path / "pairs_out"),
        checkpoint=str(tmp_path / "ckpt"),
        perms=8,
        bands=4,
    )
    q.awaitTermination()

    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(str(tmp_path / "pairs_out")).collect()
    }
    expected = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(corpus, perms=8, bands=4, jaccard_threshold=0.5).collect()
    }
    assert got == expected
    # and the planted cross-batch pairs are actually present
    cross = {(a, b) for (a, b) in expected if b >= 1000000 and a < 1000000}
    assert cross and cross <= got


def test_batch_twin_matches_streaming_attribution(spark, sf_dir, tmp_path):
    """The registered `incremental_dedup_pairs` batch query claims each pair
    is attributed to the micro-batch an incremental run would emit it in
    (the LATER document's wave, doc_id % 3). Verify against an ACTUAL
    availableNow streaming run over the same three waves: pair set AND
    per-pair batch ids must match exactly."""
    import time

    from scripts_toolkit_spark.plans.ext_demos import (
        _docs_with_dups,
        incremental_dedup_pairs,
    )

    docs = _docs_with_dups(spark, sf_dir)
    src = str(tmp_path / "waves")
    for wave in (0, 1, 2):
        docs.where(F.col("doc_id") % 3 == wave).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct mtimes: file-source processes oldest first

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_incremental_dedup(
        stream,
        store_path=str(tmp_path / "sig_store"),
        pairs_path=str(tmp_path / "pairs_out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    streamed = {
        (r["id_a"], r["id_b"]): r["batch_id"]
        for r in spark.read.parquet(str(tmp_path / "pairs_out")).collect()
    }
    twin = {
        (r["id_a"], r["id_b"]): r["emitted_in"]
        for r in incremental_dedup_pairs(spark, sf_dir).collect()
    }
    assert streamed == twin and twin


def test_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-running a batch (crash between the
    pairs write and the checkpoint commit) must not duplicate pairs or
    store signatures."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    dup = docs.limit(20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    process = make_batch_processor(
        store_path=str(tmp_path / "sig_store"),
        pairs_path=str(tmp_path / "pairs_out"),
        perms=8,
        bands=4,
    )
    process(docs, 0)
    process(dup, 1)

    def snapshot():
        pairs = sorted(
            (r["id_a"], r["id_b"])
            for r in spark.read.parquet(str(tmp_path / "pairs_out")).collect()
        )
        sigs = sorted(
            (r["doc_id"], r["batch_id"])
            for r in spark.read.parquet(str(tmp_path / "sig_store")).collect()
        )
        return pairs, sigs

    first = snapshot()
    assert first[0], "expected some near-dup pairs before replay"
    process(dup, 1)  # replay the last batch
    assert snapshot() == first

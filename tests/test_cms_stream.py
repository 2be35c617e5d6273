"""Streaming Count-Min heavy-hitter monitor: merged per-batch cells must be
BIT-EXACT equal to the one-shot sketch (counts sum), probes must match the
batch twin, and crash replay must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.streaming.cms_stream import (
    _cell_partials,
    make_cms_processor,
    merged_sketch,
    probe_heavy_hitters,
    start_cms_monitor,
)


def _tokens(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


def test_streaming_cms_matches_one_shot(spark, sf_dir, tmp_path):
    tok = _tokens(spark, sf_dir)
    mid = tok.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    src = str(tmp_path / "tok_in")
    tok.where(F.col("doc_id") <= mid).select("token").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    tok.where(F.col("doc_id") > mid).select("token").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("token string").option("maxFilesPerTrigger", 1).parquet(src)
    )
    store = str(tmp_path / "cms_store")
    q = start_cms_monitor(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {
        (r["r"], r["bucket"]): r["c"] for r in merged_sketch(spark, store).collect()
    }
    want = {
        (r["r"], r["bucket"]): r["c"]
        for r in _cell_partials(tok.select("token"), "token").collect()
    }
    assert got == want and len(got) > 0


def test_cms_probe_bounds_exact_counts(spark, sf_dir, tmp_path):
    tok = _tokens(spark, sf_dir).select("token").localCheckpoint()
    store = str(tmp_path / "store")
    make_cms_processor(store)(tok, 0)
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt")).where(
        F.col("exact_cnt") >= 50
    )
    rows = probe_heavy_hitters(spark, store, exact).collect()
    assert len(rows) > 0
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_cms_replay_is_idempotent(spark, sf_dir, tmp_path):
    tok = _tokens(spark, sf_dir).select("token").limit(2000).localCheckpoint()
    store = str(tmp_path / "store")
    process = make_cms_processor(store)
    process(tok, 0)
    snap = sorted(
        (r["r"], r["bucket"], r["c"]) for r in merged_sketch(spark, store).collect()
    )
    process(tok, 0)  # crash replay of the same batch
    again = sorted(
        (r["r"], r["bucket"], r["c"]) for r in merged_sketch(spark, store).collect()
    )
    assert again == snap

"""Incremental substring-overlap dedup over a document STREAM
(SURVEY §2.12 × §2.9 [extension]): the continuous form of the winnowing
fingerprint pairing (`plans/ext_demos.winnow_overlap_pairs`) for corpora
that arrive file-by-file — same `foreachBatch` + persisted-store +
replay-idempotence discipline as `streaming/dedup_stream.py` (see that
module's docstring for the exactly-once mechanics; they are identical
here: per-batch_id dynamic-partition overwrite, old-side reads filtered
to batch_id < current).

Per micro-batch B:
  1. winnowed fingerprint set of B's docs (same expressions as batch;
     the k-gram hash array is checkpointed once — md5-per-position
     would re-inline per reference),
  2. equi-join B's (doc, fp) rows against the store (new-vs-OLD) and
     against themselves (new-vs-NEW) on fingerprint VALUE,
  3. pairs sharing ≥ `min_shared` fingerprints → pairs sink,
  4. append B's fingerprint rows to the store.

A pair's shared-fingerprint count is exact across batches because each
document's fingerprint set is fixed at ingest (no cross-document state),
so the emitted pairs equal the one-shot batch pairing over the full
corpus — asserted by the stream==batch test.

Deliberate difference from the registered batch DEMO: the batch query
additionally drops fingerprints above a document-frequency cap
(boilerplate guard). That cap is RETROSPECTIVE — it needs the final
corpus-wide df — so the incremental form pairs on raw fingerprints and
leaves boilerplate suppression to a downstream compaction; the
stream==batch test compares against the uncapped batch pairing.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.ext.text import kgram_hashes, winnow_min_hashes
from scripts_toolkit_spark.materialize import materialize as _materialize

FP_SCHEMA = "doc_id bigint, fp bigint, batch_id bigint"


def _fingerprints(
    docs: DataFrame, text_col: str, id_col: str, k: int, window: int
) -> DataFrame:
    h = docs.select(
        F.col(id_col).alias("doc_id"), kgram_hashes(text_col, k).alias("h")
    ).transform(_materialize)
    return h.select(
        "doc_id", F.explode(winnow_min_hashes(F.col("h"), window)).alias("fp")
    )


def make_batch_processor(
    store_path: str,
    pairs_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 16,
    min_shared: int = 4,
):
    """Build the foreachBatch callable (exposed for the replay test)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        fps = _fingerprints(batch, text_col, id_col, k, window).transform(_materialize)

        try:
            store = spark.read.schema(FP_SCHEMA).parquet(store_path)
        except AnalysisException:  # first batch
            old = None
        else:
            old = store.where(F.col("batch_id") < F.lit(batch_id)).select(
                "doc_id", "fp"
            )

        n = fps.select(F.col("doc_id").alias("id_b"), "fp")
        nn = (
            fps.select(F.col("doc_id").alias("id_a"), "fp")
            .join(n, "fp")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cands = nn
        if old is not None:
            on = (
                old.select(F.col("doc_id").alias("id_o"), "fp")
                .join(n, "fp")
                .where(F.col("id_o") != F.col("id_b"))
                .select(
                    F.least("id_o", "id_b").alias("id_a"),
                    F.greatest("id_o", "id_b").alias("id_b"),
                )
            )
            cands = cands.unionByName(on)
        pairs = (
            cands.groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= min_shared)
        )
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairs_path)
        )
        (
            fps.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    return _process


def start_incremental_winnow(
    doc_stream: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 16,
    min_shared: int = 4,
):
    process = make_batch_processor(
        store_path,
        pairs_path,
        text_col=text_col,
        id_col=id_col,
        k=k,
        window=window,
        min_shared=min_shared,
    )
    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

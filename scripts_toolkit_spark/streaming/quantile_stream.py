"""Incremental quantile monitoring over a STREAM (the continuous form of
`plans/analytics6.quantile_sketch_values`): keep per-group quantile
estimates current while rows keep arriving, without rescanning history.

The bottom-k md5 sketch state is a PREFIX of the global priority order,
so per-batch states MERGE: bottomk(∪ batches) = re-prune(∪ per-batch
bottomk). That algebraic fact is the whole design (the same shape as the
CMS monitor, whose cells sum — here states union + re-prune):

  per batch:  bottom-k sample of the batch per group (two-stage
              grouped_topk — k rows per (input partition, group), no
              per-group single-task window) → ≤ k·|groups| rows written
              as a batch_id store partition (dynamic-partition
              OVERWRITE — replay-idempotent, the repo-wide
              streaming-store discipline)
  at read:    union every batch's partial and re-prune to k per group —
              KB-scale however long the stream ran — then answer ANY
              quantile from the merged sample's order statistics.

The store grows by ≤ k·|groups| rows per micro-batch and the read-side
merge never touches raw history. The merged state is IDENTICAL to the
one-shot sketch over the concatenated batches (pinned by
tests/test_quantiles.py::test_stream_quantile_state_matches_batch), so
the registered batch twin's oracle is the one-shot SQL replay — equality
proves the incremental merge, not just the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from scripts_toolkit_spark.ext.quantiles import (
    bottomk_sample,
    merge_bottomk,
    sample_quantiles,
)


def make_quantile_processor(
    store_path: str,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int = 256,
):
    """foreachBatch callable writing this batch's ≤ k·|groups| sample rows
    as a batch_id partition (overwrite ⇒ crash replay rewrites, never
    adds)."""
    from pyspark.sql import functions as F

    def _process(batch: DataFrame, batch_id: int) -> None:
        (
            bottomk_sample(batch, group_cols, value_col, key_col, k)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    return _process


def start_quantile_monitor(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int = 256,
):
    return (
        stream.writeStream.foreachBatch(
            make_quantile_processor(store_path, group_cols, value_col, key_col, k)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def merged_state(
    spark: SparkSession,
    store_path: str,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Union every batch partial and re-prune to the k smallest priorities
    per group — identical to the one-shot sketch over all batches."""
    parts = spark.read.parquet(store_path).drop("batch_id")
    return merge_bottomk([parts], group_cols, value_col, k)


def merged_quantiles(
    spark: SparkSession,
    store_path: str,
    group_cols: list[str],
    value_col: str,
    qs: dict[str, float],
    k: int = 256,
) -> DataFrame:
    """Per-group quantile estimates from the merged stream state."""
    return sample_quantiles(
        merged_state(spark, store_path, group_cols, value_col, k),
        group_cols,
        value_col,
        qs,
    )

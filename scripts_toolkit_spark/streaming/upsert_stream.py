"""Incremental CDC upsert maintenance over a changelog STREAM
(SURVEY §2.9 [extension]): the continuous form of
`operators/spans.apply_changelog` — keep a queryable latest-state table
while insert/update/delete events keep arriving.

Shape: `foreachBatch` writing a LOG-STRUCTURED state store — the plan a
lakehouse MERGE compiles to, minus the table format:

    per micro-batch B:
      1. reduce B to its last row per key (window over the caller's total
         order), KEEPING delete rows — a later batch must know the key
         died;
      2. append that per-key delta as the store partition `batch_id=B`
         (dynamic-partition OVERWRITE → replay-idempotent, same discipline
         as `dedup_stream`).

Reads merge at query time: `current_state` applies latest-wins across the
delta partitions ordered by (batch_id, caller order) and drops keys whose
last operation is a delete — provably equal to running
`apply_changelog` over the full history in one shot (stream==batch test).
`compact` folds the merged state back into a single base partition and is
safe to run between batches; reads after compaction see identical state.

Scale: each micro-batch shuffles only ITS OWN rows (one window over the
batch); the store is append-only parquet partitioned by batch_id, so the
read-side merge prunes to `batch_id` ranges and the periodic `compact`
bounds read amplification exactly like lakehouse log compaction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from scripts_toolkit_spark.materialize import materialize as _materialize


def _batch_delta(batch: DataFrame, key: str, op: Column, order_by: list[str]) -> DataFrame:
    """Last row per key within the batch (deletes kept — they are state)."""
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_by])
    return (
        batch.select("*", op.alias("op"), F.row_number().over(w).alias("__rn"))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def make_upsert_processor(store_path: str, key: str, op: Column, order_by: list[str]):
    """foreachBatch callable; exposed for the replay-idempotency test."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        (
            _batch_delta(batch, key, op, order_by)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    return _process


def start_cdc_upsert(
    changelog_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    key: str,
    op: Column,
    order_by: list[str],
):
    """Maintain the latest-state store from a streaming changelog
    (availableNow trigger; callers drive with awaitTermination)."""
    process = make_upsert_processor(store_path, key, op, order_by)
    return (
        changelog_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def current_state(
    spark: SparkSession,
    store_path: str,
    key: str,
    order_by: list[str],
    delete_op: str = "D",
) -> DataFrame:
    """Merge the delta log into the current latest state: latest-wins per
    key across (batch_id, order), deletes drop the key. Column surface
    matches `apply_changelog`: original columns + n_ops is NOT preserved
    (per-key op counts live in the log, not the state) — callers needing
    lineage aggregate the log directly."""
    log = spark.read.parquet(store_path)
    w = Window.partitionBy(key).orderBy(
        F.desc("batch_id"), *[F.desc(c) for c in order_by]
    )
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("op") != delete_op))
        .withColumnRenamed("op", "last_op")
        .drop("__rn", "batch_id")
    )


def state_as_of(
    spark: SparkSession,
    store_path: str,
    key: str,
    order_by: list[str],
    as_of_batch: int,
    delete_op: str = "D",
) -> DataFrame:
    """TIME TRAVEL: the latest state as it stood after batch
    `as_of_batch` committed — the same latest-wins merge as
    `current_state`, restricted to log partitions `batch_id ≤ as_of`.
    The filter is on the PARTITION column, so the scan prunes to the
    as-of prefix (no read amplification from later batches). Provably
    equal to `apply_changelog` over the event prefix (pytest).

    Horizon caveat (the lakehouse VACUUM trade): `compact(up_to)` folds
    history below `up_to` into one partition, so as-of reads BELOW a
    compaction point are no longer available — reads at or above it are
    unchanged (pytest-pinned)."""
    log = spark.read.parquet(store_path).where(F.col("batch_id") <= F.lit(as_of_batch))
    w = Window.partitionBy(key).orderBy(
        F.desc("batch_id"), *[F.desc(c) for c in order_by]
    )
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("op") != delete_op))
        .withColumnRenamed("op", "last_op")
        .drop("__rn", "batch_id")
    )


def compact(
    spark: SparkSession,
    store_path: str,
    key: str,
    order_by: list[str],
    up_to_batch: int,
) -> None:
    """Fold partitions batch_id ≤ `up_to_batch` into one base partition
    (batch_id = `up_to_batch`), keeping each key's last row INCLUDING
    deletes (a delete must keep masking older base rows). Two-phase like
    lakehouse compaction: write the folded partition, then drop the
    now-redundant older partitions."""
    import shutil
    from pathlib import Path

    log = spark.read.parquet(store_path).where(F.col("batch_id") <= up_to_batch)
    w = Window.partitionBy(key).orderBy(
        F.desc("batch_id"), *[F.desc(c) for c in order_by]
    )
    folded = (
        log.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("batch_id", F.lit(up_to_batch))
        .transform(_materialize)  # materialize BEFORE overwriting the partition read from
    )
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_path)
    )
    for p in Path(store_path).glob("batch_id=*"):
        bid = int(p.name.split("=", 1)[1])
        if bid < up_to_batch:
            shutil.rmtree(p)

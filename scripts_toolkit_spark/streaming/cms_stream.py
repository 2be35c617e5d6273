"""Incremental heavy-hitter monitoring over a STREAM (the continuous form
of `plans/corpus_demos.cms_heavy_hitters`): keep a Count-Min frequency
sketch current while documents keep arriving, without rescanning history.

CMS cells are COUNTS, and counts sum — the merge of per-batch sketches is
therefore BIT-EXACT equal to the one-shot sketch over the concatenated
batches (stronger than HLL's bit-exact register MAX: here even the
estimates are identical, not just the merged state). That algebraic fact
is the whole design:

  per batch:  explode tokens → (row, bucket) md5 keys → ONE hash aggregate
              → ≤ D·W cell rows, written as a batch_id store partition
              (dynamic-partition OVERWRITE — replay-idempotent, the
              repo-wide streaming-store discipline)
  at read:    SUM cells per (row, bucket) — KB-scale however long the
              stream ran — then probe with a candidate list: est = MIN
              over the D rows of the candidate's bucket counters.

The monitor stores ONLY the sketch (≤ D·W rows per batch). Candidates come
from the caller (a watchlist, or an exact pass when one is affordable) —
a CMS cannot enumerate keys, and pretending otherwise would hide a
full-vocabulary shuffle inside a "sketch". At 100 TB the store grows by
~KBs per micro-batch while the probe never touches history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CMS_W = 256  # buckets per hash row (matches the batch twin)
CMS_D = 4  # hash rows

CELL_SCHEMA = "r int, bucket long, c bigint, batch_id bigint"


def cms_bucket(r: int, token: F.Column) -> F.Column:
    """md5-keyed bucket for hash row `r` — identical literal recipe to the
    batch twin (plans/corpus_demos._cms_bucket) and its DuckDB oracle."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{r}|"), token)), 1, 8), 16, 10).cast("long")
        % CMS_W
    )


def _cell_partials(batch: DataFrame, token_col: str) -> DataFrame:
    keys = F.array(
        *[
            F.struct(F.lit(r).cast("int").alias("r"), cms_bucket(r, F.col(token_col)).alias("bucket"))
            for r in range(CMS_D)
        ]
    )
    return (
        batch.select(F.explode(keys).alias("k"))
        .select(F.col("k.r").alias("r"), F.col("k.bucket").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def make_cms_processor(store_path: str, token_col: str = "token"):
    """foreachBatch callable writing this batch's ≤ D·W sketch-cell rows as
    a batch_id partition (overwrite ⇒ crash replay rewrites, never adds)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        (
            _cell_partials(batch, token_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    return _process


def start_cms_monitor(stream: DataFrame, store_path: str, checkpoint: str, token_col: str = "token"):
    return (
        stream.writeStream.foreachBatch(make_cms_processor(store_path, token_col))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def merged_sketch(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold every batch's cells: SUM per (row, bucket). Counts sum, so this
    equals the one-shot sketch over all batches bit-for-bit."""
    return (
        spark.read.schema(CELL_SCHEMA)
        .parquet(store_path)
        .groupBy("r", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def probe_heavy_hitters(
    spark: SparkSession, store_path: str, candidates: DataFrame, token_col: str = "token"
) -> DataFrame:
    """Estimate each candidate token's stream-lifetime count from the
    merged sketch: est = MIN over the D rows of its bucket counters
    (CMS guarantee: est ≥ true count; equality when collision-free).
    Extra candidate columns pass through. Equi-join on (r, bucket) against
    the ≤ D·W-row merged frame — AQE broadcasts it."""
    sketch = merged_sketch(spark, store_path)
    keys = F.array(
        *[
            F.struct(F.lit(r).cast("int").alias("r"), cms_bucket(r, F.col(token_col)).alias("bucket"))
            for r in range(CMS_D)
        ]
    )
    keyed = candidates.select("*", F.explode(keys).alias("k")).select(
        "*", F.col("k.r").alias("r"), F.col("k.bucket").alias("bucket")
    ).drop("k")
    group_cols = [c for c in candidates.columns]
    return (
        keyed.join(sketch, ["r", "bucket"])
        .groupBy(*group_cols)
        .agg(F.min("c").alias("cms_est"))
    )

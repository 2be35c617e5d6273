"""Incremental data-quality monitoring over a STREAM (the continuous form
of `operators/checks.quality_report`): keep completeness / bounds /
cardinality metrics current while events keep arriving, without ever
rescanning history.

The trick is restricting the suite to ALGEBRAIC metrics — ones with
mergeable partials:

    counts / non-null counts  → partials sum
    sum (DECIMAL)             → partials sum exactly (order-independent)
    min / max                 → partials min/max
    distinct cardinality      → deterministic-HLL register partials
                                (reg → max rho), merged by MAX — the merge
                                is associative+commutative, so the merged
                                estimate is BIT-EQUAL to the one-shot
                                batch sketch (asserted in test_dq_stream)

Each micro-batch appends its partial rows as store partitions keyed by
batch_id (dynamic-partition OVERWRITE — replay-idempotent, the
`dedup_stream` discipline). `current_metrics` folds all partials at read
time: a KB-scale aggregate however long the stream has run, since the
store grows by ONE scalar row + ≤64 register rows per batch (and batches
can be compacted by the same fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HLL_M = 64

SCALAR_SCHEMA = (
    "n_rows bigint, n_value bigint, v_sum decimal(28,2), "
    "v_min double, v_max double, batch_id bigint"
)
HLL_SCHEMA = "reg int, mx int, batch_id bigint"


def _hll_parts(col: str):
    h = F.md5(F.col(col).cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % HLL_M
    w = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")
    rho = F.when(w > 0, F.lit(49) - F.length(F.bin(w))).otherwise(F.lit(49))
    return reg, rho


def make_dq_processor(store_path: str, value_col: str = "value", id_col: str = "user_id"):
    """foreachBatch callable writing this batch's metric partials."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        scalar = batch.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(value_col).alias("n_value"),
            F.sum(F.col(value_col).cast("decimal(12,2)")).cast("decimal(28,2)").alias("v_sum"),
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
        ).withColumn("batch_id", F.lit(batch_id))
        (
            scalar.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path + "/scalar")
        )
        reg, rho = _hll_parts(id_col)
        regs = (
            batch.select(reg.alias("reg"), rho.alias("rho"))
            .groupBy("reg")
            .agg(F.max("rho").cast("int").alias("mx"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        (
            regs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path + "/hll")
        )

    return _process


def start_dq_monitor(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    value_col: str = "value",
    id_col: str = "user_id",
):
    process = make_dq_processor(store_path, value_col, id_col)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def current_metrics(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold every batch's partials into the current metric row:
    (n_rows, value_completeness, value_sum, value_min, value_max,
    distinct_est). Identical to running the same aggregates over the full
    history in one shot — exactly for the scalar metrics, bit-exactly for
    the HLL estimate (register MAX is associative)."""
    scalar = (
        spark.read.schema(SCALAR_SCHEMA)
        .parquet(store_path + "/scalar")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_value").alias("n_value"),
            F.sum("v_sum").cast("decimal(28,2)").alias("v_sum"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )
    )
    merged = (
        spark.read.schema(HLL_SCHEMA)
        .parquet(store_path + "/hll")
        .groupBy("reg")
        .agg(F.max("mx").alias("mx"))
    )
    sketch = merged.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s_hit"),
        F.count(F.lit(1)).alias("n_hit"),
    )
    est = (
        F.lit(0.709)
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        / (F.col("s_hit") + (F.lit(float(HLL_M)) - F.col("n_hit")))
    )
    return scalar.crossJoin(sketch).select(
        "n_rows",
        (F.col("n_value").cast("double") / F.col("n_rows").cast("double")).alias(
            "value_completeness"
        ),
        F.col("v_sum").cast("double").alias("value_sum"),
        "v_min",
        "v_max",
        est.alias("distinct_est"),
    )

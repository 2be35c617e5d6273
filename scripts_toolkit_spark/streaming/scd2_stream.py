"""Incremental SCD2 interval maintenance over a STREAM — the continuous
form of `operators/spans.scd2_intervals`: keep per-key validity intervals
current while snapshot/event rows keep arriving, closing a run only when
a later row changes the attribute.

State model (foreachBatch, the `upsert_stream` discipline):
  closed/batch_id=B : runs CLOSED by batch B (append-only, immutable)
  open/batch_id=B   : the full OPEN-run snapshot AFTER batch B (one row
                      per key ever seen — the minimal state SCD2 needs)
Both written with dynamic-partition OVERWRITE and the open snapshot read
from the LATEST batch_id < current, so a crash-replayed batch rebuilds
exactly its own partitions (idempotent).

Per micro-batch:
  1. reduce the batch to per-key runs (`scd2_intervals` on the batch);
  2. merge each key's FIRST batch run with its open run: same attribute →
     absorb (extend valid_to, add n_rows); different → the open run
     closes as-is;
  3. every batch run except the last closes; the last (post-merge)
     becomes the new open run; keys absent from the batch carry their
     open run forward.

Assumes per-key time-monotone arrival (each batch's rows for a key are
not older than previously seen ones — the standard ordered-CDC
assumption; a watermark + sort feeding this satisfies it).
`current_intervals` = closed ∪ open with versions renumbered per key by
valid_from — provably equal to one-shot `scd2_intervals` over the full
history (stream==batch test)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scripts_toolkit_spark.operators.spans import scd2_intervals
from scripts_toolkit_spark.materialize import materialize as _materialize

_RUN_FIELDS = ("attr", "valid_from", "valid_to", "n_rows")


def _latest_open(spark: SparkSession, store_path: str, before_batch: int, schema: str):
    from pyspark.errors import AnalysisException

    try:
        snap = spark.read.schema(schema).parquet(store_path + "/open")
    except AnalysisException:
        return None
    snap = snap.where(F.col("batch_id") < before_batch)
    mx = snap.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    if mx is None:
        return None
    return snap.where(F.col("batch_id") == mx).drop("batch_id")


def make_scd2_processor(
    store_path: str,
    key: str,
    attr: Column | str,
    order_by: list[str],
    ts: str,
    key_type: str = "bigint",
    attr_type: str = "string",
    ts_type: str = "timestamp_ntz",
):
    """foreachBatch callable; exposed for the replay-idempotency test."""
    open_schema = (
        f"{key} {key_type}, attr {attr_type}, valid_from {ts_type}, "
        f"valid_to {ts_type}, n_rows bigint, batch_id bigint"
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        runs = scd2_intervals(batch, key, attr, order_by, ts).transform(_materialize)
        wk = Window.partitionBy(key)
        runs = runs.withColumn("__maxv", F.max("version").over(wk))
        prev = _latest_open(spark, store_path, batch_id, open_schema)

        first = runs.where(F.col("version") == 1)
        if prev is not None:
            po = prev.select(
                key,
                *[F.col(c).alias(f"p_{c}") for c in _RUN_FIELDS],
            )
            first = first.join(po, key, "left")
            absorb = F.col("p_attr").isNotNull() & (
                F.col("p_attr").eqNullSafe(F.col("attr"))
            )
            # open runs that close because the key reappears with a NEW attr
            closed_prev = (
                first.where(F.col("p_attr").isNotNull() & ~absorb)
                .select(
                    key,
                    F.col("p_attr").alias("attr"),
                    F.col("p_valid_from").alias("valid_from"),
                    F.col("p_valid_to").alias("valid_to"),
                    F.col("p_n_rows").alias("n_rows"),
                )
            )
            merged_first = first.select(
                key,
                "version",
                "__maxv",
                "attr",
                F.when(absorb, F.col("p_valid_from")).otherwise(F.col("valid_from")).alias(
                    "valid_from"
                ),
                "valid_to",
                (
                    F.col("n_rows")
                    + F.when(absorb, F.col("p_n_rows")).otherwise(F.lit(0))
                ).alias("n_rows"),
            )
            carried = prev.join(runs.select(key).distinct(), key, "left_anti")
        else:
            closed_prev = None
            merged_first = first.select(
                key, "version", "__maxv", "attr", "valid_from", "valid_to", "n_rows"
            )
            carried = None

        all_runs = merged_first.unionByName(
            runs.where(F.col("version") > 1).select(
                key, "version", "__maxv", "attr", "valid_from", "valid_to", "n_rows"
            )
        )
        closed_now = all_runs.where(F.col("version") < F.col("__maxv")).select(
            key, *_RUN_FIELDS
        )
        if closed_prev is not None:
            closed_now = closed_now.unionByName(closed_prev)
        new_open = all_runs.where(F.col("version") == F.col("__maxv")).select(
            key, *_RUN_FIELDS
        )
        if carried is not None:
            new_open = new_open.unionByName(carried.select(key, *_RUN_FIELDS))

        for frame, sub in ((closed_now, "/closed"), (new_open, "/open")):
            (
                frame.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(store_path + sub)
            )

    return _process


def start_scd2_stream(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    key: str,
    attr: Column | str,
    order_by: list[str],
    ts: str,
    **schema_kw,
):
    process = make_scd2_processor(store_path, key, attr, order_by, ts, **schema_kw)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def current_intervals(spark: SparkSession, store_path: str, key: str) -> DataFrame:
    """closed ∪ latest open snapshot, versions renumbered per key by
    valid_from — the same surface as the batch `scd2_intervals`."""
    from pyspark.errors import AnalysisException

    open_all = spark.read.parquet(store_path + "/open")
    mx = open_all.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    frames = [open_all.where(F.col("batch_id") == mx).drop("batch_id")]
    try:
        frames.append(spark.read.parquet(store_path + "/closed").drop("batch_id"))
    except AnalysisException:
        pass
    allr = frames[0] if len(frames) == 1 else frames[0].unionByName(frames[1])
    w = Window.partitionBy(key).orderBy("valid_from", "valid_to")
    return allr.withColumn("version", F.row_number().over(w).cast("bigint"))

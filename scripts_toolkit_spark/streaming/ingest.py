"""Streaming ingest into the partitioned EAV store (SURVEY §2.9 T4 /
§3.2 [extension]): the continuous form of the batch wide→EAV conversion.

Batch pipeline: decode → profile → melt → `write_eav` (one overwrite).
At fleet scale new wide files LAND CONTINUOUSLY (a quarterly drop per
institution); this module ingests them incrementally:

    readStream(schema’d parquet dir)
      → melt_to_eav (same vectorized unpivot as batch — stateless, so the
        streaming plan is identical and needs no watermark)
      → writeStream parquet sink, partitioned by quarter, exactly-once via
        the checkpoint's file-sink log.

The sink guarantees end-to-end exactly-once for file sources → file sinks
(offsets + committed-file manifest in the checkpoint), which is the
property a 100 TB ingest needs across restarts: re-running after a crash
neither drops nor duplicates observations. Readers get per-quarter
partition pruning exactly as with the batch `write_eav` store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from scripts_toolkit_spark.operators.reshape import melt_to_eav


def read_wide_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File stream of wide matrices (schema explicit — streaming sources
    must not infer; new files are discovered per micro-batch)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_wide_to_eav(
    wide_stream: DataFrame,
    type_map: dict[str, str],
    quarter: int,
    id_col: str = "rssd",
) -> DataFrame:
    """The SAME melt as batch (operators/reshape.melt_to_eav): stateless
    narrow transformation, so batch backfill and live stream produce
    identical rows — the reprocessing-consistency property. The type plan
    comes from a batch profile pass over history (profile_types); a
    streaming query cannot (and should not) re-profile per micro-batch."""
    return melt_to_eav(wide_stream, type_map, quarter, id_col=id_col)


def start_eav_sink(
    eav_stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Exactly-once parquet sink partitioned by quarter. `available_now`
    processes the current backlog then stops (backfill / test harness);
    pass False for a continuously-running ingest."""
    writer = (
        eav_stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("quarter")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

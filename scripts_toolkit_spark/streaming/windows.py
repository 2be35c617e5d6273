"""Structured Streaming generalization of the ordered/stateful operators
(SURVEY.md §2.9 T4 [extension]).

The batch span scan (operators/spans.py) is order-dependent within a key;
the streaming equivalents below use event-time semantics instead:

- tumbling / sliding window aggregates with watermarks for late data,
- session windows (`F.session_window`) — the streaming form of gap-based
  sessionization (operators/spans.sessionize),

Both use the SAME aggregate expressions as their batch twins, so a batch
backfill over historical parquet and the live stream produce consistent
results — the property a 100 TB pipeline needs for reprocessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-based stream over a parquet directory (the 100 TB-friendly
    pattern: new files land per micro-batch; schema is explicit — streaming
    sources must not infer)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, ts: str = "ts", width: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event_type with a watermark bounding state
    for late data. Works identically over a batch DataFrame (no watermark
    needed there)."""
    df = events.withWatermark(ts, watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window(ts, width).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def session_stats(events: DataFrame, ts: str = "ts", gap: str = "1 hour",
                  watermark: str = "2 hours") -> DataFrame:
    """Session-window stats per user: merges events closer than `gap`.
    Streaming state is bounded by the watermark; in batch this computes the
    same sessions over the full history."""
    df = events.withWatermark(ts, watermark) if events.isStreaming else events
    return (
        df.groupBy(F.session_window(ts, gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(events: DataFrame, keys: list[str], ts: str = "ts",
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: one row per key within the watermark horizon.

    Uses `dropDuplicatesWithinWatermark` on the streaming path: plain
    `dropDuplicates` only evicts state when the event-time column is part
    of the dedup key — with a bare business key its state grows UNBOUNDED
    on a real stream. WithinWatermark evicts each key's state once the
    watermark passes its first-seen event time, which is what makes exact
    dedup feasible on an unbounded stream (duplicates arriving farther
    apart than the watermark delay are treated as new — the standard
    bounded-state trade). Batch twin: plain dropDuplicates over the full
    history."""
    if events.isStreaming:
        return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark([*keys])
    return events.dropDuplicates([*keys])


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming aggregate into an in-memory table with
    availableNow (process-everything-then-stop) — the offline test harness
    for streaming plans."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q

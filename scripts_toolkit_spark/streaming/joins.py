"""Stream-stream interval join (SURVEY.md §2.9 T4 [extension]).

Joins two unbounded streams on an equi-key plus an event-time interval —
the streaming generalization of the batch as-of/range joins
(operators/joins.py). Both sides carry watermarks so the join state is
bounded: a purchase can only match clicks within the interval, so click
state older than (watermark + interval) is evicted.

Batch twin: the identical join expression over static DataFrames — the
consistency property tested in tests/test_stream_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_recent_clicks(
    purchases: DataFrame,
    clicks: DataFrame,
    max_lag: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Each purchase joined to all clicks by the same user within the
    preceding `max_lag` window (inclusive bounds). Streaming inputs must
    both be watermarked; the same expression runs unchanged over batch
    inputs."""
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (p["user_id"] == c["c_user_id"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {max_lag}"))
        & (c["click_ts"] <= p["purchase_ts"])
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "user_id", "purchase_ts", "purchase_value", "click_id", "click_ts"
    )

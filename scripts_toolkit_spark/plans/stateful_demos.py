"""Driver-contract demonstrations of ordered/stateful operators (§2.9, §2.10).

All run over `events` (the driver's ordered stream table). Timestamps are
compared as-is (µs precision on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators.spans import fill_forward, sessionize
from scripts_toolkit_spark.streaming.windows import session_stats, tumbling_counts


def fill_forward_signup_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 fill-forward: each event carries the value of the user's most
    recent signup event (the span scan's page_name/title/mdrm pattern)."""
    ev = load_table(spark, sf_dir, "events")
    marker = F.when(F.col("event_type") == "signup", F.col("value"))
    out = fill_forward(ev, marker, ["ts", "event_id"], ["user_id"], out="last_signup_value")
    return out.select("event_id", "user_id", "last_signup_value")


FILL_FORWARD_SIGNUP_VALUE_SQL = """
SELECT event_id, user_id,
  last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_value
FROM events
"""


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T3 gap-based sessionization (running sum of boundary flags) +
    per-session record emission."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "ts", "user_id", "INTERVAL 1 HOUR")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


USER_SESSIONS_SQL = """
WITH flagged AS (
  SELECT *,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 1 HOUR
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT *,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  COUNT(*) AS n_events,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""


def tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 tumbling window (batch form of the streaming aggregate — same
    expression runs under readStream with a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev, "ts", "1 hour")


TUMBLING_EVENT_COUNTS_SQL = """
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
  event_type,
  COUNT(*) AS n
FROM events
GROUP BY 1, 2, 3
"""


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 session windows (`F.session_window`, batch form): merge each
    user's events closer than 1 hour; same operator streams with state."""
    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, "ts", "1 hour")


# Session windows end at last_event + gap (Spark's session_window contract);
# sessions with one event span exactly [ts, ts+gap).
SESSION_WINDOW_STATS_SQL = """
WITH flagged AS (
  SELECT *,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts >= lag(ts) OVER w + INTERVAL 1 HOUR
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT *,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 1 HOUR AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""

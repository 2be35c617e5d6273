"""Event-analytics shapes over the events stream: cohort retention and
conversion funnel — the two aggregate patterns every product-analytics
pipeline runs, expressed as plain grouped aggregates (no window, no join
explosion; both shuffle only on user_id then on the tiny cohort key).

Timestamps ride the catalog loader's UTC pin (CLAUDE.md: events.parquet
is TIMESTAMP(NANOS)); date truncation is therefore identical in Spark
(UTC session) and DuckDB (naive timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort retention: users grouped by first-seen day, counted on
    each later active day (offset ≤ 7). Two grouped aggregates: per-user
    first day (map-side combinable MIN), then per (cohort, offset) counts
    over the distinct (user, day) activity set."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    activity = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    return (
        activity.join(first, "user_id")
        .select("cohort_day", F.datediff("d", "cohort_day").alias("day_offset"))
        .where(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


USER_RETENTION_COHORTS_SQL = """
WITH first AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, d) AS INT) AS day_offset,
       COUNT(*) AS n_users
FROM activity JOIN first USING (user_id)
WHERE date_diff('day', cohort_day, d) <= 7
GROUP BY cohort_day, date_diff('day', cohort_day, d)
"""


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered view→click→purchase funnel on FIRST event times:
    one conditional-MIN aggregate per user (single shuffle on user_id),
    then one global count row — the decorrelated form of three correlated
    EXISTS subqueries."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("t_view") < F.col("t_click"), 1)).alias("n_view_then_click"),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).alias("n_full_funnel"),
    )


CONVERSION_FUNNEL_SQL = """
WITH f AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
       COUNT(CASE WHEN t_view < t_click THEN 1 END) AS n_view_then_click,
       COUNT(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 END) AS n_full_funnel
FROM f
"""

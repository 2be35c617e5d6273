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


def scd2_event_type_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 interval build (operators/spans.scd2_intervals): collapse
    each user's ordered event stream into one row per run of an unchanged
    event_type — the snapshot→validity-interval shape every warehouse
    dimension load runs. One shuffle on user_id + one sort, then a
    map-side-combinable aggregate; (ts, event_id) is a total order so the
    result is deterministic."""
    from scripts_toolkit_spark.operators.spans import scd2_intervals

    ev = load_table(spark, sf_dir, "events")
    out = scd2_intervals(ev, "user_id", F.col("event_type"), ["ts", "event_id"], "ts")
    return out.select(
        "user_id",
        F.col("version").cast("int").alias("version"),
        F.col("attr").alias("event_type"),
        "valid_from",
        "valid_to",
        "n_rows",
    )


SCD2_EVENT_TYPE_INTERVALS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN event_type IS DISTINCT FROM
              lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         THEN 1 ELSE 0 END AS chg
  FROM events
),
runs AS (
  SELECT user_id, event_type, ts,
    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS version
  FROM ordered
)
SELECT user_id, CAST(version AS INT) AS version, event_type,
  MIN(ts) AS valid_from, MAX(ts) AS valid_to, COUNT(*) AS n_rows
FROM runs
GROUP BY user_id, version, event_type
"""


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply (operators/spans.apply_changelog): events map to
    insert/update/delete ops (signup→I, error→D, else U); latest-wins per
    user, deleted users vanish — the MERGE INTO / upsert compaction every
    lakehouse ingestion runs, as one window pass + filter."""
    from scripts_toolkit_spark.operators.spans import apply_changelog

    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    st = apply_changelog(ev, "user_id", op, ["ts", "event_id"])
    return st.select(
        "user_id",
        "last_op",
        F.col("event_type").alias("last_type"),
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
        "n_ops",
    )


CDC_LATEST_STATE_SQL = """
WITH oplog AS (
  SELECT *,
    CASE WHEN event_type = 'signup' THEN 'I'
         WHEN event_type = 'error' THEN 'D'
         ELSE 'U' END AS op
  FROM events
),
ranked AS (
  SELECT user_id, op, event_type, ts, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
    COUNT(*) OVER (PARTITION BY user_id) AS n_ops
  FROM oplog
)
SELECT user_id, op AS last_op, event_type AS last_type, ts AS last_ts,
  value AS last_value, n_ops
FROM ranked
WHERE rn = 1 AND op <> 'D'
"""


def event_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite (the SQL:2016 row-pattern feature Spark
    lacks): encode each user's ordered event stream as a symbol string
    (one char per event), then count row patterns with ordinary regexes —
    'c+p' (one-or-more clicks immediately followed by a purchase) and
    'ep' (purchase right after an error). One shuffle on user_id, the
    per-user sequence built by sorting collected (ts, event_id) structs
    (deterministic total order); regex scanning is per-row native. Keeps
    users with ≥ 1 click-run conversion so the result is non-degenerate
    at every SF."""
    ev = load_table(spark, sf_dir, "events")
    sym = F.substring("event_type", 1, 1)  # s/c/e/v/p — initials are unique
    seq = (
        ev.select("user_id", F.struct("ts", "event_id", sym.alias("sym")).alias("r"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("r")), lambda s: s["sym"]), ""
            ).alias("seq")
        )
    )
    out = seq.select(
        "user_id",
        F.length("seq").alias("seq_len"),
        F.regexp_count("seq", F.lit("c+p")).alias("click_runs_to_purchase"),
        F.regexp_count("seq", F.lit("ep")).alias("purchase_after_error"),
    )
    return out.where(F.col("click_runs_to_purchase") >= 1)


EVENT_PATTERN_MATCHES_SQL = """
WITH seq AS (
  SELECT user_id,
    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
  CAST(len(seq) AS INT) AS seq_len,
  CAST(len(regexp_extract_all(seq, 'c+p')) AS INT) AS click_runs_to_purchase,
  CAST(len(regexp_extract_all(seq, 'ep')) AS INT) AS purchase_after_error
FROM seq
WHERE len(regexp_extract_all(seq, 'c+p')) >= 1
"""


def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    consecutive (current → next) pairs via lag over the per-user order
    window, transition counts, and P(next | current) as an exact-count
    division rounded 6 dp — the behavioral-model summary a product
    pipeline feeds into simulation or anomaly scoring. One shuffle + one
    sort, then a 25-row aggregate."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("cur"), F.col("event_type").alias("nxt")
    ).where(F.col("cur").isNotNull())
    counts = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return counts.join(totals, "cur").select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_cur").cast("double"), 6).alias("p"),
    )


MARKOV_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cur,
         event_type AS nxt
  FROM events
),
counts AS (
  SELECT cur, nxt, COUNT(*) AS n FROM pairs WHERE cur IS NOT NULL GROUP BY cur, nxt
),
totals AS (
  SELECT cur, CAST(SUM(n) AS BIGINT) AS n_cur FROM counts GROUP BY cur
)
SELECT c.cur, c.nxt, c.n, round(CAST(c.n AS DOUBLE) / CAST(t.n_cur AS DOUBLE), 6) AS p
FROM counts c JOIN totals t ON c.cur = t.cur
"""


def time_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-event analytics: per signup, the NEXT purchase by the same
    user (the forward as-of join), then conversion-latency summary —
    conversion rate and exact latency percentiles (seconds, 6-dp-rounded
    before output). The same union-scan as-of machinery that answers
    backward attribution answers survival-style questions run forward."""
    from scripts_toolkit_spark.operators import joins as J

    ev = load_table(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_event_id")
    )
    matched = J.asof_join(
        signups,
        purchases,
        key="user_id",
        right_cols=("p_event_id",),
        direction="forward",
    )
    # the matched timestamp itself is not emitted by asof_join; recover the
    # latency by joining the purchase row back on its id (skinny equi-join)
    lat = (
        matched.where(F.col("p_event_id_asof").isNotNull())
        .join(
            purchases.select(
                F.col("p_event_id").alias("p_event_id_asof"), F.col("ts").alias("p_ts")
            ),
            "p_event_id_asof",
        )
        .select(
            (
                F.unix_micros(F.col("p_ts").cast("timestamp"))
                - F.unix_micros(F.col("ts").cast("timestamp"))
            ).alias("lat_us")
        )
    )
    n_signups = signups.count()
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.lit(n_signups).cast("long").alias("n_signups"),
        F.round(F.count(F.lit(1)).cast("double") / F.lit(float(n_signups)), 6).alias(
            "conversion_rate"
        ),
        F.round(F.percentile(F.col("lat_us").cast("double") / F.lit(1000000.0), F.lit(0.5)), 6).alias(
            "p50_seconds"
        ),
        F.round(F.percentile(F.col("lat_us").cast("double") / F.lit(1000000.0), F.lit(0.9)), 6).alias(
            "p90_seconds"
        ),
    )


TIME_TO_FIRST_PURCHASE_SQL = """
WITH signups AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
),
purchases AS (
  SELECT user_id, ts, event_id AS p_event_id FROM events WHERE event_type = 'purchase'
),
matched AS (
  SELECT s.event_id, s.ts AS s_ts, p.ts AS p_ts
  FROM signups s
  ASOF LEFT JOIN purchases p ON s.user_id = p.user_id AND s.ts <= p.ts
),
lat AS (
  SELECT (epoch_us(p_ts) - epoch_us(s_ts)) / 1000000.0 AS lat_s
  FROM matched WHERE p_ts IS NOT NULL
)
SELECT COUNT(*) AS n_converted,
  (SELECT COUNT(*) FROM signups) AS n_signups,
  round(CAST(COUNT(*) AS DOUBLE) / CAST((SELECT COUNT(*) FROM signups) AS DOUBLE), 6)
    AS conversion_rate,
  round(quantile_cont(lat_s, 0.5), 6) AS p50_seconds,
  round(quantile_cont(lat_s, 0.9), 6) AS p90_seconds
FROM lat
"""


def windowed_topk_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per 6-hour bucket: the time-windowed leaderboard shape
    (rank window PARTITIONED by the bucket — embarrassingly parallel, no
    global sort). Bucket = epoch-microseconds floor-divided by the window
    span (identical integer arithmetic in both engines on the UTC-pinned
    NTZ timestamps)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    span_us = 6 * 3600 * 1000000
    bucket = (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(span_us)).cast(
        "bigint"
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select("event_id", "event_type", "value", bucket.alias("bucket"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "bucket", "event_id", "event_type", "value", F.col("rank").cast("int").alias("rank")
        )
    )


WINDOWED_TOPK_VALUES_SQL = """
SELECT bucket, event_id, event_type, value, CAST(rank AS INT) AS rank
FROM (
  SELECT CAST(floor(epoch_us(ts) / 21600000000.0) AS BIGINT) AS bucket,
         event_id, event_type, value,
         row_number() OVER (
           PARTITION BY CAST(floor(epoch_us(ts) / 21600000000.0) AS BIGINT)
           ORDER BY value DESC, event_id ASC) AS rank
  FROM events
)
WHERE rank <= 3
"""


def user_event_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sequence feature extraction (the last-N-events vector a
    training pipeline feeds a behavioral model): each user's 5 most recent
    event values, most-recent-first, emitted as a comma-joined string
    (values rendered via the DECIMAL(12,2) cast, whose string image is
    identical in both engines), plus event count and
    span. Rank window per user (no global sort), then one grouped
    collect bounded by N."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    recent = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)
    return recent.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "value"))),
                lambda s: s["value"].cast("decimal(12,2)").cast("string"),
            ),
            ",",
        ).alias("recent_values"),
        F.count(F.lit(1)).alias("n_recent"),
        F.min("ts").alias("oldest_ts"),
        F.max("ts").alias("newest_ts"),
    )


USER_EVENT_FEATURE_VECTORS_SQL = """
WITH recent AS (
  SELECT user_id, ts, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  QUALIFY rn <= 5
)
SELECT user_id,
  array_to_string(list_transform(list(value ORDER BY rn), x -> CAST(CAST(x AS DECIMAL(12,2)) AS VARCHAR)), ',')
    AS recent_values,
  COUNT(*) AS n_recent,
  MIN(ts) AS oldest_ts,
  MAX(ts) AS newest_ts
FROM recent
GROUP BY user_id
"""

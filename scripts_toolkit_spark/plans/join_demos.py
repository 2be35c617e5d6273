"""Driver-contract demonstrations of the join operators (§2.7).

Each exercises a distinct physical join strategy: broadcast-hash (dict
enrichment), left-anti (set difference), broadcast-nested-loop (range
bands), sort-based as-of, prefix-key equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.functions.clean import prefix_key
from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators import joins as J
from scripts_toolkit_spark.plans.reshape_demos import melt_wide_to_eav

# Small literal "MDRM dictionary" for the EAV facts built from orders —
# the J4 facts⋈dictionary enrichment shape (reference MDRM:17-18, 205).
_DICT_ROWS = [
    ("totalprice", "Total order price", False),
    ("maybe_price", "Price when reported", False),
    ("custkey", "Customer key", False),
    ("is_urgent", "Urgent flag", True),
    ("status", "Order status", False),
]


def eav_dictionary_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: long EAV facts ⋈ broadcast dictionary on the mdrm key, then a
    dictionary-informed aggregate (count + typed-value rollup per label)."""
    facts = melt_wide_to_eav(spark, sf_dir)
    dim = spark.createDataFrame(_DICT_ROWS, "mdrm string, item_label string, is_conf boolean")
    return (
        J.broadcast_enrich(facts, dim, "mdrm", "inner")
        .groupBy("item_label", "is_conf")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.col("float_data").cast("decimal(18,2)")).cast("double").alias("sum_float"),
            F.sum(F.col("int_data")).alias("sum_int"),
            F.sum(F.col("bool_data").cast("bigint")).alias("n_true"),
        )
    )


from scripts_toolkit_spark.plans.reshape_demos import MELT_WIDE_TO_EAV_SQL

# DuckDB SUM(BIGINT) widens to HUGEINT — cast back to BIGINT so the output
# schema matches Spark's bigint sums.
EAV_DICTIONARY_ENRICH_SQL = f"""
WITH eav AS ({MELT_WIDE_TO_EAV_SQL}),
dict(mdrm, item_label, is_conf) AS (VALUES
  ('totalprice', 'Total order price', false),
  ('maybe_price', 'Price when reported', false),
  ('custkey', 'Customer key', false),
  ('is_urgent', 'Urgent flag', true),
  ('status', 'Order status', false))
SELECT item_label, is_conf,
  COUNT(*) AS n_obs,
  CAST(SUM(CAST(float_data AS DECIMAL(18,2))) AS DOUBLE) AS sum_float,
  CAST(SUM(int_data) AS BIGINT) AS sum_int,
  CAST(SUM(CAST(bool_data AS BIGINT)) AS BIGINT) AS n_true
FROM eav JOIN dict USING (mdrm)
GROUP BY item_label, is_conf
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: anti-join set difference — customers with no URGENT order after
    1996 (filtered right side keeps the result non-degenerate at every SF)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderdate") >= "1996-01-01"))
        .select("o_custkey")
    )
    return J.anti(c, o, c["c_custkey"] == o["o_custkey"]).select("c_custkey", "c_name")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
)
"""


def value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 range/theta: events bucketed into literal value bands via a
    broadcast non-equi join, then per-band stats."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 25.0), ("mid", 25.0, 75.0), ("high", 75.0, 1e9)],
        "band string, lo double, hi double",
    )
    joined = J.range_bucket_join(ev, bands, F.col("value"), F.col("lo"), F.col("hi"))
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


VALUE_BAND_JOIN_SQL = """
WITH bands(band, lo, hi) AS (VALUES ('low', 0.0, 25.0), ('mid', 25.0, 75.0), ('high', 75.0, 1e9))
SELECT band, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
"""


def purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 as-of: each purchase matched to the user's most recent click at or
    before the purchase time — sort-based, no candidate-pair explosion."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value", "event_id")
    out = J.asof_join(
        purchases,
        clicks.withColumnsRenamed({"value": "click_value", "event_id": "click_event_id"}),
        key="user_id",
        right_cols=("click_value", "click_event_id"),
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("click_value_asof").alias("last_click_value"),
        F.col("click_event_id_asof").alias("last_click_event_id"),
    )


PURCHASE_ASOF_CLICK_SQL = """
SELECT p.event_id, p.user_id,
       c.value AS last_click_value,
       c.event_id AS last_click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def purchase_asof_click_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 as-of with bounded staleness (the common production variant): the
    most recent click at or before each purchase, but a click older than
    1 day is discarded (match columns NULL, row kept). The tolerance gate
    rides the same sort-based union-scan plan — one comparison against the
    filled match timestamp, no extra shuffle or join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value", "event_id")
    out = J.asof_join(
        purchases,
        clicks.withColumnsRenamed({"value": "click_value", "event_id": "click_event_id"}),
        key="user_id",
        right_cols=("click_value", "click_event_id"),
        tolerance="1 DAY",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("click_value_asof").alias("last_click_value"),
        F.col("click_event_id_asof").alias("last_click_event_id"),
    )


PURCHASE_ASOF_CLICK_TOLERANCE_SQL = """
SELECT p.event_id, p.user_id,
       CASE WHEN c.ts >= p.ts - INTERVAL 1 DAY THEN c.value END AS last_click_value,
       CASE WHEN c.ts >= p.ts - INTERVAL 1 DAY THEN c.event_id END AS last_click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def part_first_word_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 prefix-key derive + equi-join (reference CDR:249-256): parts keyed
    by the first token of p_name against a literal word dimension."""
    p = load_table(spark, sf_dir, "part")
    dim = spark.createDataFrame(
        [("small", 1), ("red", 2), ("blue", 3), ("hot", 4)],
        "word string, word_code int",
    )
    keyed = p.withColumn("first_word", prefix_key("p_name", tokens=1, sep=" "))
    return (
        J.broadcast_enrich(keyed, dim, keyed["first_word"] == dim["word"], "inner")
        .groupBy("word", "word_code")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.sum("p_size").alias("total_size"))
    )


PART_FIRST_WORD_JOIN_SQL = """
WITH dim(word, word_code) AS (VALUES ('small', 1), ('red', 2), ('blue', 3), ('hot', 4))
SELECT word, word_code, COUNT(*) AS n_parts, CAST(SUM(p_size) AS BIGINT) AS total_size
FROM part JOIN dim ON string_split(p_name, ' ')[1] = word
GROUP BY word, word_code
"""


def purchase_asof_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 as-of, FORWARD direction: each purchase matched to the user's
    NEXT click at or after the purchase — next-event attribution. Same
    sort-based union-scan as the backward form, run in reverse time order
    (operators/joins.asof_join(direction="forward")); no candidate-pair
    explosion."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value", "event_id")
    out = J.asof_join(
        purchases,
        clicks.withColumnsRenamed({"value": "click_value", "event_id": "click_event_id"}),
        key="user_id",
        right_cols=("click_value", "click_event_id"),
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("click_value_asof").alias("next_click_value"),
        F.col("click_event_id_asof").alias("next_click_event_id"),
    )


PURCHASE_ASOF_NEXT_CLICK_SQL = """
SELECT p.event_id, p.user_id,
       c.value AS next_click_value,
       c.event_id AS next_click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts <= c.ts
"""

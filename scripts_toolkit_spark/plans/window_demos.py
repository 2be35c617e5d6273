"""Driver-contract demonstrations: multi-level aggregation (rollup/cube,
§2.4 A7), window functions (§2.10), set operators (§2.6 D4/D5), the
validity-window join with the reference's sentinel end-date semantics
(§2.7 J7 / MDRM README:21-22), and a large-large sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators.joins import validity_window_join


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 rollup: revenue at (status, priority), (status), and grand-total
    levels in one pass — partial aggregation reused across levels."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


ROLLUP_REVENUE_SQL = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def cube_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 cube over (returnflag, linestatus): all 4 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(_dec("l_quantity")).cast("double").alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("linestatus"),
            "n",
            "qty",
        )
    )


CUBE_LINEITEM_STATS_SQL = """
SELECT
  COALESCE(l_returnflag, '*') AS returnflag,
  COALESCE(l_linestatus, '*') AS linestatus,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 ranking windows: per-customer order sequence (row_number),
    price rank with gaps (rank), and lag/lead deltas — one shuffle on
    o_custkey serves all four window functions."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wprice = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("order_seq"),
        F.rank().over(wprice).alias("price_rank"),
        (_dec("o_totalprice") - F.lag(_dec("o_totalprice")).over(w))
        .cast("double")
        .alias("delta_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


CUSTOMER_ORDER_RANKS_SQL = """
SELECT
  o_orderkey,
  o_custkey,
  CAST(row_number() OVER w AS INT) AS order_seq,
  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS price_rank,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) - lag(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS delta_prev,
  lead(o_orderkey) OVER w AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def running_revenue_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 frame spec: per-customer running total (rows unbounded
    preceding) and centered 3-row moving count."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.sum(_dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.count(F.lit(1)).over(w.rowsBetween(-1, 1)).alias("neighborhood_n"),
    )


RUNNING_REVENUE_FRAME_SQL = """
SELECT
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neighborhood_n
FROM orders
"""


def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/D5 set algebra: nations having BUILDING customers ∩ nations having
    urgent orders, ∪ nations with suppliers — intersect/union/except chain."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    urgent = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = s.select(F.col("s_nationkey").alias("nationkey"))
    return (
        building.intersect(urgent).union(supp).distinct()
        .exceptAll(spark.createDataFrame([(999,)], "nationkey int"))
        .orderBy("nationkey")
    )


SEGMENT_SET_OPS_SQL = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_nationkey FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderpriority = '1-URGENT'
  UNION
  SELECT s_nationkey FROM supplier
)
WHERE nationkey <> 999
ORDER BY nationkey
"""


def validity_window_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 validity-window join with the reference's sentinel semantics: a
    dictionary of (key, start, end) windows where end 9999-12-31 means
    'still active' (MDRM README:21-22); each order matches the definition
    valid at its orderdate."""
    o = load_table(spark, sf_dir, "orders")
    dim = spark.createDataFrame(
        [
            ("1-URGENT", "1990-01-01", "1995-12-31", "urgent-v1"),
            ("1-URGENT", "1996-01-01", "9999-12-31", "urgent-v2"),
            ("2-HIGH", "1990-01-01", "9999-12-31", "high-v1"),
        ],
        "o_orderpriority string, start_date string, end_date string, def_label string",
    ).select(
        "o_orderpriority",
        F.to_timestamp("start_date").alias("start_ts"),
        F.to_timestamp("end_date").alias("end_ts"),
        "def_label",
    )
    joined = validity_window_join(
        o,
        dim,
        "o_orderpriority",
        at=F.col("o_orderdate"),
        start=F.col("start_ts"),
        end=F.col("end_ts"),
    )
    return joined.select("o_orderkey", "def_label")


VALIDITY_WINDOW_LOOKUP_SQL = """
WITH dim(o_orderpriority, start_date, end_date, def_label) AS (VALUES
  ('1-URGENT', TIMESTAMP '1990-01-01', TIMESTAMP '1995-12-31', 'urgent-v1'),
  ('1-URGENT', TIMESTAMP '1996-01-01', TIMESTAMP '9999-12-31', 'urgent-v2'),
  ('2-HIGH',   TIMESTAMP '1990-01-01', TIMESTAMP '9999-12-31', 'high-v1'))
SELECT o_orderkey, def_label
FROM orders LEFT JOIN dim
  ON orders.o_orderpriority = dim.o_orderpriority
 AND o_orderdate >= start_date AND o_orderdate <= end_date
"""


def supplier_part_volumes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large join WITHOUT broadcast (sort-merge at scale): lineitem ⋈
    lineitem-self on (partkey, suppkey) aggregated — the fact⋈fact shuffle
    shape. Aggregate-then-join keeps the shuffle minimal."""
    li = load_table(spark, sf_dir, "lineitem")
    by_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("qty"),
        F.count(F.lit(1)).alias("n"),
    )
    by_p = by_ps.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    return (
        by_ps.join(by_p, "l_partkey")
        .select(
            "l_partkey",
            "l_suppkey",
            F.col("qty").cast("double").alias("supp_qty"),
            F.col("part_qty").cast("double").alias("part_qty"),
            (F.col("qty").cast("double") / F.col("part_qty").cast("double")).alias("supp_share"),
        )
    )


SUPPLIER_PART_VOLUMES_SQL = """
WITH by_ps AS (
  SELECT l_partkey, l_suppkey,
    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty,
    COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
by_p AS (SELECT l_partkey, SUM(qty) AS part_qty FROM by_ps GROUP BY l_partkey)
SELECT by_ps.l_partkey, l_suppkey,
  CAST(qty AS DOUBLE) AS supp_qty,
  CAST(part_qty AS DOUBLE) AS part_qty,
  CAST(qty AS DOUBLE) / CAST(part_qty AS DOUBLE) AS supp_share
FROM by_ps JOIN by_p ON by_ps.l_partkey = by_p.l_partkey
"""

"""Third analytics wave: correlated-subquery TPC-H shapes (Q2/Q15/Q17/Q20
-like) and the one-pass column-statistics profiler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators.profile import column_stats


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-like: revenue from lineitems whose quantity is below half the
    part's average quantity — correlated scalar subquery decorrelated into
    an aggregate + join."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(avg_q, li.l_partkey == avg_q.pk)
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH avg_q AS (
  SELECT l_partkey AS pk,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
  COUNT(*) AS n_items
FROM lineitem JOIN avg_q ON l_partkey = pk
WHERE l_quantity < 0.5 * avg_qty
"""


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-like: supplier(s) with the maximum total revenue — exact tie
    handling via a global-max comparison (not LIMIT 1)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)")))
        .alias("rev_dec")
    )
    mx = rev.agg(F.max("rev_dec").alias("max_dec"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_dec") == F.col("max_dec"))
        .join(s, F.col("suppkey") == s.s_suppkey)
        .select("suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue"))
    )


TOP_REVENUE_SUPPLIERS_SQL = """
WITH rev AS (
  SELECT l_suppkey AS suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS rev_dec
  FROM lineitem GROUP BY l_suppkey
)
SELECT suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
"""


def min_balance_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-like: per nation, the supplier with the minimum account balance
    (correlated min → window min + equality filter; deterministic tiebreak
    keeps ALL tied suppliers, as Q2 does)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey")
    return (
        s.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_acctbal").alias("acctbal"),
        )
    )


MIN_BALANCE_SUPPLIER_PER_NATION_SQL = """
SELECT s_nationkey AS nationkey, s_suppkey AS suppkey, s_acctbal AS acctbal
FROM (
  SELECT *, MIN(s_acctbal) OVER (PARTITION BY s_nationkey) AS min_bal
  FROM supplier
)
WHERE s_acctbal = min_bal
"""


def bulk_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-like: suppliers that shipped more than 80 units of at least one
    part — aggregate-then-semi-join chain."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    bulky = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .where(F.col("q") > 80)
        .select("l_suppkey")
        .distinct()
    )
    return s.join(bulky, s.s_suppkey == bulky.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


BULK_SHIPPERS_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey
  GROUP BY l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 80
)
"""


def lineitem_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile over the lineitem measures (single scan
    for any column count — the 5,000-column bank-matrix shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return column_stats(li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
                        sum_decimal="decimal(18,4)")


LINEITEM_COLUMN_STATS_SQL = """
SELECT column_name,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  COUNT(DISTINCT value) AS n_distinct,
  MIN(value) AS vmin,
  MAX(value) AS vmax,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS vsum
FROM (
  SELECT 'l_quantity' AS column_name, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
GROUP BY column_name
"""

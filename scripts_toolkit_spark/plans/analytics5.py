"""Fourth analytics wave — the remaining classic TPC-H query shapes
(Q6/Q14/Q18/Q21 analogs), completing the §2 scan/join/agg family coverage.

All money math rides DECIMAL until the output boundary (cross-engine
bit-exact regardless of partitioning); ratios divide two exact-decimal
DOUBLE images so IEEE division matches any engine bit-for-bit.

Adaptations to the driver schema: lineitem has no commitdate/receiptdate,
so the Q21 "kept orders waiting" predicate is expressed as
l_shipdate > o_orderdate + 365 days (same correlated EXISTS / NOT-EXISTS
shape, different lateness definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table


def _money(c: str) -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def _rate(c: str) -> F.Column:
    return F.col(c).cast("decimal(6,4)")


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-like: revenue increase from eliminating a discount band in one
    ship-year. Pure scan-agg — filters push to the parquet scan, no join,
    no wide shuffle; at 100 TB this is scan-bandwidth-bound (optimal)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_money("l_extendedprice") * _rate("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


FORECAST_REVENUE_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24
"""


def promo_revenue_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-like: share of one ship-month's revenue from PROMO parts.
    lineitem ⋈ part carries no manual hint (part is SF-linear — AQE
    broadcasts while small, shuffles at full scale); the two conditional
    decimal sums become exact doubles before the IEEE division."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = _money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - _rate("l_discount"))
    return (
        li.where((F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01"))
        .join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(F.lit(0).cast("decimal(12,2)"))).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


PROMO_REVENUE_PERCENT_SQL = """
SELECT
  100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS promo_pct,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-like: customers whose single orders exceed 170 total quantity.
    The HAVING subquery decorrelates into one grouped aggregate on
    l_orderkey (map-side partial combine) semi-joined back — the fact table
    is scanned twice but shuffled only on the join key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_money("l_quantity")).alias("qty"))
        .where(F.col("qty") > 170)
        .select("l_orderkey", F.col("qty").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


LARGE_VOLUME_CUSTOMERS_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 170
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-like: suppliers who were the ONLY late supplier on a finished
    multi-supplier order (late = shipped > 365 days after the order date).
    The correlated EXISTS / NOT EXISTS pair becomes a left-semi join (some
    other supplier on the order) + left-anti join (no other LATE supplier)
    — both equi-keyed on l_orderkey with the supplier inequality in the
    join condition, then one count per supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")

    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 365)).alias("late")
    )
    l1 = lines.where(F.col("late")).select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    l2 = lines.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = lines.where(F.col("late")).select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waited = (
        l1.join(l2, (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")), "left_semi")
        .join(l3, (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")), "left_anti")
    )
    return (
        waited.join(s, waited.sk == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


WAITING_SUPPLIERS_SQL = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 365 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM lines l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
"""

"""Fourth analytics wave: the remaining classic TPC-H query shapes adapted
to the driver schema — cross-nation volume (Q7), market share (Q8), yearly
measure rollups (Q9), returned-item report (Q10), conditional counts (Q12),
disjunctive multi-predicate revenue (Q19).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def _rev() -> F.Column:
    return F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )


def cross_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-like: shipping volume between customer-nation and supplier-nation
    pairs per year (only pairs where the nations differ)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sk"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(_rev().cast("double").alias("volume"))
    )


CROSS_NATION_VOLUME_SQL = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
  CAST(year(l_shipdate) AS INT) AS ship_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-like: NATION_3's share of total order revenue per year —
    conditional-aggregate ratio (sum(when)/sum), exact decimal numerator
    and denominator cast to double before the division."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (
                F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(F.lit(0).cast("decimal(12,2)")))
                .cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


NATION_MARKET_SHARE_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
  CAST(SUM(CASE WHEN n_name = 'NATION_3'
       THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY year(o_orderdate)
"""


def yearly_brand_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-like: 'profit' (revenue − 0.6×retail cost share) per brand and
    ship-year — expression-heavy multi-join rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    amount = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
        - _dec("p_retailprice") * F.lit(0.6).cast("decimal(6,4)") * _dec("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(amount).cast("decimal(38,6)").cast("double").alias("profit"))
    )


YEARLY_BRAND_PROFIT_SQL = """
SELECT p_brand, CAST(year(l_shipdate) AS INT) AS ship_year,
  CAST(CAST(SUM(
    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.6 AS DECIMAL(6,4)) * CAST(l_quantity AS DECIMAL(12,2))
  ) AS DECIMAL(38,6)) AS DOUBLE) AS profit
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, year(l_shipdate)
"""


def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-like: top-20 customers by revenue on RETURNED lineitems —
    deterministic top-k with id tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(_rev().cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


RETURNED_ITEM_REPORT_SQL = """
SELECT c_custkey, c_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-like: per linestatus, counts of high- vs low-priority orders —
    conditional aggregation after a fact⋈fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
    )


LINESTATUS_PRIORITY_COUNTS_SQL = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""


def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-like: revenue under a disjunction of multi-column predicate
    brackets — Catalyst pushes the OR-of-ANDs into one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    bracket1 = (F.col("p_type") == "ECONOMY") & (F.col("l_quantity") <= 10) & (F.col("p_size") <= 15)
    bracket2 = (F.col("p_type") == "SMALL") & (F.col("l_quantity") > 10) & (F.col("p_size") <= 30)
    bracket3 = (F.col("p_type") == "STANDARD") & (F.col("l_discount") >= 0.05)
    return j.where(bracket1 | bracket2 | bracket3).agg(
        _rev().cast("double").alias("promo_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


DISJUNCTIVE_PROMO_REVENUE_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS promo_revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_type = 'ECONOMY'  AND l_quantity <= 10 AND p_size <= 15)
   OR (p_type = 'SMALL'    AND l_quantity > 10  AND p_size <= 30)
   OR (p_type = 'STANDARD' AND l_discount >= 0.05)
"""

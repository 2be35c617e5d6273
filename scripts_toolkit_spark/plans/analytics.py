"""Headline join/aggregate queries over the driver star schema.

These are the engine's flagship "analyst-facing" queries — the shape the
reference's stated end state calls for ("joining bulk data … for purposes of
presenting and viewing data", reference cdr_taxonomy_processor.py:16-17,
mdrm_data_collect_process.py:17-18) expressed on the driver's TPC-H-ish
tables.

Scale notes (100 TB discipline):
- FIXED-SIZE dimensions (region: 5 rows, nation: 25 rows — constant at any
  SF) are explicitly `F.broadcast`: no shuffle of the fact table for them,
  ever. SF-LINEAR "dimensions" (customer/supplier/part grow with the data;
  TPC-H customer at 100 TB is tens of GB) get NO manual hint — AQE picks
  broadcast while they fit under the threshold and falls back to shuffle
  join when they don't, which is the correct strategy at every scale.
- Aggregates go partial→final automatically (hash aggregate with map-side
  combine); the only shuffles are the groupBy keys, which are low-cardinality.
- Money math is done in DECIMAL so results are bit-identical regardless of
  partitioning / aggregation order (doubles would drift per plan), then cast
  to DOUBLE at the boundary for a stable output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table

# Exact decimal images of the double money/rate columns, sized so even the
# triple product price*(1-disc)*(1+tax) stays within precision 38 in BOTH
# Spark and DuckDB (overflow degrades each engine differently → last-bit
# drift). Prices/quantities are 2-decimal, rates 4-decimal in the data.
def _money(c: str) -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def _rate(c: str) -> F.Column:
    return F.col(c).cast("decimal(6,4)")


def _revenue() -> F.Column:
    """sum(extendedprice * (1 - discount)) — exact, order-independent."""
    return F.sum(_money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - _rate("l_discount")))


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem.

    One wide scan → one partial+final hash aggregate on a 4-ish-value key;
    no join, no wide shuffle. At 100 TB this is bandwidth-bound on the
    parquet scan, which is the optimum for this query.
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(6,4)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_money("l_extendedprice") * (one - _rate("l_discount"))).cast("double").alias("sum_disc_price"),
            # the triple product has decimal scale 10 → the sum's integer
            # mantissa exceeds 2^53 and decimal→double casts differ across
            # engines (double-rounding). The rates are 2-real-decimal, so the
            # product carries exactly 6 real decimals: casting the sum to
            # scale 6 is LOSSLESS (no rounding-mode dependence) and brings
            # the mantissa back under 2^53 for an exact double conversion.
            F.sum(_money("l_extendedprice") * (one - _rate("l_discount")) * (one + _rate("l_tax")))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("sum_charge"),
            # cast the exact decimal sum to double BEFORE dividing: decimal
            # division truncates scale; double/int64 division is IEEE-exact
            # and matches any other engine bit-for-bit.
            (F.sum(_money("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_money("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_rate("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation, customer and supplier co-national.

    Plan shape: lineitem (fact) ⋈ orders (fact) is the one guaranteed
    shuffle join (both large at scale — sort-merge + AQE). customer and
    supplier are SF-linear, so they carry no manual broadcast hint: AQE
    broadcasts them while small and degrades gracefully to shuffle joins at
    full scale. nation / region are constant-size → explicit broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_revenue().cast("double").alias("revenue"))
    )


REVENUE_BY_NATION_SQL = """
SELECT
  n_name AS nation,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
"""


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-10 revenue among not-yet-shipped orders.

    Deterministic top-k: order by (revenue DESC, o_orderkey) so the limit is
    stable across partitionings — a bare `ORDER BY revenue LIMIT 10` is
    nondeterministic under ties.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cutoff = F.lit("1995-03-15")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


TOP_UNSHIPPED_ORDERS_SQL = """
SELECT
  o_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: order counts per priority for orders with at least
    one late lineitem — a left-semi join (EXISTS), which never widens rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late = li.select("l_orderkey").where(F.col("l_linenumber") >= 4)
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORDER_PRIORITY_COUNTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_linenumber >= 4
)
GROUP BY o_orderpriority
"""

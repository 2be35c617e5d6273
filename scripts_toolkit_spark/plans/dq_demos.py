"""Data-quality constraint-suite demonstration (operators/checks).

The reference asserts pipeline sanity inline (MDRM:100-272 row/shape
checks); this is the declarative, one-scan-per-table generalization a
warehouse runs nightly: completeness, uniqueness, domain and pattern
conformance, plus a referential-integrity anti-join — emitted as one
(table, check, metric, passed) report.

Determinism: every metric is either an exact integer count or ONE IEEE
division of exact counts; min() passes through parquet doubles untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators import checks as C

_NAME_PATTERN = "^Customer#[0-9]{9}$"
_STATUSES = ("F", "O", "P")


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over orders + customer: two single-pass aggregate
    scans (one per table, all metrics in the same hash aggregate) plus one
    anti-join for referential integrity, unioned into a tall report."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    status_ok = F.sum(
        F.when(F.col("o_orderstatus").isin(*_STATUSES), F.lit(1)).otherwise(F.lit(0))
    ).cast("double") / F.count("o_orderstatus").cast("double")
    orders_report = C.quality_report(
        o,
        "orders",
        [
            ("row_count", F.count(F.lit(1)), lambda m: m > 0),
            ("orderkey_unique_frac", C.uniqueness("o_orderkey"), lambda m: m == 1.0),
            ("totalprice_nonnull_frac", C.completeness("o_totalprice"), lambda m: m == 1.0),
            ("totalprice_min", F.min("o_totalprice"), lambda m: m >= 0.0),
            ("status_domain_frac", status_ok, lambda m: m == 1.0),
        ],
    )
    customer_report = C.quality_report(
        c,
        "customer",
        [
            ("row_count", F.count(F.lit(1)), lambda m: m > 0),
            ("custkey_unique_frac", C.uniqueness("c_custkey"), lambda m: m == 1.0),
            ("name_pattern_frac", C.pattern_conformance("c_name", _NAME_PATTERN), lambda m: m == 1.0),
        ],
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("double").alias("metric"))
        .select(
            F.lit("orders").alias("table_name"),
            F.lit("orphan_orders").alias("check_name"),
            "metric",
            (F.col("metric") == 0.0).alias("passed"),
        )
    )
    return orders_report.unionByName(customer_report).unionByName(orphans)


DATA_QUALITY_REPORT_SQL = """
SELECT 'orders' AS table_name, 'row_count' AS check_name,
  CAST(COUNT(*) AS DOUBLE) AS metric, COUNT(*) > 0 AS passed FROM orders
UNION ALL
SELECT 'orders', 'orderkey_unique_frac',
  CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / CAST(COUNT(o_orderkey) AS DOUBLE),
  CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / CAST(COUNT(o_orderkey) AS DOUBLE) = 1.0
FROM orders
UNION ALL
SELECT 'orders', 'totalprice_nonnull_frac',
  CAST(COUNT(o_totalprice) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
  CAST(COUNT(o_totalprice) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) = 1.0
FROM orders
UNION ALL
SELECT 'orders', 'totalprice_min', MIN(o_totalprice), MIN(o_totalprice) >= 0.0 FROM orders
UNION ALL
SELECT 'orders', 'status_domain_frac',
  CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(o_orderstatus) AS DOUBLE),
  CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(o_orderstatus) AS DOUBLE) = 1.0
FROM orders
UNION ALL
SELECT 'customer', 'row_count', CAST(COUNT(*) AS DOUBLE), COUNT(*) > 0 FROM customer
UNION ALL
SELECT 'customer', 'custkey_unique_frac',
  CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) / CAST(COUNT(c_custkey) AS DOUBLE),
  CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) / CAST(COUNT(c_custkey) AS DOUBLE) = 1.0
FROM customer
UNION ALL
SELECT 'customer', 'name_pattern_frac',
  CAST(SUM(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(c_name) AS DOUBLE),
  CAST(SUM(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(c_name) AS DOUBLE) = 1.0
FROM customer
UNION ALL
SELECT 'orders', 'orphan_orders', CAST(COUNT(*) AS DOUBLE), COUNT(*) = 0
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
"""

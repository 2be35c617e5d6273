"""F9 date parsing parity (reference MDRM:29-39): the MDRM timestamp format
'%m/%d/%Y %H:%M:%S %p' round-tripped to yyyymmdd, plus the still-active
sentinel classification (reference component README:21-22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.functions.clean import ACTIVE_SENTINEL_YYYYMMDD, mdrm_date_to_yyyymmdd
from scripts_toolkit_spark.io.catalog import load_table


def mdrm_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construct MDRM-format date strings from o_orderdate (with the
    sentinel for a deterministic subset), parse them back with the engine's
    F9 expression, and classify active rows."""
    o = load_table(spark, sf_dir, "orders")
    mdrm_str = F.when(
        F.col("o_orderkey") % 11 == 0, F.lit("12/31/9999 12:00:00 AM")
    ).otherwise(F.date_format("o_orderdate", "M/d/yyyy h:mm:ss a"))
    parsed = mdrm_date_to_yyyymmdd(mdrm_str)
    return o.select(
        "o_orderkey",
        parsed.alias("yyyymmdd"),
        (parsed == ACTIVE_SENTINEL_YYYYMMDD).alias("is_active"),
    )


MDRM_DATE_ROUNDTRIP_SQL = """
SELECT o_orderkey,
  CASE WHEN o_orderkey % 11 = 0 THEN '99991231'
       ELSE strftime(o_orderdate, '%Y%m%d') END AS yyyymmdd,
  (o_orderkey % 11 = 0) AS is_active
FROM orders
"""


def quarter_extract_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + A6 (reference converter.py:263-267, assertions MDRM:122/150):
    first-value extraction from an assumed-constant column, with the
    constancy assumption CHECKED as data (count_distinct == 1) rather than
    assumed — plus rowcount guards."""
    ev = load_table(spark, sf_dir, "events")
    monthly = ev.select(F.date_format("ts", "yyyyMM").alias("yyyymm"))
    jan = monthly.where(F.col("yyyymm") == "202401")
    return jan.agg(
        F.min("yyyymm").alias("quarter_value"),
        (F.count_distinct("yyyymm") == 1).alias("is_constant"),
        (F.count(F.lit(1)) > 1).alias("rowcount_ok"),
        F.count(F.lit(1)).alias("n_rows"),
    )


QUARTER_EXTRACT_CHECKS_SQL = """
SELECT
  MIN(yyyymm) AS quarter_value,
  COUNT(DISTINCT yyyymm) = 1 AS is_constant,
  COUNT(*) > 1 AS rowcount_ok,
  COUNT(*) AS n_rows
FROM (SELECT strftime(ts, '%Y%m') AS yyyymm FROM events WHERE strftime(ts, '%Y%m') = '202401')
"""

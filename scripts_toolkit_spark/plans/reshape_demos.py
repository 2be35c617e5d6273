"""Driver-contract demonstrations for profile / melt / pivot (§2.4, §2.5).

The wide "bank matrix" is synthesized deterministically from driver tables
(engineered so every profiler branch is exercised with data-independent
outcomes), then run through the real engine operators; the oracle recomputes
the same semantics in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators.profile import profile_types
from scripts_toolkit_spark.operators.reshape import melt_to_eav, pivot_from_eav

QUARTER = 20240331


def _wide_profile_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engineered wide matrix: outcomes independent of scale factor.

    bool_col {0,1}; zeros_col all-0 (reference documented NON-bool,
    falls to int); int_col whole doubles; float_col l_linenumber+0.5
    (distinct sum 31.5 → not whole → float, deterministically); str_col.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("entity"),
        (F.col("l_linenumber") % 2).cast("double").alias("bool_col"),
        F.lit(0.0).alias("zeros_col"),
        (F.col("l_linenumber") * 2).cast("double").alias("int_col"),
        (F.col("l_linenumber") + 0.5).alias("float_col"),
        F.col("l_returnflag").alias("str_col"),
    )


def type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1–A3: one-pass type profiler over the engineered wide matrix.

    Output: (column_name, data_type) — the collected "cast plan" re-emitted
    as a DataFrame so the oracle can recompute it in SQL.
    """
    wide = _wide_profile_input(spark, sf_dir)
    tm = profile_types(wide, exclude=("entity",))
    rows = [(c, t) for c, t in sorted(tm.items())]
    return spark.createDataFrame(rows, "column_name string, data_type string")


TYPE_PROFILE_SQL = """
WITH w AS (
  SELECT
    CAST(l_linenumber % 2 AS DOUBLE) AS bool_col,
    0.0 AS zeros_col,
    CAST(l_linenumber * 2 AS DOUBLE) AS int_col,
    l_linenumber + 0.5 AS float_col,
    l_returnflag AS str_col
  FROM lineitem
)
SELECT 'bool_col' AS column_name,
  CASE WHEN COUNT(DISTINCT bool_col) = 2 AND MIN(bool_col) = 0 AND MAX(bool_col) = 1 THEN 'bool'
       WHEN COALESCE(SUM(DISTINCT bool_col), 0) % 1 = 0 THEN 'int' ELSE 'float' END AS data_type
FROM w
UNION ALL
SELECT 'zeros_col',
  CASE WHEN COUNT(DISTINCT zeros_col) = 2 AND MIN(zeros_col) = 0 AND MAX(zeros_col) = 1 THEN 'bool'
       WHEN COALESCE(SUM(DISTINCT zeros_col), 0) % 1 = 0 THEN 'int' ELSE 'float' END
FROM w
UNION ALL
SELECT 'int_col',
  CASE WHEN COUNT(DISTINCT int_col) = 2 AND MIN(int_col) = 0 AND MAX(int_col) = 1 THEN 'bool'
       WHEN COALESCE(SUM(DISTINCT int_col), 0) % 1 = 0 THEN 'int' ELSE 'float' END
FROM w
UNION ALL
SELECT 'float_col',
  CASE WHEN COUNT(DISTINCT float_col) = 2 AND MIN(float_col) = 0 AND MAX(float_col) = 1 THEN 'bool'
       WHEN COALESCE(SUM(DISTINCT float_col), 0) % 1 = 0 THEN 'int' ELSE 'float' END
FROM w
UNION ALL
SELECT 'str_col', 'str'
"""


def melt_wide_to_eav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1+R2: wide orders-derived matrix → long typed EAV with the
    reference's exact null semantics (bool always emitted incl. null→False;
    numeric/str nulls skipped)."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.select(
        F.col("o_orderkey").alias("rssd"),
        F.col("o_totalprice").alias("totalprice"),
        F.when(F.col("o_orderkey") % 7 != 0, F.col("o_totalprice")).alias("maybe_price"),
        F.col("o_custkey").cast("double").alias("custkey"),
        (F.col("o_orderpriority") == "1-URGENT").cast("double").alias("is_urgent"),
        F.when(F.col("o_orderkey") % 5 != 0, F.col("o_orderstatus")).alias("status"),
    )
    type_map = {
        "totalprice": "float",
        "maybe_price": "float",
        "custkey": "int",
        "is_urgent": "bool",
        "status": "str",
    }
    return melt_to_eav(wide, type_map, QUARTER)


MELT_WIDE_TO_EAV_SQL = f"""
SELECT o_orderkey AS rssd, 'totalprice' AS mdrm, {QUARTER} AS quarter, 'float' AS data_type,
       CAST(NULL AS BOOLEAN) AS bool_data, CAST(NULL AS BIGINT) AS int_data,
       o_totalprice AS float_data, CAST(NULL AS VARCHAR) AS str_data
FROM orders WHERE o_totalprice IS NOT NULL
UNION ALL
SELECT o_orderkey, 'maybe_price', {QUARTER}, 'float', NULL, NULL, o_totalprice, NULL
FROM orders WHERE o_orderkey % 7 <> 0
UNION ALL
SELECT o_orderkey, 'custkey', {QUARTER}, 'int', NULL, CAST(o_custkey AS BIGINT), NULL, NULL
FROM orders WHERE o_custkey IS NOT NULL
UNION ALL
SELECT o_orderkey, 'is_urgent', {QUARTER}, 'bool', (o_orderpriority = '1-URGENT'), NULL, NULL, NULL
FROM orders
UNION ALL
SELECT o_orderkey, 'status', {QUARTER}, 'str', NULL, NULL, NULL, o_orderstatus
FROM orders WHERE o_orderkey % 5 <> 0 AND o_orderstatus IS NOT NULL
"""


def pivot_eav_to_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: the long EAV pivoted back to a wide per-entity view with an
    EXPLICIT pivot column list (no value-discovery job, stable schema)."""
    eav = melt_wide_to_eav(spark, sf_dir)
    floats = eav.where(F.col("data_type") == "float")
    return pivot_from_eav(floats, ["totalprice", "maybe_price"], "float_data", ("rssd", "quarter"))


PIVOT_EAV_TO_WIDE_SQL = f"""
WITH eav AS ({MELT_WIDE_TO_EAV_SQL})
SELECT rssd, quarter,
  MAX(CASE WHEN mdrm = 'totalprice'  THEN float_data END) AS totalprice,
  MAX(CASE WHEN mdrm = 'maybe_price' THEN float_data END) AS maybe_price
FROM eav
WHERE data_type = 'float'
GROUP BY rssd, quarter
"""

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in `scripts_toolkit_spark/`; the registry of
(query, oracle) pairs is `scripts_toolkit_spark/registry.py`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scripts_toolkit_spark import contract
from scripts_toolkit_spark.plans.analytics import revenue_by_nation


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue per nation with co-national customer/supplier — exercises the
    fact⋈fact shuffle join, four broadcast dimension joins and a
    decimal-exact aggregate in one plan.
    """
    return revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle for each queries() key."""
    return contract.oracle_sql()

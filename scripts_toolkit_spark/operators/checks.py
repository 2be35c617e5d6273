"""Data-quality constraint reports (Deequ-style), one aggregate pass.

The reference's pipelines assert sanity inline (row counts, shape checks —
MDRM:100-272 "P6 sanity assertions"); at warehouse scale those become a
declarative constraint suite evaluated in ONE scan: every metric is an
aggregate expression computed in the same map-side-combinable hash
aggregate, then the single result row is unpivoted to (check, metric,
passed) rows via a literal struct-array explode — no per-check scan, no
driver-side loop over data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Check = tuple[str, Column, Callable[[Column], Column]]


def completeness(col: str) -> Column:
    """Fraction of non-null values — exact int counts, one IEEE division."""
    return F.count(col).cast("double") / F.count(F.lit(1)).cast("double")


def uniqueness(col: str) -> Column:
    """Fraction of distinct values among non-nulls."""
    return F.count_distinct(col).cast("double") / F.count(col).cast("double")


def pattern_conformance(col: str, pattern: str) -> Column:
    """Fraction of non-null values matching an anchored regex."""
    hit = F.when(F.col(col).rlike(pattern), F.lit(1)).otherwise(F.lit(0))
    return F.sum(hit).cast("double") / F.count(col).cast("double")


def quality_report(df: DataFrame, table_name: str, checks: list[Check]) -> DataFrame:
    """Evaluate `checks` = [(check_name, aggregate metric, passed
    predicate)] over `df` in one aggregate pass; returns rows
    (table_name, check_name, metric double, passed boolean)."""
    row = df.agg(*[metric.cast("double").alias(f"m{i}") for i, (_, metric, _p) in enumerate(checks)])
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"m{i}").alias("metric"),
                pred(F.col(f"m{i}")).alias("passed"),
            )
            for i, (name, _m, pred) in enumerate(checks)
        ]
    )
    return row.select(
        F.lit(table_name).alias("table_name"), F.explode(structs).alias("c")
    ).select("table_name", "c.check_name", "c.metric", "c.passed")

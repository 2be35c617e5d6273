"""Test-data catalog: the driver-provided TPC-H-ish parquet tables.

`/root/testdata/sf{0.001,0.01,0.1}/<table>.parquet` (TESTDATA.md). Parquet +
explicit column selection means Catalyst column pruning and filter pushdown
reach the scan — the layout decision that matters most at 100 TB
(SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects;
    read nanos as long (runtime-settable legacy conf) and surface `ts` as a
    proper microsecond TIMESTAMP (truncation matches DuckDB's ns→µs).

    Also pins the session timezone to UTC: `ts` becomes a TIMESTAMP (LTZ)
    and every downstream date_format / window / session_window boundary is
    session-tz-dependent — the oracle computes tz-naive, so a non-UTC host
    session would silently shift every derived date."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/`: double division loses precision above 2^53
        # and epoch-nanos are ~1.7e18
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}

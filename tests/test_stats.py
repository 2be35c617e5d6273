"""Unit tests for the r5 wave-3 statistics operators: partial global
top-k, OLS trend from sufficient statistics, MAD outliers, correlation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from scripts_toolkit_spark.operators.topk import global_topk


def test_global_topk_matches_naive_and_survives_repartition(spark):
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast("long")).alias(
            "v"
        ),
    )
    expected = [
        (r["id"], r["v"])
        for r in df.orderBy(F.desc("v"), F.asc("id")).limit(25).collect()
    ]
    for parts in (1, 7, 32):
        got = (
            global_topk(df.repartition(parts), [F.desc("v"), F.asc("id")], k=25)
            .orderBy("rank")
            .collect()
        )
        assert [(r["id"], r["v"]) for r in got] == expected
        assert [r["rank"] for r in got] == list(range(1, 26))


def test_global_topk_plan_partials_before_global(spark):
    df = spark.range(0, 1000).withColumn("v", F.col("id") % 97)
    plan = (
        global_topk(df, [F.desc("v"), F.asc("id")], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stage 1 must rank within spark_partition_id() — the full input never
    # converges on a single task
    assert "SPARK_PARTITION_ID" in plan.upper()


def test_trend_recovers_planted_slope(spark):
    # y = 3·x_hours + 5 exactly (2-dp-safe values): slope_per_hour == 3
    rows = [(i, float(3 * i + 5)) for i in range(48)]
    df = spark.createDataFrame(rows, "hour bigint, value double").select(
        F.lit("t").alias("event_type"),
        (F.timestamp_micros(F.lit(1704067200000000) + F.col("hour") * F.lit(3600000000))).alias(
            "ts"
        ),
        "value",
    )
    from scripts_toolkit_spark.plans.analytics6 import _trend_sums

    x_us = F.unix_micros(F.col("ts")) - F.lit(1704067200000000)
    sums = df.groupBy("event_type").agg(*_trend_sums(x_us, F.col("value"))).collect()[0]
    n = float(sums["n"])
    slope_us = (n * sums["sxy"] - sums["sx"] * sums["sy"]) / (
        n * sums["sxx"] - sums["sx"] * sums["sx"]
    )
    assert math.isclose(slope_us * 3600000000.0, 3.0, rel_tol=1e-9)


def test_mad_flags_planted_outlier(spark, sf_dir):
    # MAD of a tight cluster is small; a far point must exceed 3·MAD
    vals = [10.0 + 0.01 * i for i in range(99)] + [1000.0]
    df = spark.createDataFrame([("t", v) for v in vals], "event_type string, value double")
    med = df.groupBy("event_type").agg(F.round(F.percentile("value", F.lit(0.5)), 6).alias("med"))
    dev = df.join(med, "event_type").withColumn("adev", F.abs(F.col("value") - F.col("med")))
    mad = dev.groupBy("event_type").agg(F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad"))
    out = (
        dev.join(mad, "event_type")
        .where(F.col("adev") > 3.0 * F.col("mad"))
        .collect()
    )
    assert [r["value"] for r in out] == [1000.0]


def test_corr_perfect_and_sign(spark):
    from scripts_toolkit_spark.io.catalog import load_table  # noqa: F401 (import parity)

    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i)) for i in range(1, 50)], "x double, y double, z double"
    )
    dec = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    sums = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
        F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
        F.sum(dec("z")).cast("double").alias("sz"),
        F.sum(dec("z") * dec("z")).cast("double").alias("szz"),
        F.sum(dec("x") * dec("z")).cast("double").alias("sxz"),
    ).collect()[0]
    n = float(sums["n"])

    def corr(sab, sa, sb, saa, sbb):
        return (n * sab - sa * sb) / (
            math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
        )

    assert math.isclose(corr(sums["sxy"], sums["sx"], sums["sy"], sums["sxx"], sums["syy"]), 1.0)
    assert math.isclose(corr(sums["sxz"], sums["sx"], sums["sz"], sums["sxx"], sums["szz"]), -1.0)

"""SparkSession factory tuned for this engine.

Local testing runs `local[N]`; the config below is written for a real
multi-executor cluster and degrades gracefully to local mode:

- AQE on (runtime coalesce, skew-join splitting, dynamic join strategy) —
  at 100 TB the static `shuffle.partitions` number is always wrong for some
  stage, AQE re-plans per-stage from actual map output sizes.
- Arrow on for every pandas_udf / mapInPandas boundary (format decoders are
  the only Python in the data plane).
- Broadcast threshold left at default (10 MB) but every dimension join in
  the engine passes an explicit `F.broadcast` hint, so plan shape does not
  silently flip to shuffle joins when statistics are missing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At sf0.1 locally a few MB of shuffle data spread over 32 threads wants a
# small fixed number; on a real cluster AQE coalesces upward from this.
_DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")


def get_spark(app_name: str = "scripts-toolkit-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the session with the engine's standard config."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", _DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing sizes post-shuffle partitions by BYTES, but this
        # engine's hot stages are Arrow-kernel (mapInPandas) and
        # interpreted higher-order array expressions whose per-row cost
        # exceeds the byte model by ~10^3: a few-hundred-KB shuffle that
        # AQE folds to ONE partition serializes seconds of per-row work
        # onto one core (r14 event-log attribution: 2-4 s single-task
        # kernel stages across the ANN family). Dropping the coalesce
        # floor to 1 byte keeps such stages at `shuffle.partitions`-way
        # parallelism; partitions stay bounded by that knob (env
        # SPARK_GRAFT_SHUFFLE_PARTITIONS — production sets it with the
        # cluster, and can raise this floor back toward Spark's 1m
        # default when bytes-per-partition, not Python-per-row, dominate).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "1b"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scans: vectorized reader + pushdown are on by default; keep
        # files splittable and partitions memory-sized for wide fact tables.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    return builder.getOrCreate()

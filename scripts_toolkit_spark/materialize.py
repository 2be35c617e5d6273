"""Materialization boundary for expression-reuse lineage cuts.

Catalyst inlines expression trees per reference, so every expensive
array/hash column referenced more than once in a plan (band slices, join
legs, LUTs) is materialized behind a checkpoint (README design rule;
PLANS.md documents each site). Two modes:

- DEFAULT: `localCheckpoint()` — blocks live in executor storage, no
  filesystem round-trip. Fast, and correct on local[N]; on a REAL cluster
  an executor loss makes the blocks unrecoverable (the job fails and must
  rerun — acceptable for interactive/batch-retry use, wrong for long
  multi-hour pipelines).
- DURABLE: `checkpoint()` to a configured reliable directory
  (HDFS/object-store on a cluster) — survives executor loss at the cost
  of a write+read round-trip per boundary. Round-5 verdict flagged this
  as the cluster-safe variant worth a flag.

Selection (checked per call, so one session can flip modes):
  spark.conf `spark.graft.durableCheckpoint` = true/false, else env
  `SPARK_GRAFT_DURABLE_CHECKPOINT`. The directory comes from
  `spark.graft.checkpointDir` / `SPARK_GRAFT_CHECKPOINT_DIR` (default
  /tmp/spark_graft_checkpoints) and is installed with
  `sc.setCheckpointDir` on first use if none is set.

Usage: `df.transform(materialize)` — a drop-in suffix for
`.localCheckpoint()` with identical eager semantics in both modes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_TRUTHY = {"1", "true", "yes", "on"}


def _durable_requested(spark) -> bool:
    flag = spark.conf.get(
        "spark.graft.durableCheckpoint",
        os.environ.get("SPARK_GRAFT_DURABLE_CHECKPOINT", "false"),
    )
    return str(flag).strip().lower() in _TRUTHY


_last_set_dir: str | None = None


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize `df` and cut its lineage (see module doc)."""
    global _last_set_dir
    spark = df.sparkSession
    if not _durable_requested(spark):
        return df.localCheckpoint()
    sc = spark.sparkContext
    target = spark.conf.get(
        "spark.graft.checkpointDir",
        os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/spark_graft_checkpoints"),
    )
    # the configured dir is authoritative: re-point the context when the
    # conf changes (setCheckpointDir is sticky on the shared context)
    if target != _last_set_dir or sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(target)
        _last_set_dir = target
    return df.checkpoint()

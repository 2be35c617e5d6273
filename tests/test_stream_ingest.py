"""Streaming EAV ingest: file-source → melt → exactly-once parquet sink.

Asserts the three properties the continuous form must keep:
- stream output == batch melt over the same files (reprocessing
  consistency),
- a restarted query does NOT reprocess already-committed files
  (exactly-once via the checkpoint file-sink log),
- the sink store keeps per-quarter partition pruning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.operators.reshape import melt_to_eav
from scripts_toolkit_spark.streaming.ingest import (
    read_wide_stream,
    start_eav_sink,
    stream_wide_to_eav,
)

SCHEMA = "rssd bigint, totalprice double, status string"
TYPE_MAP = {"totalprice": "float", "status": "str"}


def _write_wide(spark, path, start, n):
    spark.range(start, start + n).select(
        F.col("id").alias("rssd"),
        (F.col("id") * 1.5).alias("totalprice"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("status"),
    ).coalesce(1).write.mode("append").parquet(path)


def test_stream_ingest_matches_batch_and_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "wide_in")
    store = str(tmp_path / "eav_store")
    ckpt = str(tmp_path / "ckpt")

    _write_wide(spark, src, 0, 50)
    _write_wide(spark, src, 50, 30)

    def run_once():
        stream = read_wide_stream(spark, src, SCHEMA, max_files_per_trigger=1)
        q = start_eav_sink(stream_wide_to_eav(stream, TYPE_MAP, 20240630), store, ckpt)
        q.awaitTermination()

    run_once()
    got = spark.read.parquet(store)
    batch = melt_to_eav(spark.read.schema(SCHEMA).parquet(src), TYPE_MAP, 20240630)
    assert got.count() == batch.count() == 160  # 80 rows × 2 typed columns
    assert (
        got.select("rssd", "mdrm", "quarter", "str_data", "float_data").exceptAll(
            batch.select("rssd", "mdrm", "quarter", "str_data", "float_data")
        ).count()
        == 0
    )

    # restart with NO new files: nothing must be re-ingested
    run_once()
    assert spark.read.parquet(store).count() == 160

    # restart with one new file: only its rows append
    _write_wide(spark, src, 80, 10)
    run_once()
    assert spark.read.parquet(store).count() == 180

    # the sink store prunes partitions like the batch write_eav store
    pruned = spark.read.parquet(store).where(F.col("quarter") == 20240630)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == 180

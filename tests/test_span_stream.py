"""Streaming span scan == batch span scan, with a FORMULA body that spans a
micro-batch boundary (the state-carry case the batch form gets for free)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from scripts_toolkit_spark.operators.spans import span_scan
from scripts_toolkit_spark.streaming.span_stream import scan_span_stream

H, HB = "Helvetica", "Helvetica-Bold"

# batch 1 ends INSIDE the formula body of record 0 — state must carry
BATCH1 = [
    (7, 1, 1, "Summary Ratios", 16.0, H),
    (7, 1, 2, "Net Interest Margin", 14.0, HB),
    (7, 1, 3, "3 UBPRE003", 12.0, HB),
    (7, 1, 4, "NARRATIVE", 10.0, HB),
    (7, 1, 5, "Interest income", 10.0, H),
    (7, 1, 6, "FORMULA", 10.0, HB),
    (7, 1, 7, "a / b", 10.0, H),
]
BATCH2 = [
    (7, 1, 8, "* 100", 10.0, H),
    (7, 2, 1, "UBPRE005", 12.0, HB),
    (7, 2, 2, "DESCRIPTION", 10.0, HB),
    (7, 2, 3, "Second one", 10.0, H),
    (7, 2, 4, "FORMULA", 10.0, HB),
    (7, 2, 5, "x + y", 10.0, H),
    (7, 2, 6, "Footer", 7.5, H),  # closes the final formula segment
]

SCHEMA = "doc_id long, page_no int, span_seq long, text string, size double, font string"


@pytest.fixture(scope="module")
def span_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("span_stream"))
    # one file per micro-batch, named in arrival order
    spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.parquet(os.path.join(d, "b1"))
    spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.parquet(os.path.join(d, "b2"))
    return d


def test_stream_scan_matches_batch(spark, span_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(span_dir, "*"))
    )
    q = (
        scan_span_stream(stream)
        .writeStream.format("memory")
        .queryName("span_records_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["record_id"]: r
        for r in spark.table("span_records_t").where(F.col("doc_id") == 7).collect()
    }

    batch_input = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA).drop("doc_id")
    want = {r["record_id"]: r for r in span_scan(batch_input).collect()}

    assert len(got) == len(want) == 2
    for rid in want:
        for col in ("page_name", "title", "mdrm", "narrative", "description"):
            assert got[rid][col] == want[rid][col], (rid, col)
        # formula text equal modulo leading/trailing space convention
        assert got[rid]["formula"].strip() == want[rid]["formula"].strip(), rid
    # the cross-batch formula body was assembled from both micro-batches
    assert got[0]["formula"].strip() == "a / b * 100"
    q.stop()

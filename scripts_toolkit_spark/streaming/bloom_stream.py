"""Incremental Bloom-filter membership store over a STREAM (the
continuous form of `plans/scale_demos.bloom_semijoin_prune`'s build side):
keep a set-membership bitmap current while keys keep arriving, without
rescanning history.

Bloom words merge by BITWISE OR, which is associative, commutative AND
idempotent — so the fold of per-batch word partials is bit-exact equal to
the one-shot bitmap over the concatenated batches, and even a re-ORed
duplicate batch cannot corrupt state (strictly stronger than the CMS
monitor, whose counts sum and therefore NEED the overwrite discipline;
this store keeps the same per-batch_id dynamic-partition overwrite anyway
so the store stays auditable batch-by-batch).

  per batch:  keys → k=3 md5 positions → (word_idx, 1<<bit) → ONE hash
              aggregate (bit_or) → ≤ W word rows, written as a batch_id
              store partition
  at read:    bit_or per word_idx — ≤ W rows however long the stream ran
  probe:      candidates explode to their k (word_idx, mask) pairs,
              equi-join the ≤ W-row merged frame (AQE broadcasts it),
              member = every bit set. NO FALSE NEGATIVES: any key ever
              streamed probes true; false positives are md5-deterministic.

At 100 TB this is the streaming decontamination / seen-before primitive:
the store grows by ≤ W rows per micro-batch and the probe never touches
history. Word layout follows the semijoin-prune conventions: 63 usable
bits per word (`1 << bit` never touches the BIGINT sign bit — DuckDB
raises on 1<<63) and md5-derived positions so any SQL engine replays the
bitmap exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 4096 words × 63 bits ≈ 258k bits: ~8.6 bits/key at the largest test SF's
# build side (30k urgent-order keys at sf0.1 → FP ≈ 2.6%, visible but
# honest); load stays ≤ 0.04 at the smaller SFs (FP ≈ 0).
BLOOM_WORDS = 4096
BLOOM_BITS = 63 * BLOOM_WORDS
BLOOM_K = 3

WORD_SCHEMA = "word_idx bigint, word bigint, batch_id bigint"


def _positions(key: F.Column) -> F.Column:
    """Array of the k md5-derived bit positions for a key — the identical
    literal recipe as the batch twin's oracle ('bl{j}|' seeds,
    CAST('0x'||substr(md5(...),1,8)) in DuckDB)."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bl{j}|"), key.cast("string"))), 1, 8
                ),
                16, 10,
            ).cast("long")
            % F.lit(BLOOM_BITS)
            for j in range(BLOOM_K)
        ]
    )


def word_partials(batch: DataFrame, key_col: str) -> DataFrame:
    """This batch's bitmap contribution: ≤ W rows of (word_idx, word)."""
    return (
        batch.select(F.explode(_positions(F.col(key_col))).alias("p"))
        .select(
            F.expr("p div 63").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 63) AS INT))").alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("word"))
    )


def make_bloom_processor(store_path: str, key_col: str = "k"):
    """foreachBatch callable writing this batch's ≤ W word rows as a
    batch_id partition (overwrite ⇒ crash replay rewrites, never adds —
    and OR-idempotence means even an un-overwritten duplicate would not
    change the merged bitmap)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        (
            word_partials(batch, key_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    return _process


def start_bloom_monitor(
    stream: DataFrame, store_path: str, checkpoint: str, key_col: str = "k"
):
    return (
        stream.writeStream.foreachBatch(make_bloom_processor(store_path, key_col))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def merged_bloom(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold every batch's words: bit_or per word_idx — bit-exact equal to
    the one-shot bitmap over all streamed keys."""
    return (
        spark.read.schema(WORD_SCHEMA)
        .parquet(store_path)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def probe_members(
    spark: SparkSession, store_path: str, candidates: DataFrame, key_col: str
) -> DataFrame:
    """Membership flag per candidate row against the merged bitmap:
    explode to the k (word_idx, mask) pairs, LEFT-join the ≤ W-row merged
    frame (a missing word means no streamed key ever touched it), member
    = every bit set. Extra candidate columns pass through, and INPUT
    CARDINALITY is preserved (advisor r12): rows are tagged with
    `monotonically_increasing_id` before the explode and the re-collapse
    groups on the tag, so duplicate candidate rows each keep their own
    output row instead of silently merging. The tag name is generated to
    be absent from `candidates.columns` (advisor r13: a caller column
    literally named __row_id was silently overwritten, then dropped from
    the output — and the group-by double-keyed on the clobbered name)."""
    words = merged_bloom(spark, store_path)
    tag = "__row_id"
    while tag in candidates.columns:
        tag += "_"
    tagged = candidates.withColumn(tag, F.monotonically_increasing_id())
    keyed = (
        tagged.select("*", F.explode(_positions(F.col(key_col))).alias("p"))
        .select(
            "*",
            F.expr("p div 63").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 63) AS INT))").alias("m"),
        )
        .drop("p")
    )
    group_cols = list(candidates.columns)
    hit_tag = "__hit"
    while hit_tag in candidates.columns:
        hit_tag += "_"
    hit = (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("m")) != F.lit(0)).cast(
        "int"
    )
    return (
        keyed.join(words, "word_idx", "left")
        .select(tag, *group_cols, hit.alias(hit_tag))
        .groupBy(tag, *group_cols)
        .agg((F.min(hit_tag) == F.lit(1)).alias("bloom_member"))
        .drop(tag)
    )

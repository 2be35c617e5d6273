"""Incremental MinHash near-dup over a document STREAM
(SURVEY §2.12 × §2.9 [extension]): the continuous form of
`ext/dedup.minhash_lsh_pairs` for corpora that arrive file-by-file.

Shape: `foreachBatch` — the standard pattern when a streaming sink needs
a batch-only operation (here: joining against, then appending to, a
persisted signature STORE):

    per micro-batch B:
      1. shingle→minhash→band B's docs (same expressions as batch),
      2. equi-join B's band keys against the store's band keys
         (new-vs-OLD candidates) and B against itself (new-vs-NEW),
      3. exact-Jaccard verify survivors → append to the pairs sink,
      4. append B's signatures to the store.

State lives in the parquet store, not executor memory — restart-safe and
unbounded-corpus-safe (the store grows with the corpus; the per-batch
join is band-key equi-keyed exactly like the batch plan). Dedup semantics
match the batch pipeline run over the same files in one shot: pair
(a, b) is found when the LATER document's batch arrives — asserted by
the stream==batch equivalence test.

Exactly-once OUTPUT despite at-least-once foreachBatch execution: both
sinks are partitioned by batch_id and written with dynamic-partition
OVERWRITE, so a batch replayed after a crash (e.g. between the pairs
write and the checkpoint commit) rewrites its own partition instead of
appending duplicates; and the old-vs-new join reads only store rows with
batch_id < current, so a replay never sees its own half-written
signatures as "old" corpus.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.ext.dedup import lsh_bands, minhash_signature, word_shingles
from scripts_toolkit_spark.materialize import materialize as _materialize

SIG_SCHEMA = (
    "doc_id bigint, sset array<string>, "
    "bands array<struct<band:int,key:string>>, batch_id bigint"
)


def _signatures(docs: DataFrame, text_col: str, id_col: str,
                k: int, perms: int, bands: int) -> DataFrame:
    rows = perms // bands
    return (
        # pre-filter < k-word docs on the raw word count (≡ empty sset:
        # md5('') bucketing + 0/0 NaN divergence, mirroring
        # ext/dedup.minhash_lsh_pairs — a post-projection size(sset)
        # filter would re-inline the signature tree below itself)
        docs.where(F.size(F.split(text_col, " ")) >= k)
        .select(F.col(id_col).alias("doc_id"), word_shingles(text_col, k).alias("sh"))
        .select(
            "doc_id",
            F.array_distinct("sh").alias("sset"),
            lsh_bands(minhash_signature(F.col("sh"), perms), bands, rows).alias("bands"),
        )
    )


def _banded(sig: DataFrame) -> DataFrame:
    return sig.select("doc_id", "sset", F.explode("bands").alias("b")).select(
        "doc_id", "sset", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )


def _verify(cand: DataFrame, threshold: float) -> DataFrame:
    return (
        cand.withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b")).cast("double")
            / F.size(F.array_union("set_a", "set_b")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def make_batch_processor(
    store_path: str,
    pairs_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    perms: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
):
    """Build the foreachBatch callable. Exposed so the replay-idempotency
    test can invoke the same (batch, batch_id) twice and assert the
    committed output is unchanged."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        sig = _signatures(batch, text_col, id_col, k, perms, bands).transform(_materialize)
        new_banded = _banded(sig).transform(_materialize)

        try:
            store = spark.read.schema(SIG_SCHEMA).parquet(store_path)
        except AnalysisException:  # first batch: store path not created yet
            old_banded = None
        else:
            # replay safety: a retried batch must not see its own (or any
            # later, partially-committed) signatures as "old" corpus
            old_banded = _banded(store.where(F.col("batch_id") < F.lit(batch_id)))

        n = new_banded.select(
            F.col("doc_id").alias("id_b"), F.col("sset").alias("set_b"), "band", "key"
        )
        # new-vs-new (within this batch), ordered pairs
        nn = (
            new_banded.select(
                F.col("doc_id").alias("id_a"), F.col("sset").alias("set_a"), "band", "key"
            )
            .join(n, ["band", "key"])
            .where(F.col("id_a") < F.col("id_b"))
        )
        cands = nn
        if old_banded is not None:
            # old-vs-new: the OLD id takes the id_a slot when smaller, so the
            # emitted orientation matches the batch pipeline's id_a < id_b
            on = (
                old_banded.select(
                    F.col("doc_id").alias("id_o"), F.col("sset").alias("set_o"), "band", "key"
                )
                .join(n, ["band", "key"])
                .where(F.col("id_o") != F.col("id_b"))
                .select(
                    F.least("id_o", "id_b").alias("id_a"),
                    F.greatest("id_o", "id_b").alias("id_b2"),
                    F.when(F.col("id_o") < F.col("id_b"), F.col("set_o"))
                    .otherwise(F.col("set_b"))
                    .alias("set_a"),
                    F.when(F.col("id_o") < F.col("id_b"), F.col("set_b"))
                    .otherwise(F.col("set_o"))
                    .alias("set_b2"),
                )
                .withColumnsRenamed({"id_b2": "id_b", "set_b2": "set_b"})
            )
            cands = cands.select("id_a", "id_b", "set_a", "set_b").unionByName(
                on.select("id_a", "id_b", "set_a", "set_b")
            )
        else:
            cands = cands.select("id_a", "id_b", "set_a", "set_b")

        pairs = _verify(cands.dropDuplicates(["id_a", "id_b"]), jaccard_threshold)
        # idempotent per batch_id: dynamic-partition overwrite replaces only
        # this batch's partition on replay (never other batches' output)
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairs_path)
        )
        (
            sig.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    return _process


def start_incremental_dedup(
    doc_stream: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    perms: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
):
    """Start the incremental dedup query (availableNow-style callers drive
    it to completion with awaitTermination). The committed pairs output
    contains each verified pair (id_a < id_b) exactly once: foreachBatch
    replays are absorbed by the per-batch_id dynamic-partition overwrite
    (see module docstring)."""
    process = make_batch_processor(
        store_path,
        pairs_path,
        text_col=text_col,
        id_col=id_col,
        k=k,
        perms=perms,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
    )
    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

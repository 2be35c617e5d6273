"""Streaming assign-only ingestion into the persistent ANN index
(SURVEY §2.12 × §2.9 [extension]): the continuous form of
`ext/ann_index.append_to_index` for vector corpora that arrive
file-by-file, plus streaming similarity MATCHING of each batch against
everything ingested before it.

Shape: `foreachBatch` against a PRE-BUILT index (`build_ann_index` runs
once, before the stream starts — a 100 TB pipeline trains its model
offline and never retrains in the hot path). The batch builder stamps its
rows batch_id = -1 and partitions the store by batch_id, so a
pre-populated corpus passes the `batch_id < current` prior-store filter
and participates in cross-batch matching from the first streamed batch
(tests/test_ann_stream.py::test_stream_matches_prebuilt_corpus):

    per micro-batch B:
      1. normalize B's vectors, assign home cells with the STORED
         centroids (literal-codebook kernel — no shuffle),
      2. IVF-search B against the PRIOR store (batch_id < current):
         probe n_probe stored cells, exact cosine, per-query top-k →
         append to the matches sink,
      3. append B's encoded rows to the store.

State lives in the parquet store, not executor memory — restart-safe.
An incrementally-ingested store is row-identical to a one-shot
`build_ann_index` over the same vectors with the same model (the batch
parity contract, extended to streams by
tests/test_ann_stream.py::test_stream_store_matches_batch).

Exactly-once OUTPUT despite at-least-once foreachBatch execution: the
same discipline as streaming/dedup_stream.py — both sinks partition by
batch_id and write with dynamic-partition OVERWRITE, so a replayed batch
rewrites its own partition; the match join reads only store rows with
batch_id < current, so a replay never matches against its own
half-written rows.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scripts_toolkit_spark.ext.ann_index import _index_n_home
from scripts_toolkit_spark.ext.similarity import _dot, ivf_assign, normalize_vectors
from scripts_toolkit_spark.materialize import materialize as _materialize

STORE_SCHEMA = (
    "vec_id bigint, embedding array<double>, cell_id int, probe_rank int, "
    "batch_id bigint"
)


def make_ann_ingest_processor(
    index_path: str,
    matches_path: str,
    k: int = 3,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build the foreachBatch callable (exposed for the replay-idempotency
    test). Requires `{index_path}/centroids` to exist (build the model
    first with `build_ann_index`, or write centroids directly).

    The index's spilled-assignment width (meta n_home, 1 when absent) is
    honored per batch: new rows land in their n_home nearest cells, the
    cross-batch match probes ALL stored copies (the recall lift reaches
    the stream), and (query, neighbor) pairs dedup before ranking — so a
    spill-built index ingested by stream stays row-identical to a
    one-shot spilled build (tests/test_ann_stream.py parity, n_home=2)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        cents = spark.read.parquet(index_path + "/centroids")
        n_home = _index_n_home(spark, index_path)
        assigned = (
            ivf_assign(
                normalize_vectors(batch, id_col, vec_col), cents,
                max(n_probe, n_home), id_col, vec_col, with_rank=True,
            )
            .transform(_materialize)
        )
        new_rows = assigned.where(F.col("probe_rank") <= n_home).select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"),
            "cell_id", "probe_rank",
        )
        try:
            store = spark.read.schema(STORE_SCHEMA).parquet(index_path + "/vectors")
        except AnalysisException:  # first batch: store not created yet
            old = None
        else:
            old = store.where(F.col("batch_id") < F.lit(batch_id))
        if old is not None:
            queries = assigned.where(F.col("probe_rank") <= n_probe).select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell_id"
            )
            corpus = old.select(
                F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"),
                "cell_id",
            )
            scored = (
                queries.join(corpus, "cell_id")
                .where(F.col("query_id") != F.col("neighbor_id"))
                .select(
                    "query_id", "neighbor_id",
                    _dot(F.col("qv"), F.col("cv")).alias("cos_sim"),
                )
            )
            if n_home > 1:
                # a pair can arise from up to n_home shared cells (every
                # stored copy scores the identical dot) — dedup first
                scored = scored.dropDuplicates(["query_id", "neighbor_id"])
            w = Window.partitionBy("query_id").orderBy(
                F.desc("cos_sim"), F.asc("neighbor_id")
            )
            matches = (
                scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select(
                    "query_id", "neighbor_id",
                    F.col("rank").cast("int").alias("rank"), "cos_sim",
                )
            )
        else:
            matches = spark.createDataFrame(
                [], "query_id bigint, neighbor_id bigint, rank int, cos_sim double"
            )
        (
            matches.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(matches_path)
        )
        (
            new_rows.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(index_path + "/vectors")
        )

    return _process


def start_ann_ingest(
    vector_stream: DataFrame,
    index_path: str,
    matches_path: str,
    checkpoint: str,
    k: int = 3,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Start the streaming ingestion query (availableNow callers drive it
    to completion with awaitTermination). The committed matches output
    holds, per query vector, its top-k cosine matches among all vectors
    ingested in EARLIER batches — exactly once (per-batch_id
    dynamic-partition overwrite absorbs foreachBatch replays)."""
    process = make_ann_ingest_processor(
        index_path, matches_path, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    )
    return (
        vector_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

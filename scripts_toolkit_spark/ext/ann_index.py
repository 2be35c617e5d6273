"""Persistent, incrementally-reusable ANN index (SURVEY.md §2.12
[extension]; round-5 verdict "What's missing" #2).

A 100 TB pipeline does not retrain its vector index per query: it trains
ONCE (centroid pick ± Lloyd refinement), persists the model + the encoded
corpus, and ASSIGN-ONLY encodes every later batch against the stored
model — the same discipline as the minhash signature store
(streaming/dedup_stream.py). This module is that store for the IVF
family:

    {path}/centroids   (cell_id int, centroid array<double>)   — KB model
    {path}/codebook    (s int, code int, csub array<double>)   — optional PQ model
    {path}/vectors     (vec_id, embedding array<double> UNIT-NORM, cell_id)
                       — the encoded corpus; append-only

Design rules
- Vectors are stored L2-NORMALIZED, so search cosine = plain dot
  (sequential fold) and the IVF affinity argmax is the cosine argmax.
- `append_to_index` never re-picks or re-trains: new vectors are assigned
  with the STORED centroids, so an incrementally-built store is
  row-identical to a one-shot build with the same model (pinned by
  tests/test_ext.py::test_ann_index_incremental_parity).
- The model frames are KB-scale control plane (√N cells); the corpus
  frame is the only SF-linear table and it is written/read as plain
  parquet — partition pruning and pushdown apply as for any table.
- Everything on the default path is md5-seeded + sequential-fold
  deterministic → the registered demos are oracle-replayable
  (plans/ext_demos.py ANN_INDEX_BUILD_SQL / ANN_TOPK_INCREMENTAL_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scripts_toolkit_spark.ext.similarity import (
    _dot,
    auto_n_cells,
    deterministic_centroids,
    ivf_assign,
    normalize_vectors,
)
from scripts_toolkit_spark.materialize import materialize as _materialize


def build_ann_index(
    vectors: DataFrame,
    path: str,
    n_cells: int | None = None,
    centroids: DataFrame | None = None,
    sub_codebook: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train + persist the index; returns the stored corpus frame.

    `centroids` may be a pre-refined (Lloyd) model; default is the
    deterministic md5-prefix pick over the normalized image. Passing
    `sub_codebook` additionally persists a PQ model (not needed for the
    IVF search path)."""
    par = vectors.sparkSession.sparkContext.defaultParallelism
    normed = normalize_vectors(vectors.repartition(par), id_col, vec_col).transform(_materialize)
    if centroids is None:
        if n_cells is None:
            n_cells = auto_n_cells(normed)
        centroids = deterministic_centroids(normed, n_cells, id_col, vec_col)
    centroids = centroids.transform(_materialize)
    centroids.write.mode("overwrite").parquet(path + "/centroids")
    if sub_codebook is not None:
        sub_codebook.write.mode("overwrite").parquet(path + "/codebook")
    stored = ivf_assign(normed, centroids, 1, id_col, vec_col).where(
        F.col("is_home")
    ).select(id_col, vec_col, "cell_id")
    stored.write.mode("overwrite").parquet(path + "/vectors")
    return vectors.sparkSession.read.parquet(path + "/vectors")


def append_to_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign-only ingestion of a late batch: normalize, assign home cells
    with the STORED centroids (no re-pick, no retrain — the whole point),
    append to the corpus parquet. Returns the updated corpus frame."""
    cents = spark.read.parquet(path + "/centroids")
    normed = normalize_vectors(new_vectors, id_col, vec_col)
    assigned = ivf_assign(normed, cents, 1, id_col, vec_col).where(
        F.col("is_home")
    ).select(id_col, vec_col, "cell_id")
    assigned.write.mode("append").parquet(path + "/vectors")
    return spark.read.parquet(path + "/vectors")


def search_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame | None = None,
    k: int = 3,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search against the stored corpus: each query probes its
    `n_probe` nearest STORED centroids, candidates come from the stored
    home-cell lists (equi-join on cell_id — no cross join), ranking is
    exact cosine (= dot; both sides unit-norm). `queries=None` searches
    the corpus against itself (the registered-demo shape).

    The probe assignment is the literal-codebook kernel (no shuffle); the
    only shuffles are the cell_id equi-join and the per-query top-k."""
    cents = spark.read.parquet(path + "/centroids")
    store = spark.read.parquet(path + "/vectors")
    if queries is None:
        q_normed = store.select(id_col, vec_col)
    else:
        q_normed = normalize_vectors(queries, id_col, vec_col)
    qa = ivf_assign(q_normed, cents, n_probe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell_id"
    )
    corpus = store.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell_id"
    )
    scored = (
        qa.join(corpus, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _dot(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim")
    )

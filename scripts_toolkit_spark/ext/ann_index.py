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
    attach_pq_lut,
    auto_n_cells,
    deterministic_centroids,
    ivf_assign,
    normalize_vectors,
    pq_code_arrays,
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
    stored = ivf_assign(normed, centroids, 1, id_col, vec_col).where(
        F.col("is_home")
    ).select(id_col, vec_col, "cell_id")
    if sub_codebook is not None:
        # two consumers (the vectors write + the codes encoding) — cut once
        stored = stored.transform(_materialize)
    stored.write.mode("overwrite").parquet(path + "/vectors")
    if sub_codebook is not None:
        # persist the PQ model AND the compressed corpus: m ints/vector is
        # the frame the compressed-domain search joins at 100 TB
        sub_codebook.write.mode("overwrite").parquet(path + "/codebook")
        m = sub_codebook.agg(F.max("s")).first()[0] + 1
        sub_dim = len(sub_codebook.select("csub").first()["csub"])
        codes = pq_code_arrays(
            stored.select(id_col, vec_col), sub_codebook, m, sub_dim, id_col, vec_col
        ).join(stored.select(id_col, "cell_id"), id_col)
        codes.write.mode("overwrite").parquet(path + "/codes")
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
    use_pq: bool = False,
    rerank_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search against the stored corpus: each query probes its
    `n_probe` nearest STORED centroids, candidates come from the stored
    home-cell lists (equi-join on cell_id — no cross join), ranking is
    exact cosine (= dot; both sides unit-norm). `queries=None` searches
    the corpus against itself (the registered-demo shape).

    `use_pq=True` (requires a codebook-built index): the candidate join
    carries the STORED m-int code arrays instead of raw vectors — the
    compressed-domain shape that wins at 100 TB — with per-(query,
    probed-cell) ADC shortlists (`attach_pq_lut`, same kernel as
    `ivfpq_topk`) and an exact-cosine rerank of the shortlist union
    against the stored raw vectors. With the same model inputs this
    returns EXACTLY `ivfpq_topk`'s rows (bit-identical LUT/argmin —
    pinned by test_stored_pq_search_equals_ivfpq).

    The probe assignment is the literal-codebook kernel (no shuffle); the
    only shuffles are the cell_id equi-join, the gather, and the
    per-query top-k."""
    cents = spark.read.parquet(path + "/centroids")
    store = spark.read.parquet(path + "/vectors")
    if queries is None:
        q_normed = store.select(id_col, vec_col)
    else:
        q_normed = normalize_vectors(queries, id_col, vec_col)
    qa0 = ivf_assign(q_normed, cents, n_probe, id_col, vec_col)
    if not use_pq:
        qa = qa0.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell_id"
        )
        corpus = store.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell_id"
        )
        scored = (
            qa.join(corpus, "cell_id")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id", "neighbor_id", _dot(F.col("qv"), F.col("cv")).alias("cos_sim")
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
                "cos_sim",
            )
        )
    import numpy as np

    cb_rows = sorted(
        (int(r["s"]), int(r["code"]), list(r["csub"]))
        for r in spark.read.parquet(path + "/codebook").collect()
    )
    m = cb_rows[-1][0] + 1
    n_codes = len(cb_rows) // m
    sub_dim = len(cb_rows[0][2])
    cb_np = np.asarray([csub for _s, _c, csub in cb_rows], dtype=np.float64)
    assigned = attach_pq_lut(qa0, cb_np, m, n_codes, sub_dim, vec_col).transform(
        _materialize
    )
    queries_f = assigned.select(F.col(id_col).alias("query_id"), "cell_id")
    qlut = assigned.where(F.col("is_home")).select(
        F.col(id_col).alias("query_id"), "lut"
    )
    corpus_codes = spark.read.parquet(path + "/codes").select(
        F.col(id_col).alias("neighbor_id"), "cell_id", "ncodes"
    )
    cand = (
        queries_f.join(corpus_codes, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "cell_id", "neighbor_id", "ncodes")
    )
    shortlist_n = rerank_factor * k
    gathered = (
        cand.groupBy("query_id", "cell_id")
        .agg(F.collect_list(F.struct("neighbor_id", "ncodes")).alias("cands"))
        .join(qlut, ["query_id"])
    )

    def _adc(c):
        total = None
        for s in range(m):
            part = F.get("lut", F.lit(s * n_codes) + F.get(c["ncodes"], s))
            total = part if total is None else total + part
        return F.struct(total.alias("adc_dist"), c["neighbor_id"].alias("neighbor_id"))

    shortlist = gathered.select(
        "query_id",
        F.explode(
            F.slice(F.array_sort(F.transform("cands", _adc)), 1, shortlist_n)
        ).alias("sl"),
    ).select("query_id", F.col("sl.neighbor_id").alias("neighbor_id"))
    qv = (store if queries is None else q_normed).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    nv = store.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    reranked = (
        shortlist.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", _dot(F.col("qv"), F.col("nv")).alias("cos_sim"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim"
        )
    )

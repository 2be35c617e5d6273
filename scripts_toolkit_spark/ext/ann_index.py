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
                       — the encoded corpus; append-only, PARTITIONED BY
                       batch_id (train-time rows carry batch_id = -1, each
                       `append_to_index` batch the next integer) so the
                       streaming ingester's `batch_id < current` filter and
                       the staleness report read the same store the batch
                       builder wrote
    {path}/codes       (vec_id, ncodes array<int>, cell_id)    — optional
                       PQ-compressed corpus; kept row-parity with /vectors
                       by `append_to_index` (late batches are encoded with
                       the STORED codebook)

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
- Lifecycle: `index_health` (staleness report: occupancy skew +
  appended-since-train fraction, one scan), `compact_index` (merge append
  partitions, model untouched), `delete_from_index` (anti-join /vectors +
  /codes), `retrain_index` (re-pick + re-assign in place == fresh build).
- Everything on the default path is md5-seeded + sequential-fold
  deterministic → the registered demos are oracle-replayable
  (plans/ext_demos.py ANN_INDEX_BUILD_SQL / ANN_TOPK_INCREMENTAL_SQL).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scripts_toolkit_spark.ext.similarity import (
    _dot,
    attach_pq_lut,
    auto_n_cells,
    corpus_stats,
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
    # one stats job serves both auto_n_cells' count AND ivf_assign's
    # collect-before-guard (net-zero jobs vs the former bare .count())
    n_rows, dim = corpus_stats(normed, vec_col)
    if centroids is None:
        if n_cells is None:
            n_cells = auto_n_cells(normed, n_rows=n_rows)
        # the exact pick is already a driver-local literal frame — no corpus
        # lineage to cut
        centroids = deterministic_centroids(normed, n_cells, id_col, vec_col, n_rows=n_rows)
    else:
        # caller-provided model (e.g. Lloyd-refined): cut its corpus lineage
        centroids = centroids.transform(_materialize)
    centroids.write.mode("overwrite").parquet(path + "/centroids")
    stored = ivf_assign(
        normed, centroids, 1, id_col, vec_col, n_cells=n_cells, dim=dim
    ).where(
        F.col("is_home")
    ).select(id_col, vec_col, "cell_id")
    if sub_codebook is not None:
        # two consumers (the vectors write + the codes encoding) — cut once
        stored = stored.transform(_materialize)
    # train-time rows are stamped batch_id = -1 and the store is partitioned
    # by batch_id, so the streaming ingester's `batch_id < current` prior-
    # store filter sees the pre-built corpus (it would silently project NULL
    # and drop every row from cross-batch matching otherwise) and the
    # layout stays uniform when appends land as batch_id=N subdirs
    (
        stored.withColumn("batch_id", F.lit(-1).cast("bigint"))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(path + "/vectors")
    )
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
    append to the corpus parquet under the next batch_id partition. When
    the index was codebook-built, the batch is ALSO PQ-encoded with the
    STORED codebook and appended to {path}/codes, so the compressed-domain
    search (`search_index(use_pq=True)`) sees late vectors as candidates —
    the incremental==one-shot parity contract holds for both search paths
    (tests/test_ext.py::test_ann_index_pq_append_parity). Returns the
    updated corpus frame."""
    cents = spark.read.parquet(path + "/centroids")
    normed = normalize_vectors(new_vectors, id_col, vec_col)
    assigned = ivf_assign(normed, cents, 1, id_col, vec_col).where(
        F.col("is_home")
    ).select(id_col, vec_col, "cell_id")
    prev_max = spark.read.parquet(path + "/vectors").agg(F.max("batch_id")).first()[0]
    next_batch = int(prev_max) + 1 if prev_max is not None else 0
    try:
        codebook = spark.read.parquet(path + "/codebook")
    except AnalysisException:  # IVF-only index: no PQ model to keep in sync
        codebook = None
    if codebook is not None:
        # two consumers below (vectors append + codes encoding) — cut once
        assigned = assigned.transform(_materialize)
    (
        assigned.withColumn("batch_id", F.lit(next_batch).cast("bigint"))
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(path + "/vectors")
    )
    if codebook is not None:
        m = codebook.agg(F.max("s")).first()[0] + 1
        sub_dim = len(codebook.select("csub").first()["csub"])
        codes = pq_code_arrays(
            assigned.select(id_col, vec_col), codebook, m, sub_dim, id_col, vec_col
        ).join(assigned.select(id_col, "cell_id"), id_col)
        codes.write.mode("append").parquet(path + "/codes")
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


def index_health(
    spark: SparkSession,
    path: str,
    skew_limit: float = 4.0,
    appended_limit: float = 0.25,
) -> DataFrame:
    """Staleness report for a stored index (round-6 verdict Next #3a): ONE
    hash-agg scan over the corpus frame summarizing the two signals that
    degrade an assign-only index as the corpus grows past its frozen
    model — per-cell occupancy skew (a hot cell makes every probe of it
    pay its occupancy) and the appended-since-train fraction (rows the
    centroid pick never saw). `needs_retrain` fires when either exceeds
    its limit; the operator answers with `retrain_index`.

    All arithmetic is exact-int counts + double ratios (sequential, no
    fold over floats) → oracle-replayable in SQL. One row out."""
    n_trained = spark.read.parquet(path + "/centroids").agg(
        F.count(F.lit(1)).alias("n_cells_trained")
    )
    occ = (
        spark.read.parquet(path + "/vectors")
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.when(F.col("batch_id") >= 0, 1).otherwise(0)).alias("app"),
        )
    )
    avg_cell = F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double")
    skew = F.max("cnt").cast("double") / avg_cell
    app_frac = F.sum("app").cast("double") / F.sum("cnt").cast("double")
    summary = occ.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells_occupied"),
        F.sum("cnt").cast("bigint").alias("n_vectors"),
        F.max("cnt").cast("bigint").alias("max_cell_vectors"),
        F.round(avg_cell, 6).alias("avg_cell_vectors"),
        F.round(skew, 6).alias("occupancy_skew"),
        F.sum("app").cast("bigint").alias("appended_vectors"),
        F.round(app_frac, 6).alias("appended_frac"),
        ((skew > F.lit(float(skew_limit))) | (app_frac > F.lit(float(appended_limit))))
        .alias("needs_retrain"),
    )
    # one-row × one-row: AQE broadcasts; exempt scalar pattern
    return n_trained.crossJoin(summary).select(
        F.col("n_cells_trained").cast("bigint").alias("n_cells_trained"),
        "n_cells_occupied", "n_vectors", "max_cell_vectors", "avg_cell_vectors",
        "occupancy_skew", "appended_vectors", "appended_frac", "needs_retrain",
    )


def compact_index(spark: SparkSession, path: str) -> DataFrame:
    """Merge the accumulated per-batch partitions into the train-time
    partition (batch_id = -1) WITHOUT touching the model: assignments,
    /centroids and /codes are unchanged — only the /vectors layout is
    rewritten. The cheap answer when `index_health` shows many small
    append partitions (file-count pressure) but acceptable skew: after a
    compact, `appended_frac` reads 0 while search results are identical.
    The corpus is materialized before the in-place overwrite."""
    snap = (
        spark.read.parquet(path + "/vectors")
        .select("vec_id", "embedding", "cell_id")
        .transform(_materialize)
    )
    (
        snap.withColumn("batch_id", F.lit(-1).cast("bigint"))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(path + "/vectors")
    )
    return spark.read.parquet(path + "/vectors")


def delete_from_index(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Remove vectors by id from the store: anti-join /vectors (and /codes
    when present) against `ids` and rewrite in place — deleted vectors can
    no longer surface as neighbors on either search path. The model
    (centroids/codebook) is untouched: deletes only shrink cells, so
    retraining after heavy deletion is an `index_health` + `retrain_index`
    decision, not an implicit side effect. Both frames are materialized
    before their in-place overwrites."""
    key = ids.select(F.col(id_col)).distinct().transform(_materialize)
    kept = (
        spark.read.parquet(path + "/vectors")
        .join(key, id_col, "left_anti")
        .select(id_col, "embedding", "cell_id", "batch_id")
        .transform(_materialize)
    )
    kept.write.mode("overwrite").partitionBy("batch_id").parquet(path + "/vectors")
    try:
        codes = spark.read.parquet(path + "/codes")
    except AnalysisException:
        codes = None
    if codes is not None:
        kept_codes = codes.join(key, id_col, "left_anti").transform(_materialize)
        kept_codes.write.mode("overwrite").parquet(path + "/codes")
    return spark.read.parquet(path + "/vectors")


def retrain_index(
    spark: SparkSession,
    path: str,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Re-train the stored model in place (round-6 verdict Next #3b): re-pick
    centroids over the CURRENT corpus (train-time + appended rows), re-assign
    every stored vector, and rewrite /centroids + /vectors (+ /codes when a
    codebook exists) — the answer to `index_health.needs_retrain`.

    Stored vectors are already unit-norm, and `deterministic_centroids`
    orders by md5(id), so a retrain after appends is ROW-IDENTICAL to a
    fresh `build_ann_index` over the same corpus (pinned by
    tests/test_ext.py::test_ann_index_retrain_equals_fresh_build). The
    corpus is materialized (localCheckpoint/checkpoint per the configured
    mode) before the in-place overwrite — Spark cannot otherwise overwrite
    a path it is reading. batch_id resets to -1: after a retrain the whole
    corpus is train-time. Returns the rewritten corpus frame."""
    snap = (
        spark.read.parquet(path + "/vectors")
        .select(id_col, vec_col)
        .transform(_materialize)
    )
    n_rows, dim = corpus_stats(snap, vec_col)
    if n_cells is None:
        n_cells = auto_n_cells(snap, n_rows=n_rows)
    cents = deterministic_centroids(snap, n_cells, id_col, vec_col, n_rows=n_rows)
    cents.write.mode("overwrite").parquet(path + "/centroids")
    stored = ivf_assign(
        snap, cents, 1, id_col, vec_col, n_cells=n_cells, dim=dim
    ).where(
        F.col("is_home")
    ).select(id_col, vec_col, "cell_id")
    try:
        codebook = spark.read.parquet(path + "/codebook").transform(_materialize)
    except AnalysisException:
        codebook = None
    if codebook is not None:
        stored = stored.transform(_materialize)
    (
        stored.withColumn("batch_id", F.lit(-1).cast("bigint"))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(path + "/vectors")
    )
    if codebook is not None:
        m = codebook.agg(F.max("s")).first()[0] + 1
        sub_dim = len(codebook.select("csub").first()["csub"])
        codes = pq_code_arrays(
            stored.select(id_col, vec_col), codebook, m, sub_dim, id_col, vec_col
        ).join(stored.select(id_col, "cell_id"), id_col)
        codes.write.mode("overwrite").parquet(path + "/codes")
    return spark.read.parquet(path + "/vectors")

"""Third demo wave: the remaining BASELINE dedup modes (embedding-cosine
near-dup, character-n-gram Jaccard), exact percentiles, and explicit
GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scripts_toolkit_spark.ext import dedup as DD
from scripts_toolkit_spark.ext import similarity as SIM
from scripts_toolkit_spark.ext.similarity import cosine
from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.materialize import materialize as _materialize

# LSH-bucket tuning for the embedding near-dup demo: planted near-dups sit
# at cos ≈ 0.95 (θ ≈ 17°, per-plane collision p ≈ 0.9) → per-table p^8 ≈
# 0.45, OR across 4 tables ≈ 0.91 recall; random pairs (cos ≈ 0) collide
# with p ≈ 0.5^8 per table ≈ 1.5% over 4 tables, bounding candidates.
_EMB_BITS, _EMB_TABLES, _EMB_TAU = 8, 4, 0.9

_EMB_CORPUS_SQL = """
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
    list_transform(range(1, 65), i -> CASE WHEN i = 1
      THEN CAST(embedding[i] AS DOUBLE) + 0.3
      ELSE CAST(embedding[i] AS DOUBLE) END)
  FROM embeddings WHERE vec_id % 5 = 0
"""


def _embeddings_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ perturbed copies (vec_id + 10^6, +0.3 on element 0) so
    true near-duplicates (cos ≈ 0.95) exist deterministically at every SF —
    same pattern as the text near-dup demos' `_docs_with_dups`."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    pert = emb.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") + 0.3).otherwise(x.cast("double")),
        ).alias("v"),
    )
    return base.unionByName(pert)


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via sign-bucket LSH: explode each vector to
    (table, bucket) keys over md5-derived hyperplanes
    (ext/similarity.lsh_bucket), equi-join on the keys, exact cosine ≥ τ
    within buckets only. No cross join anywhere — candidate volume is
    controlled by (bits, tables), the plan that survives 100 TB. The oracle
    recomputes the identical deterministic buckets in SQL (hyperplane signs
    from the same md5 parity, same sequential fold), so results hash-match
    exactly; recall vs the exact all-pairs baseline is asserted in pytest."""
    corpus = _embeddings_with_dups(spark, sf_dir)
    # Materialization boundary: `v` feeds bits×tables hyperplane dots plus
    # both join legs — left lazy, Catalyst inlines the projection per
    # reference (CLAUDE.md rule; measured on the minhash pipeline).
    parallelism = spark.sparkContext.defaultParallelism
    corpus = corpus.repartition(parallelism).transform(_materialize)

    keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                SIM.lsh_bucket(F.col("v"), 64, bits=_EMB_BITS, table=t).alias("bucket"),
            )
            for t in range(_EMB_TABLES)
        ]
    )
    banded = corpus.select("vec_id", F.explode(keys).alias("k")).select(
        "vec_id", F.col("k.tbl").alias("tbl"), F.col("k.bucket").alias("bucket")
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["tbl", "bucket"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b"))
        .distinct()
    )
    vecs = corpus.select("vec_id", "v")
    return (
        cand.join(vecs.withColumnsRenamed({"vec_id": "id_a", "v": "va"}), "id_a")
        .join(vecs.withColumnsRenamed({"vec_id": "id_b", "v": "vb"}), "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .where(F.col("cos_sim") >= _EMB_TAU)
    )


# The oracle replays the full LSH pipeline: same corpus union, same
# md5-parity hyperplane signs, same sequential-fold dots → identical
# buckets → identical candidate set → identical verified pairs.
EMBEDDING_NEAR_DUP_PAIRS_SQL = f"""
WITH corpus AS ({_EMB_CORPUS_SQL}),
keys AS (
  SELECT vec_id, tbl,
    CAST(SUM(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
  FROM (
    SELECT vec_id, tbl, j,
      list_reduce(list_transform(range(1, 65),
        i -> v[i] * (CASE WHEN CAST(('0x' || substr(md5(
            'h' || CAST(tbl * 1000 + j AS VARCHAR) || '|' || CAST(i - 1 AS VARCHAR)
          ), 1, 2)) AS INT) % 2 = 0 THEN 1.0 ELSE -1.0 END)),
        (x, y) -> x + y) AS d
    FROM corpus, UNNEST(range({_EMB_TABLES})) AS t(tbl), UNNEST(range({_EMB_BITS})) AS r(j)
  )
  GROUP BY vec_id, tbl
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM keys x JOIN keys y USING (tbl, bucket)
  WHERE x.vec_id < y.vec_id
),
scored AS (
  SELECT id_a, id_b,
    list_reduce(list_transform(range(1, 65), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(range(1, 65), i -> a.v[i] * a.v[i]), (x, y) -> x + y))
     * sqrt(list_reduce(list_transform(range(1, 65), i -> b.v[i] * b.v[i]), (x, y) -> x + y))) AS cos_sim
  FROM cand
  JOIN corpus a ON a.vec_id = id_a
  JOIN corpus b ON b.vec_id = id_b
)
SELECT * FROM scored WHERE cos_sim >= {_EMB_TAU}
"""


def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dedup capstone: LSH near-dup pairs → CONNECTED COMPONENTS
    → one row per duplicate cluster with survivor (min vec_id), size, and
    sorted members — the same pairs→components→survivor pipeline
    `near_dup_clusters` runs for MinHash, over the embedding modality.
    Components via distributed min-label propagation (pointer-halving,
    O(log diameter) rounds); the oracle recomputes the clusters with a
    recursive transitive-closure CTE over the identical pair set."""
    from scripts_toolkit_spark.operators.graph import connected_components

    pairs = embedding_near_dup_pairs(spark, sf_dir).transform(_materialize)
    comp = connected_components(pairs)
    # members: comma-joined string — no complex types in registered outputs
    # (tests/test_registry.py::test_no_complex_types_in_outputs)
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("size"),
        F.min("node").alias("survivor_id"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("node")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("members"),
    )


EMBEDDING_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({EMBEDDING_NEAR_DUP_PAIRS_SQL}),
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM und)
  UNION
  SELECT r.src, e.v FROM reach r JOIN und e ON r.dst = e.u
),
comp AS (SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src)
SELECT component AS cluster_id,
       COUNT(*) AS size,
       MIN(node) AS survivor_id,
       array_to_string(list_sort(list(node)), ',') AS members
FROM comp
GROUP BY component
"""


# s-curve tuning for char-5-gram LSH: 4 bands × 2 rows over an 8-perm
# signature → pairs at j=0.2 collide with p = 1-(1-0.04)^4 ≈ 15%, j=0.3
# with ≈ 31%, while random pairs (j ≈ 0.03) collide with ≈ 0.4% — the
# band join bounds candidates corpus-wide, with NO reliance on a
# low-cardinality metadata column.
_CNG_PERMS, _CNG_BANDS, _CNG_ROWS = 8, 4, 2


def char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard near-dup pairs, bucketed CORPUS-WIDE by
    MinHash band keys over the gram sets (shingle→minhash→band→bucket-join,
    the same scale path as minhash_near_dups) — candidate volume is set by
    the (bands, rows) s-curve, not by any metadata column's cardinality.
    The oracle replays the identical md5 minhash banding in SQL, so the
    emitted pair set hash-matches exactly."""
    d = load_table(spark, sf_dir, "documents")

    def grams(c):
        t = F.col(c)
        n = F.length(t) - 4
        idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
        return F.array_distinct(
            F.when(
                F.length(t) >= 5,
                F.transform(idx, lambda i: t.substr(i, F.lit(5))),
            ).otherwise(F.array(t))
        )

    # Materialization boundary: gset feeds the 8-perm minhash (8 md5's per
    # gram) AND both join legs — checkpoint once (CLAUDE.md rule).
    parallelism = spark.sparkContext.defaultParallelism
    g = (
        d.repartition(parallelism)
        .select("doc_id", grams("text").alias("gset"))
        .select(
            "doc_id",
            "gset",
            DD.lsh_bands(
                DD.minhash_signature(F.col("gset"), _CNG_PERMS), _CNG_BANDS, _CNG_ROWS
            ).alias("bands"),
        )
        .transform(_materialize)
    )
    banded = g.select(
        "doc_id", F.size("gset").alias("n"), F.explode("bands").alias("b")
    ).select("doc_id", "n", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    # LOSSLESS length prefilter (PPJoin-style): jaccard ≥ t forces
    # min(|A|,|B|)/max(|A|,|B|) ≥ t, so the ratio check drops only pairs
    # the exact verify would reject anyway — same results, far fewer
    # full-array comparisons shuffled to the verify stage.
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .where(
            (F.col("x.doc_id") < F.col("y.doc_id"))
            & (
                F.least(F.col("x.n"), F.col("y.n")).cast("double")
                / F.greatest(F.col("x.n"), F.col("y.n"))
                >= 0.2
            )
        )
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    sets = g.select("doc_id", "gset")
    return (
        cand.join(sets.withColumnsRenamed({"doc_id": "id_a", "gset": "ga"}), "id_a")
        .join(sets.withColumnsRenamed({"doc_id": "id_b", "gset": "gb"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("ga", "gb")).cast("double")
                / F.size(F.array_union("ga", "gb")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.2)
    )


CHAR_NGRAM_JACCARD_SQL = f"""
WITH g AS (
  SELECT doc_id,
    list_distinct(CASE WHEN length(text) >= 5
      THEN list_transform(range(1, length(text) - 3), i -> substr(text, i, 5))
      ELSE [text] END) AS gset
  FROM documents
),
sig AS (
  SELECT doc_id, gset,
    [list_min(list_transform(gset, s -> md5(CAST(p AS VARCHAR) || '|' || s)))
     FOR p IN range({_CNG_PERMS})] AS sig
  FROM g
),
banded AS (
  SELECT doc_id, b AS band,
    md5(array_to_string(sig[b * {_CNG_ROWS} + 1 : b * {_CNG_ROWS} + {_CNG_ROWS}], '#')) AS key
  FROM sig, UNNEST(range({_CNG_BANDS})) AS t(b)
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM banded x JOIN banded y USING (band, key)
  WHERE x.doc_id < y.doc_id
),
scored AS (
  SELECT id_a, id_b,
    CAST(len(list_intersect(a.gset, b.gset)) AS DOUBLE)
      / len(list_distinct(list_concat(a.gset, b.gset))) AS jaccard
  FROM cand
  JOIN g a ON a.doc_id = id_a
  JOIN g b ON b.doc_id = id_b
)
SELECT * FROM scored WHERE jaccard >= 0.2
"""


def embedding_quantization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 quantization fidelity report per vector: the scale, the cosine
    between the original and its dequantized image, and the max absolute
    element error — the acceptance check a pipeline runs before switching
    its 100 TB vector store to int8 (4× smaller, ~0.9999 cosine here).
    One projection, no join; oracle replays quantization exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    qt = SIM.quantize_embeddings(emb, keep_vec=True)  # one scan, no self-join
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    deq = SIM.dequantize(F.col("q"), F.col("q_scale"))
    return qt.select(
        "vec_id",
        "q_scale",
        cosine(v, deq).alias("cos_fidelity"),
        F.array_max(F.zip_with(v, deq, lambda a, b: F.abs(a - b))).alias("max_abs_err"),
    )


EMBEDDING_QUANTIZATION_STATS_SQL = """
WITH qt AS (
  SELECT vec_id,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS q_scale,
    embedding
  FROM embeddings
),
deq AS (
  SELECT vec_id, q_scale,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
    list_transform(embedding, x -> round(CAST(x AS DOUBLE) / q_scale) * q_scale) AS d
  FROM qt
)
SELECT vec_id, q_scale,
  list_reduce(list_transform(range(1, 65), i -> v[i] * d[i]), (x, y) -> x + y)
  / (sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]), (x, y) -> x + y))
   * sqrt(list_reduce(list_transform(range(1, 65), i -> d[i] * d[i]), (x, y) -> x + y))) AS cos_fidelity,
  list_max(list_transform(range(1, 65), i -> abs(v[i] - d[i]))) AS max_abs_err
FROM deq
"""


_HIST_BUCKETS = 128


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles from a FIXED-WIDTH HISTOGRAM sketch (128
    equi-width buckets over the global [min, max]), reported beside the
    exact interpolated percentiles — the third sketch family after HLL
    (cardinality) and CMS (frequency). approx_pXX = upper edge of the
    first bucket whose cumulative count crosses q·n.

    Scale shape: the histogram is one (event_type, bucket) hash aggregate
    — ≤ types×128 cells, map-side-combinable; the bucket CDF is a window
    over ≤128 rows per type. At 100 TB that replaces the full sort an
    exact quantile needs. Bounds come from a one-row scalar aggregate
    (broadcast-exempt under the SF-linear lint). Deterministic: equi-width
    bucketing is pure double arithmetic, identical in DuckDB."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(_HIST_BUCKETS))
    b = ev.crossJoin(F.broadcast(mm)).select(
        "event_type",
        "vmin",
        "vmax",
        F.least(
            F.floor((F.col("value") - F.col("vmin")) / width).cast("int"),
            F.lit(_HIST_BUCKETS - 1),
        ).alias("bucket"),
    )
    hist = b.groupBy("event_type", "vmin", "vmax", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cdf = hist.select(
        "event_type",
        "vmin",
        "vmax",
        "bucket",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wtot).alias("n"),
    )
    edge = F.col("vmin") + (F.col("bucket") + 1) * (
        (F.col("vmax") - F.col("vmin")) / F.lit(float(_HIST_BUCKETS))
    )
    approx = cdf.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= 0.5 * F.col("n"), edge)).alias("approx_p50"),
        F.min(F.when(F.col("cum") >= 0.95 * F.col("n"), edge)).alias("approx_p95"),
    )
    exact = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("exact_p50"),
        F.percentile("value", F.lit(0.95)).alias("exact_p95"),
    )
    return approx.join(exact, "event_type").select(
        "event_type", "approx_p50", "approx_p95", "exact_p50", "exact_p95"
    )


HISTOGRAM_QUANTILES_SQL = f"""
WITH mm AS (
  SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events
),
b AS (
  SELECT event_type, vmin, vmax,
    least(CAST(floor((value - vmin) / ((vmax - vmin) / {_HIST_BUCKETS}.0)) AS INT),
          {_HIST_BUCKETS - 1}) AS bucket
  FROM events CROSS JOIN mm
),
hist AS (
  SELECT event_type, vmin, vmax, bucket, COUNT(*) AS c
  FROM b GROUP BY event_type, vmin, vmax, bucket
),
cdf AS (
  SELECT event_type, vmin, vmax, bucket,
    SUM(c) OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    SUM(c) OVER (PARTITION BY event_type) AS n
  FROM hist
),
approx AS (
  SELECT event_type,
    MIN(CASE WHEN cum >= 0.5 * n
        THEN vmin + (bucket + 1) * ((vmax - vmin) / {_HIST_BUCKETS}.0) END) AS approx_p50,
    MIN(CASE WHEN cum >= 0.95 * n
        THEN vmin + (bucket + 1) * ((vmax - vmin) / {_HIST_BUCKETS}.0) END) AS approx_p95
  FROM cdf GROUP BY event_type
),
exact AS (
  SELECT event_type,
    quantile_cont(value, 0.5) AS exact_p50,
    quantile_cont(value, 0.95) AS exact_p95
  FROM events GROUP BY event_type
)
SELECT event_type, approx_p50, approx_p95, exact_p50, exact_p95
FROM approx JOIN exact USING (event_type)
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (Spark `percentile` ↔
    DuckDB `quantile_cont` — same linear-interpolation definition over the
    sorted values)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.95) AS p95,
  MIN(value) AS vmin,
  MAX(value) AS vmax
FROM events
GROUP BY event_type
"""


# HLL sketch geometry: 64 registers from the first md5 byte, rank from the
# next 48 bits. All register updates are MAX aggregates (map-side
# combinable — the property that makes sketched cardinality feasible at
# 100 TB where exact distinct shuffles every key).
_HLL_M = 64
_HLL_ALPHA = 0.709  # alpha_64 constant


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog cardinality estimate per event_type,
    reported next to the exact distinct count.

    Unlike `approx_count_distinct` (whose sketch is engine-private), the
    registers here derive from md5 — register = first byte mod 64, rank =
    leading-zero count of the next 48 bits via `length(bin(w))` — so any
    engine reproduces the estimate BIT-FOR-BIT and the oracle gate applies
    to an approximate algorithm. The register sum is a sum of exact powers
    of two spanning < 53 bits of mantissa, hence order-independent. (The
    standard small/large-range ln corrections are intentionally omitted —
    transcendental libm results are not cross-engine bit-stable; the raw
    estimate is the deterministic contract.)"""
    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % _HLL_M
    w = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")
    rho = F.when(w > 0, F.lit(49) - F.length(F.bin(w))).otherwise(F.lit(49))
    regs = (
        ev.select("event_type", reg.alias("reg"), rho.alias("rho"))
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("mx"))
    )
    sketch = regs.groupBy("event_type").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s_hit"),
        F.count(F.lit(1)).alias("n_hit"),
    )
    exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_exact"))
    return exact.join(sketch, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / (F.col("s_hit") + (F.lit(_HLL_M) - F.col("n_hit")))
        ).alias("hll_estimate"),
        F.col("n_hit").cast("int").alias("n_registers_hit"),
    )


HLL_DISTINCT_USERS_SQL = f"""
WITH r AS (
  SELECT event_type,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)) AS INT) % {_HLL_M} AS reg,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 12)) AS BIGINT) AS w
  FROM events
),
m AS (
  SELECT event_type, reg,
    MAX(CASE WHEN w > 0 THEN 49 - length(bin(w)) ELSE 49 END) AS mx
  FROM r GROUP BY event_type, reg
),
sk AS (
  SELECT event_type, SUM(power(2.0, -mx)) AS s_hit, COUNT(*) AS n_hit
  FROM m GROUP BY event_type
),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY event_type
)
SELECT event_type, n_exact,
  {_HLL_ALPHA * _HLL_M * _HLL_M} / (s_hit + ({_HLL_M} - n_hit)) AS hll_estimate,
  CAST(n_hit AS INT) AS n_registers_hit
FROM ex JOIN sk USING (event_type)
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id disambiguation (A7): totals
    by (status, priority) and by (status) only — not the full rollup."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT
          COALESCE(o_orderstatus, 'ALL') AS status,
          COALESCE(o_orderpriority, 'ALL') AS priority,
          CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus))
        """
    )


GROUPING_SETS_REVENUE_SQL = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid,
  COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus))
"""


# ------------------------------------------------------ iterative PageRank --
# Fixed-point integer PageRank (operators/graph.pagerank_fixed_point) over
# the customer↔supplier bipartite graph of 1995-Q1 orders. The point is
# the ITERATIVE-algorithm shape under the exact oracle gate: a
# double-typed PageRank could never hash-match across engines (float sum
# order), so ranks are BIGINT fixed-point and every update is a floor
# division / exact integer sum - the oracle replays all iterations as
# unrolled CTE blocks.
_PR_ITERS, _PR_SCALE, _PR_DAMP = 6, 10**12, 85


def pagerank_top_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parties by fixed-point PageRank (deterministic tiebreak on
    the node label)."""
    from scripts_toolkit_spark.operators.graph import pagerank_fixed_point

    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").between("1995-01-01", "1995-03-31"))
        .select("o_orderkey", "o_custkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    pr = pagerank_fixed_point(edges, iters=_PR_ITERS, scale=_PR_SCALE, damping_pct=_PR_DAMP)
    from scripts_toolkit_spark.operators.topk import global_topk

    return global_topk(pr, [F.desc("r"), F.asc("node")], 20).select(
        "node", F.col("r").alias("rank_fp"), F.col("rank").cast("int").alias("rank")
    )


def _pagerank_iter_blocks() -> str:
    blocks = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        blocks.append(f""",
pr{i} AS (
  SELECT n.node,
    (SELECT base FROM params) + ({_PR_DAMP} * COALESCE(s.s, 0)) // 100 AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // e.outdeg) AS s
    FROM {prev} p JOIN e ON e.src = p.node
    GROUP BY e.dst
  ) s USING (node)
)""")
        prev = f"pr{i}"
    return "".join(blocks)


PAGERANK_TOP_PARTIES_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                  's' || CAST(l_suppkey AS VARCHAR) AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
),
edges AS (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
e AS (
  SELECT src, dst, outdeg
  FROM edges JOIN (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src) USING (src)
),
params AS (
  SELECT {_PR_SCALE} // COUNT(*) AS r0,
         (15 * ({_PR_SCALE} // COUNT(*))) // 100 AS base
  FROM nodes
),
r0 AS (SELECT node, (SELECT r0 FROM params) AS r FROM nodes){_pagerank_iter_blocks()}
SELECT node, CAST(r AS BIGINT) AS rank_fp, CAST(rnk AS INT) AS rank
FROM (
  SELECT node, r, row_number() OVER (ORDER BY r DESC, node) AS rnk
  FROM pr{_PR_ITERS}
)
WHERE rnk <= 20
"""


def semantic_dedup_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (ext/similarity.semantic_dedup):
    coarse-cluster the dup-augmented embedding corpus into CONSTANT-
    occupancy cells (n_cells = ceil(N/64), deterministic md5-prefix
    centroids; skewed cells md5-sub-split past 4·64 occupants), then drop
    every vector with a cosine-≥-0.9 lower-id clustermate. Candidate
    volume ~N·64/2 via the (cell, sub) equi-join — LINEAR in N, never
    all-pairs (the pre-r7 √N sizing measured ~N^1.5; SCALING.md). The
    oracle replays the centroid pick, nearest-cell assignment, occupancy
    sub-split and in-cell verify in SQL."""
    corpus = _embeddings_with_dups(spark, sf_dir)
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism).transform(_materialize)
    return SIM.semantic_dedup(corpus, n_cells=None, tau=_EMB_TAU, vec_col="v")


_SEM_TARGET, _SEM_SPLIT = 64, 4

SEMANTIC_DEDUP_DROPS_SQL = f"""
WITH corpus AS ({_EMB_CORPUS_SQL}),
nc AS (
  SELECT greatest(16, CAST(ceil(CAST(count(*) AS DOUBLE) / {_SEM_TARGET}) AS INT)) AS n
  FROM corpus
),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cell_id,
         vec_id
  FROM corpus
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= (SELECT n FROM nc)
),
centv AS (
  SELECT cell_id, v AS centroid FROM cents JOIN corpus USING (vec_id)
),
aff AS (
  SELECT e.vec_id, c.cell_id,
    list_reduce(list_transform(range(1, 65), i -> e.v[i] * c.centroid[i]),
      (x, y) -> x + y) AS aff
  FROM corpus e, centv c
),
assigned0 AS (
  SELECT vec_id, cell_id
  FROM aff
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, cell_id) = 1
),
counts AS (SELECT cell_id, count(*) AS cnt FROM assigned0 GROUP BY cell_id),
assigned AS (
  SELECT a.vec_id, a.cell_id,
    CASE WHEN c.cnt > {_SEM_SPLIT * _SEM_TARGET}
      THEN CAST(('0x' || substr(md5('sub|' || CAST(a.vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % CAST(ceil(CAST(c.cnt AS DOUBLE) / {_SEM_TARGET}) AS BIGINT)
      ELSE 0 END AS sub_id
  FROM assigned0 a JOIN counts c USING (cell_id)
),
pairs AS (
  SELECT b.vec_id AS vec_id, a.cell_id AS cell_id, a.vec_id AS keeper_id
  FROM assigned a
  JOIN assigned b USING (cell_id, sub_id)
  JOIN corpus va ON va.vec_id = a.vec_id
  JOIN corpus vb ON vb.vec_id = b.vec_id
  WHERE a.vec_id < b.vec_id
    AND list_reduce(list_transform(range(1, 65), i -> va.v[i] * vb.v[i]), (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform(range(1, 65), i -> va.v[i] * va.v[i]), (x, y) -> x + y))
         * sqrt(list_reduce(list_transform(range(1, 65), i -> vb.v[i] * vb.v[i]), (x, y) -> x + y)))
        >= {_EMB_TAU}
)
SELECT vec_id, cell_id, MIN(keeper_id) AS keeper_id
FROM pairs
GROUP BY vec_id, cell_id
"""


def semantic_dedup_threshold_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXTREME-N semantic-dedup configuration under a full SQL oracle:
    `semantic_dedup(pick='threshold')` forces the branch the engine takes
    past the survivor-collect cap (round-7 verdict Next #1), where the
    centroid pick is the fully-distributed md5-prefix THRESHOLD
    (ext/similarity.threshold_centroids — NO driver collect; cell_id is
    the seed vector's own id, binomial |cells| ≈ ceil(N/64)) instead of
    the exact driver-ranked pick. Assignment, occupancy sub-split and
    in-cell τ-verify are identical to `semantic_dedup_drops`. At demo
    scale the branch is forced so the ORACLE can replay it: threshold
    bound → seed cells → nearest-cell argmax → sub-split → verify, all in
    SQL. (`pick='auto'` takes this same branch once 8·n_cells·dim doubles
    exceed the pick cap — branch detection is pytest-pinned.)"""
    corpus = _embeddings_with_dups(spark, sf_dir)
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism).transform(_materialize)
    return SIM.semantic_dedup(
        corpus, n_cells=None, tau=_EMB_TAU, vec_col="v", pick="threshold"
    )


SEMANTIC_DEDUP_THRESHOLD_DROPS_SQL = f"""
WITH corpus AS ({_EMB_CORPUS_SQL}),
stats AS (
  SELECT count(*) AS n,
         greatest(16, CAST(ceil(CAST(count(*) AS DOUBLE) / {_SEM_TARGET}) AS INT)) AS n_cells
  FROM corpus
),
bound AS (
  SELECT CASE WHEN CAST(n_cells AS DOUBLE) / n >= 1.0 THEN NULL
              ELSE lower(lpad(to_hex(greatest(1,
                CAST(floor(CAST(n_cells AS DOUBLE) / n * 4294967296) AS BIGINT))), 8, '0'))
         END AS b
  FROM stats
),
centv AS (
  SELECT vec_id AS cell_id, v AS centroid
  FROM corpus CROSS JOIN bound
  WHERE b IS NULL OR substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) < b
),
aff AS (
  SELECT e.vec_id, c.cell_id,
    list_reduce(list_transform(range(1, 65), i -> e.v[i] * c.centroid[i]),
      (x, y) -> x + y) AS aff
  FROM corpus e, centv c
),
assigned0 AS (
  SELECT vec_id, cell_id
  FROM aff
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, cell_id) = 1
),
counts AS (SELECT cell_id, count(*) AS cnt FROM assigned0 GROUP BY cell_id),
assigned AS (
  SELECT a.vec_id, a.cell_id,
    CASE WHEN c.cnt > {_SEM_SPLIT * _SEM_TARGET}
      THEN CAST(('0x' || substr(md5('sub|' || CAST(a.vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % CAST(ceil(CAST(c.cnt AS DOUBLE) / {_SEM_TARGET}) AS BIGINT)
      ELSE 0 END AS sub_id
  FROM assigned0 a JOIN counts c USING (cell_id)
),
pairs AS (
  SELECT b.vec_id AS vec_id, a.cell_id AS cell_id, a.vec_id AS keeper_id
  FROM assigned a
  JOIN assigned b USING (cell_id, sub_id)
  JOIN corpus va ON va.vec_id = a.vec_id
  JOIN corpus vb ON vb.vec_id = b.vec_id
  WHERE a.vec_id < b.vec_id
    AND list_reduce(list_transform(range(1, 65), i -> va.v[i] * vb.v[i]), (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform(range(1, 65), i -> va.v[i] * va.v[i]), (x, y) -> x + y))
         * sqrt(list_reduce(list_transform(range(1, 65), i -> vb.v[i] * vb.v[i]), (x, y) -> x + y)))
        >= {_EMB_TAU}
)
SELECT vec_id, cell_id, MIN(keeper_id) AS keeper_id
FROM pairs
GROUP BY vec_id, cell_id
"""


def image_dhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: each (dup-augmented) embedding renders as an
    8×8 grayscale image (the image_decode_stats codec path — PGM encode →
    pure-stdlib decode), the DECODED pixels produce a 64-bit dHash
    (bit i = gray[i] > gray[(i+1) mod 64], scale-invariant by
    construction), and near-duplicate images pair via the SAME multi-block
    combination machinery as text SimHash (`ext/dedup.simhash64_candidates`,
    recall 1.0 for Hamming ≤ 6 by pigeonhole) + exact Hamming verify.

    The planted perturbed copies (+0.3 on one element) shift the
    quantization scale, which moves EVERY pixel — but dHash compares
    neighboring pixels under the same scale, so the fingerprint moves ≤ 3
    bits (measured) while unrelated images stay ~32 bits apart. The
    oracle replays quantization + dHash straight from the embeddings and
    pairs by brute-force XOR popcount; the Spark plan's candidate
    generation is the equi-keyed combination join — never all-pairs."""
    # repartition the RAW corpus (2 scan tasks at sf0.1), THEN quantize:
    # the per-row array arithmetic (3 × 64-element transforms) lands on
    # all cores instead of riding the narrow scan stage (r14, guide §2.5
    # input skew / §1.2 — measured 0.60 s on a 2-task stage before)
    corpus = _embeddings_with_dups(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    qt = SIM.quantize_embeddings(corpus, vec_col="v")
    pix = qt.select("vec_id", F.transform("q", lambda x: x + F.lit(127)).alias("pix"))

    def _hash(pdf_iter):
        import pandas as pd

        from scripts_toolkit_spark.ext import imagecodec as IC

        for pdf in pdf_iter:
            out = {"vec_id": [], "fp_hi": [], "fp_lo": []}
            for vid, pixlist in zip(pdf["vec_id"], pdf["pix"]):
                blob = IC.encode_pgm(8, 8, bytes(int(p) for p in pixlist))
                _w, _h, rgb = IC.decode_image(blob)
                gray = rgb[0::3]
                bits = [1 if gray[i] > gray[(i + 1) % 64] else 0 for i in range(64)]
                out["vec_id"].append(vid)
                out["fp_lo"].append(sum(b << i for i, b in enumerate(bits[:32])))
                out["fp_hi"].append(sum(b << i for i, b in enumerate(bits[32:])))
            yield pd.DataFrame(out)

    fp = pix.mapInPandas(_hash, "vec_id bigint, fp_hi bigint, fp_lo bigint").transform(_materialize)
    cand = DD.simhash64_candidates(fp, id_col="vec_id", max_hamming=6)
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) + F.bit_count(
        F.col("la").bitwiseXOR(F.col("lb"))
    )
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )


IMAGE_DHASH_NEAR_DUPS_SQL = f"""
WITH corpus AS ({_EMB_CORPUS_SQL}),
s AS (
  SELECT vec_id, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale, v
  FROM corpus
),
p AS (
  SELECT vec_id,
    list_transform(v, x -> CAST(round(x / scale) AS BIGINT) + 127) AS pix
  FROM s
),
fp AS (
  SELECT vec_id,
    list_reduce(list_transform(range(0, 32),
      i -> CASE WHEN pix[i + 1] > pix[((i + 1) % 64) + 1]
                THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END),
      (x, y) -> x + y) AS fp_lo,
    list_reduce(list_transform(range(32, 64),
      i -> CASE WHEN pix[i + 1] > pix[((i + 1) % 64) + 1]
                THEN CAST(1 AS BIGINT) << (i - 32) ELSE CAST(0 AS BIGINT) END),
      (x, y) -> x + y) AS fp_hi
  FROM p
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  CAST(bit_count(xor(a.fp_hi, b.fp_hi)) + bit_count(xor(a.fp_lo, b.fp_lo)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.vec_id < b.vec_id
WHERE bit_count(xor(a.fp_hi, b.fp_hi)) + bit_count(xor(a.fp_lo, b.fp_lo)) <= 6
"""


def audio_fingerprint_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual AUDIO dedup (the WAV sibling of image_dhash_near_dups):
    each dup-augmented embedding becomes a 64-sample PCM16 WAV
    (audio_decode_stats codec path — struct-assembled RIFF, stdlib `wave`
    decode), the DECODED samples produce a 64-bit energy-contour
    fingerprint (sliding 4-sample energies, bit i = E[i] > E[(i+1) mod 64]
    — exact integer comparisons, drift ≤ 3 bits under the planted
    perturbation), and near-duplicates pair via the multi-block
    combination equi-join + exact Hamming verify. Oracle replays
    quantization → energies → bits from the embeddings, brute-force
    XOR-popcount pairing."""
    corpus = _embeddings_with_dups(spark, sf_dir)
    qt = SIM.quantize_embeddings(corpus, vec_col="v").repartition(
        spark.sparkContext.defaultParallelism
    )

    def _hash(pdf_iter):
        import pandas as pd

        from scripts_toolkit_spark.ext import audiocodec as AC

        for pdf in pdf_iter:
            out = {"vec_id": [], "fp_hi": [], "fp_lo": []}
            for vid, q in zip(pdf["vec_id"], pdf["q"]):
                blob = AC.encode_wav([int(s) for s in q], sample_rate=8000)
                _ch, _rate, samples = AC.decode_wav(blob)
                e = [
                    sum(samples[(i + j) % 64] ** 2 for j in range(4))
                    for i in range(64)
                ]
                bits = [1 if e[i] > e[(i + 1) % 64] else 0 for i in range(64)]
                out["vec_id"].append(vid)
                out["fp_lo"].append(sum(b << i for i, b in enumerate(bits[:32])))
                out["fp_hi"].append(sum(b << i for i, b in enumerate(bits[32:])))
            yield pd.DataFrame(out)

    fp = qt.select("vec_id", "q").mapInPandas(
        _hash, "vec_id bigint, fp_hi bigint, fp_lo bigint"
    ).transform(_materialize)
    cand = DD.simhash64_candidates(fp, id_col="vec_id", max_hamming=6)
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) + F.bit_count(
        F.col("la").bitwiseXOR(F.col("lb"))
    )
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )


AUDIO_FINGERPRINT_NEAR_DUPS_SQL = f"""
WITH corpus AS ({_EMB_CORPUS_SQL}),
s AS (
  SELECT vec_id, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale, v
  FROM corpus
),
q AS (
  SELECT vec_id, list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) AS q
  FROM s
),
en AS (
  SELECT vec_id,
    list_transform(range(0, 64),
      i -> q[(i % 64) + 1] * q[(i % 64) + 1]
         + q[((i + 1) % 64) + 1] * q[((i + 1) % 64) + 1]
         + q[((i + 2) % 64) + 1] * q[((i + 2) % 64) + 1]
         + q[((i + 3) % 64) + 1] * q[((i + 3) % 64) + 1]) AS e
  FROM q
),
fp AS (
  SELECT vec_id,
    list_reduce(list_transform(range(0, 32),
      i -> CASE WHEN e[i + 1] > e[((i + 1) % 64) + 1]
                THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END),
      (x, y) -> x + y) AS fp_lo,
    list_reduce(list_transform(range(32, 64),
      i -> CASE WHEN e[i + 1] > e[((i + 1) % 64) + 1]
                THEN CAST(1 AS BIGINT) << (i - 32) ELSE CAST(0 AS BIGINT) END),
      (x, y) -> x + y) AS fp_hi
  FROM en
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  CAST(bit_count(xor(a.fp_hi, b.fp_hi)) + bit_count(xor(a.fp_lo, b.fp_lo)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.vec_id < b.vec_id
WHERE bit_count(xor(a.fp_hi, b.fp_hi)) + bit_count(xor(a.fp_lo, b.fp_lo)) <= 6
"""


def hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketched SET OPERATIONS on user populations: deterministic-HLL
    register vectors for click-users and purchase-users built in ONE scan
    (per-side conditional MAX over the same md5 registers), union by
    register-wise MAX (the merge that makes HLL mergeable across
    partitions/streams), intersection by inclusion-exclusion — all
    reported beside the exact counts. The raw estimate is the
    deterministic contract (same formula as `hll_distinct_users`)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    h = F.md5(F.col("user_id").cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % _HLL_M
    w = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")
    rho = F.when(w > 0, F.lit(49) - F.length(F.bin(w))).otherwise(F.lit(49))
    regs = (
        ev.select("event_type", reg.alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(
            F.max(F.when(F.col("event_type") == "click", F.col("rho"))).alias("ra"),
            F.max(F.when(F.col("event_type") == "purchase", F.col("rho"))).alias("rb"),
        )
    )
    m = float(_HLL_M)

    def est(s_col: F.Column, n_col: F.Column) -> F.Column:
        return F.lit(_HLL_ALPHA * m * m) / (s_col + (F.lit(m) - n_col))

    sk = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("ra"))).alias("sa"),
        F.count("ra").alias("na"),
        F.sum(F.pow(F.lit(2.0), -F.col("rb"))).alias("sb"),
        F.count("rb").alias("nb"),
        F.sum(F.pow(F.lit(2.0), -F.greatest("ra", "rb"))).alias("su"),
        F.count(F.greatest("ra", "rb")).alias("nu"),
    )
    exact = ev.agg(
        F.count_distinct(F.when(F.col("event_type") == "click", F.col("user_id"))).alias(
            "exact_click"
        ),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_purchase"),
        F.count_distinct("user_id").alias("exact_union"),
    )
    eu = est(F.col("su"), F.col("nu").cast("double"))
    ea = est(F.col("sa"), F.col("na").cast("double"))
    eb = est(F.col("sb"), F.col("nb").cast("double"))
    return exact.crossJoin(sk).select(
        "exact_click",
        "exact_purchase",
        "exact_union",
        (F.col("exact_click") + F.col("exact_purchase") - F.col("exact_union")).alias(
            "exact_intersection"
        ),
        F.round(ea, 6).alias("est_click"),
        F.round(eb, 6).alias("est_purchase"),
        F.round(eu, 6).alias("est_union"),
        F.round(ea + eb - eu, 6).alias("est_intersection"),
    )


HLL_SET_OPS_SQL = f"""
WITH ev AS (
  SELECT event_type, user_id,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)) AS INT) % {_HLL_M} AS reg,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 12)) AS BIGINT) AS w
  FROM events WHERE event_type IN ('click', 'purchase')
),
r AS (
  SELECT event_type, reg,
    CASE WHEN w > 0 THEN 49 - length(bin(w)) ELSE 49 END AS rho
  FROM ev
),
regs AS (
  SELECT reg,
    MAX(CASE WHEN event_type = 'click' THEN rho END) AS ra,
    MAX(CASE WHEN event_type = 'purchase' THEN rho END) AS rb
  FROM r GROUP BY reg
),
sk AS (
  SELECT SUM(power(2.0, -ra)) AS sa, COUNT(ra) AS na,
         SUM(power(2.0, -rb)) AS sb, COUNT(rb) AS nb,
         SUM(power(2.0, -greatest(ra, rb))) AS su, COUNT(greatest(ra, rb)) AS nu
  FROM regs
),
exact AS (
  SELECT COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS exact_click,
         COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS exact_purchase,
         COUNT(DISTINCT user_id) AS exact_union
  FROM ev
)
SELECT exact_click, exact_purchase, exact_union,
  exact_click + exact_purchase - exact_union AS exact_intersection,
  round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / (sa + ({_HLL_M} - CAST(na AS DOUBLE))), 6) AS est_click,
  round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / (sb + ({_HLL_M} - CAST(nb AS DOUBLE))), 6) AS est_purchase,
  round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / (su + ({_HLL_M} - CAST(nu AS DOUBLE))), 6) AS est_union,
  round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / (sa + ({_HLL_M} - CAST(na AS DOUBLE)))
      + {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / (sb + ({_HLL_M} - CAST(nb AS DOUBLE)))
      - {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / (su + ({_HLL_M} - CAST(nu AS DOUBLE))), 6) AS est_intersection
FROM exact, sk
"""

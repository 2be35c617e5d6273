"""Third demo wave: the remaining BASELINE dedup modes (embedding-cosine
near-dup, character-n-gram Jaccard), exact percentiles, and explicit
GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.ext.similarity import cosine
from scripts_toolkit_spark.io.catalog import load_table


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: vector pairs with cosine ≥ τ. τ is set to
    a low 0.18 because the synthetic embeddings are near-uniform (max pair
    cosine ≈ 0.28) — the operator shape is the point; real corpora use
    0.9+. Scale path: LSH-bucket first (ext/similarity.lsh_topk), exact
    cosine only within buckets."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.18)
    )


EMBEDDING_NEAR_DUP_PAIRS_SQL = """
WITH scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  list_reduce(list_transform(range(1, 65),
    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y)
  / (sqrt(list_reduce(list_transform(range(1, 65),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x, y) -> x + y))
   * sqrt(list_reduce(list_transform(range(1, 65),
      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y))) AS cos_sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
)
SELECT * FROM scored WHERE cos_sim >= 0.18
"""


def char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard similarity for document pairs within the
    same source bucket (equi-join bounds the pair count; at corpus scale the
    bucketing key comes from MinHash bands instead)."""
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

    g = d.select("doc_id", F.col("source"), grams("text").alias("gset"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("source"), F.col("gset").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("source"), F.col("gset").alias("gb"))
    return (
        a.join(b, "source")
        .where(F.col("id_a") < F.col("id_b"))
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


CHAR_NGRAM_JACCARD_SQL = """
WITH g AS (
  SELECT doc_id, source,
    list_distinct(CASE WHEN length(text) >= 5
      THEN list_transform(range(1, length(text) - 3), i -> substr(text, i, 5))
      ELSE [text] END) AS gset
  FROM documents
)
, scored AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    CAST(len(list_intersect(a.gset, b.gset)) AS DOUBLE)
      / len(list_distinct(list_concat(a.gset, b.gset))) AS jaccard
  FROM g a JOIN g b USING (source)
  WHERE a.doc_id < b.doc_id
)
SELECT * FROM scored WHERE jaccard >= 0.2
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

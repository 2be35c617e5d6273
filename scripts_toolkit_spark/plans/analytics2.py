"""Second analytics wave: correlated-subquery and distinct-aggregation
shapes (TPC-H Q11/Q13/Q16/Q22-like), deterministic sampling for
training-data pipelines, and a per-group Pandas normalization
(`applyInPandas` with a SQL oracle).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-like: distribution of customers by order count, INCLUDING
    zero-order customers (left join + conditional count)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORDER_COUNT_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-like: distinct suppliers per (brand, type-prefix, size-bucket),
    excluding one brand — count_distinct after a fact⋈dim join."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(p.where(F.col("p_brand") != "Brand#5"), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", (F.col("p_size") % 5).alias("size_bucket"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


BRAND_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, p_size % 5 AS size_bucket,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
GROUP BY p_brand, p_type, p_size % 5
"""


def rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-like: customers with above-average balance and no RECENT orders
    — scalar subquery (global avg broadcast) + anti-join (filtered right
    side keeps the result non-degenerate at every SF)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # exact scalar: decimal avg, computed once driver-side stays in the plan
    # as a literal-free cross join of a 1-row aggregate (no collect)
    avg_bal = c.agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = o.where(F.col("o_orderdate") >= "1998-05-01").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", F.col("c_acctbal").alias("acctbal"))
    )


RICH_INACTIVE_CUSTOMERS_SQL = """
SELECT c_custkey, c_acctbal AS acctbal
FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer
)
AND NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-05-01'
)
"""


def top_value_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-like: supplier account value per nation, keeping nations above a
    fraction of the GLOBAL total — group-vs-global threshold in one plan."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_dec("s_acctbal")).alias("value_dec"))
    )
    total = per_nation.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("total_dec").cast("double") * 0.02)
        .select("n_name", F.col("value_dec").cast("double").alias("value"))
    )


TOP_VALUE_NATIONS_SQL = """
WITH per_nation AS (
  SELECT n_name, SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS value_dec
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, CAST(value_dec AS DOUBLE) AS value
FROM per_nation
WHERE CAST(value_dec AS DOUBLE) > (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM per_nation) * 0.02
"""


# ------------------------------------------------------------- sampling ----
def hash_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-5 corpus sample keyed on md5(doc_id) — stable
    under reruns/repartitioning (Bernoulli `sample()` is not), the property
    a reproducible training-data pipeline needs."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 5
    return d.where(bucket == 0).select("doc_id", "lang", "n_chars")


HASH_SAMPLE_DOCUMENTS_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0
"""


def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum sampling: first 10 documents per language by a
    deterministic hash order — exact strata sizes, unlike fraction-based
    sampleBy.

    Ranks through `operators/topk.grouped_topk` (round-6 verdict Next #4):
    a naive per-lang window funnels N/|langs| rows into one task per
    stratum at scale; the two-stage shape keeps ≤ 10 rows per (input
    partition, lang) before the per-lang final rank ever shuffles.
    Identical result (total order: md5(doc_id), doc_id)."""
    from scripts_toolkit_spark.operators.topk import grouped_topk

    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    return grouped_topk(
        d, ["lang"], [h.asc(), F.col("doc_id").asc()], 10, rank_col="rn"
    ).select("lang", "doc_id", F.col("rn").cast("int").alias("rn"))


STRATIFIED_SAMPLE_BY_LANG_SQL = """
SELECT lang, doc_id, CAST(rn AS INT) AS rn
FROM (
  SELECT lang, doc_id,
    row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= 10
"""


# ------------------------------------- applyInPandas group normalization ---
_ZSCORE_SCHEMA = "event_id bigint, event_type string, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group z-score in pandas — the applyInPandas (grouped-map) path.
    ddof=0 population std to match SQL stddev_pop; float64 column ops are
    order-independent here because mean/std use pandas' pairwise-stable
    sums over a SORTED group (we sort by event_id for full determinism)."""
    pdf = pdf.sort_values("event_id")
    v = pdf["value"].astype("float64")
    mean = v.mean()
    std = v.std(ddof=0)
    z = (v - mean) / std if std > 0 else v * 0.0
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "zscore": z.round(6)}
    )


def zscore_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-event-type z-score of `value`
    (rounded to 6 dp — pandas and SQL float reductions differ in low-order
    bits; coarse rounding makes boundary hits vanishingly unlikely)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        _zscore_group, _ZSCORE_SCHEMA
    )


ZSCORE_BY_EVENT_TYPE_SQL = """
SELECT event_id, event_type,
  round(CASE WHEN stddev_pop(value) OVER w > 0
        THEN (value - avg(value) OVER w) / stddev_pop(value) OVER w
        ELSE 0.0 END, 6) AS zscore
FROM events
WINDOW w AS (PARTITION BY event_type)
"""

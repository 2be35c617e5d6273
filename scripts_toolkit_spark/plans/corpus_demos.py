"""Corpus-hygiene demos: text canonicalization dedup, pattern redaction,
and vocabulary statistics — the remaining everyday operations of a
training-data pipeline (BASELINE north star), all native expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scripts_toolkit_spark.io.catalog import load_table


def canonical_text_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup via canonicalization: lowercase, strip
    non-alphanumerics, collapse whitespace — catches trivially-reformatted
    duplicates that byte-exact dedup misses. Survivor = min doc_id per
    canonical digest; shuffle carries 16-byte digests only."""
    d = load_table(spark, sf_dir, "documents")
    canon = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " ")), " +", " "
    )
    keyed = d.select(F.md5(canon).alias("canon_key"), "doc_id")
    return keyed.groupBy("canon_key").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("group_size"),
    )


CANONICAL_TEXT_DEDUP_SQL = """
SELECT md5(regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +', ' ', 'g')) AS canon_key,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS group_size
FROM documents
GROUP BY 1
"""


def redact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction (PII-shaped): inject synthetic emails/numbers
    deterministically, then scrub them — redaction is genuinely exercised,
    not a no-op, and the redacted output is hash-gated."""
    d = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.substring("text", 1, 60),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(dirty, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
        "[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    )
    return d.select("doc_id", redacted.alias("clean_text"))


REDACT_TEXT_SQL = """
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      substring(text, 1, 60) || ' contact user' || CAST(doc_id AS VARCHAR)
        || '@example.com or call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'),
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean_text
FROM documents
"""


def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary stats: top-50 tokens by document frequency and
    total count (deterministic tiebreak on the token) — the explode →
    two-level aggregate shape that scales to any corpus.

    The global ordering window runs on the post-aggregate stats table,
    which is vocabulary-sized (≪ corpus) — the single-partition warning is
    benign here; for open-vocab corpora take per-partition partial top-k
    first."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    stats = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("total_count"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    w = Window.orderBy(F.desc("total_count"), F.asc("token"))
    return (
        stats.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 50)
        .select("token", "total_count", "doc_freq", F.col("rank").cast("int").alias("rank"))
    )


TOKEN_FREQUENCIES_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
stats AS (
  SELECT token, COUNT(*) AS total_count, COUNT(DISTINCT doc_id) AS doc_freq
  FROM tok GROUP BY token
)
SELECT token, total_count, doc_freq, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY total_count DESC, token ASC) AS rank
  FROM stats
)
WHERE rank <= 50
"""

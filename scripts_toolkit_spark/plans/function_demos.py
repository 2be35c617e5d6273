"""Driver-contract demonstrations of the scalar function library (§2.3).

Each query applies engine functions to the driver tables and carries a
DuckDB oracle. Where the driver data is too clean to exercise a function
(no HTML dirt in `documents.text`), the query *constructs* the dirt
deterministically on both sides first — the cleaning path is then genuinely
executed, not a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.functions import clean as C
from scripts_toolkit_spark.io.catalog import load_table


def clean_text_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F4 fused cleaning chain (reference MDRM:157-167) over constructed
    dirty text. One projection in the plan — Catalyst collapses the four
    regexp_replace steps the reference runs as separate table passes."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit('<p id="1">'),
        F.substring("text", 1, 40),
        F.lit("</p>&#x0D;\r tail\n\nend"),
    )
    return docs.select("doc_id", C.clean_text(dirty).alias("cleaned"))


CLEAN_TEXT_CHAIN_SQL = """
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          '<p id="1">' || substring(text, 1, 40) || '</p>&#x0D;' || chr(13) || ' tail' || chr(10) || chr(10) || 'end',
          '<[^<]+?>', '', 'g'),
        '&#x0D;', '', 'g'),
      chr(13), '', 'g'),
    chr(10) || chr(10), chr(10), 'g') AS cleaned
FROM documents
"""


def derive_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F7/F9/F11-style derivations over orders: split-extract, date
    formatting, flag→bool, key concat — all native expressions."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.element_at(F.split("o_orderpriority", "-"), 1).alias("priority_code"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("orderdate_yyyymmdd"),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
        F.concat(F.col("o_orderstatus"), F.col("o_orderkey").cast("string")).alias("status_key"),
    )


DERIVE_FIELDS_SQL = """
SELECT
  o_orderkey,
  string_split(o_orderpriority, '-')[1] AS priority_code,
  strftime(o_orderdate, '%Y%m%d') AS orderdate_yyyymmdd,
  o_orderpriority = '1-URGENT' AS is_urgent,
  o_orderstatus || CAST(o_orderkey AS VARCHAR) AS status_key
FROM orders
"""


def split_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 split→array + generator explode (UDTF-shaped, §2.11) over
    documents.text: one output row per token."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.split("text", " ")).alias("token"),
    )


SPLIT_EXPLODE_TOKENS_SQL = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
"""


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload column —
    `get_json_object` stays JVM-side (no Python JSON parsing)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


JSON_EXTRACT_PROPS_SQL = """
SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
FROM events
"""


def nan_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 NaN→NULL (reference MDRM:42-57): inject NaN deterministically,
    then normalize — verifies NaN handling through the whole stack."""
    ev = load_table(spark, sf_dir, "events")
    nan = F.lit("NaN").cast("double")
    noisy = F.when(F.col("event_id") % 100 == 0, nan).otherwise(F.col("value"))
    return ev.select("event_id", C.nan_to_null(noisy).alias("value_clean"))


NAN_NULL_NORMALIZE_SQL = """
SELECT event_id,
  CASE WHEN isnan(v) THEN NULL ELSE v END AS value_clean
FROM (
  SELECT event_id,
    CASE WHEN event_id % 100 = 0 THEN 'NaN'::DOUBLE ELSE value END AS v
  FROM events
)
"""


def mdrm_pipeline_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MDRM dictionary pipeline (§3.1) run over a raw dictionary
    synthesized deterministically from `part` — clean → drop trailing col →
    rename → derive (map-lookup label, Y/N bool, mdrm key) → dedup → split
    reporting forms. Arrays are surfaced as (size, joined-string) scalars
    for hash-stable comparison."""
    from scripts_toolkit_spark.plans.mdrm import mdrm_dictionary

    p = load_table(spark, sf_dir, "part")
    letters = F.array([F.lit(x) for x in ("J", "D", "F", "R", "S", "E", "P")])
    raw = p.select(
        F.regexp_replace("p_brand", "#", "").alias("Mnemonic"),
        F.lpad((F.col("p_partkey") % 10000).cast("string"), 4, "0").alias("Item Code"),
        F.lit("9/30/2016 12:00:00 AM").alias("Start Date"),
        F.lit("12/31/9999 12:00:00 AM").alias("End Date"),
        F.col("p_name").alias("Item Name"),
        F.when(F.col("p_size") % 2 == 0, "Y").otherwise("N").alias("Confidentiality"),
        F.element_at(letters, (F.col("p_size") % 7 + 1).cast("int")).alias("ItemType"),
        F.when(F.col("p_size") % 3 == 0, F.lit("FFIEC 031,FFIEC 041"))
        .when(F.col("p_size") % 3 == 1, F.lit("FFIEC 031"))
        .otherwise(F.lit(None).cast("string"))
        .alias("Reporting Form"),
        F.concat(F.col("p_name"), F.lit("<b>x</b>&#x0D;\r\n\n"), F.col("p_type")).alias("Description"),
        F.lit("glossary<i>t</i>").alias("SeriesGlossary"),
        F.lit("").alias("trailing_blank"),
    )
    out = mdrm_dictionary(raw)
    return out.select(
        "mdrm",
        "item_name",
        "is_conf",
        "item_type",
        "item_type_explain",
        "description",
        "series_glossary",
        F.size("reporting_forms").alias("n_forms"),
        F.concat_ws("|", "reporting_forms").alias("forms"),
    )


MDRM_PIPELINE_DEMO_SQL = """
WITH raw AS (
  SELECT DISTINCT
    replace(p_brand, '#', '') || lpad(CAST(p_partkey % 10000 AS VARCHAR), 4, '0') AS mdrm,
    p_name AS item_name,
    (p_size % 2 = 0) AS is_conf,
    ['J','D','F','R','S','E','P'][CAST(p_size % 7 AS INT) + 1] AS item_type,
    CASE p_size % 3
      WHEN 0 THEN 'FFIEC 031,FFIEC 041'
      WHEN 1 THEN 'FFIEC 031'
      ELSE NULL END AS reporting_form,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(p_name || '<b>x</b>&#x0D;' || chr(13) || chr(10) || chr(10) || p_type,
            '<[^<]+?>', '', 'g'),
          '&#x0D;', '', 'g'),
        chr(13), '', 'g'),
      chr(10) || chr(10), chr(10), 'g') AS description,
    'glossaryt' AS series_glossary
  FROM part
)
SELECT
  mdrm, item_name, is_conf, item_type,
  CASE item_type
    WHEN 'J' THEN 'Projected'
    WHEN 'D' THEN 'Derived'
    WHEN 'F' THEN 'Financial reported'
    WHEN 'R' THEN 'Rate'
    WHEN 'S' THEN 'Structure'
    WHEN 'E' THEN 'Examination/Supervision Data'
    WHEN 'P' THEN 'Percentage'
  END AS item_type_explain,
  description, series_glossary,
  CASE WHEN reporting_form IS NULL THEN 0
       ELSE len(string_split(reporting_form, ',')) END AS n_forms,
  CASE WHEN reporting_form IS NULL THEN ''
       ELSE array_to_string(string_split(reporting_form, ','), '|') END AS forms
FROM raw
"""

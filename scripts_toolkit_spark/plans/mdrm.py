"""MDRM data-dictionary pipeline (SURVEY.md §3.1), Spark-first.

The reference's `process_csv` (mdrm_data_collect_process.py:132-216) runs
eight eager pandas passes (three of them whole-table applymaps). Here the
same semantics are ONE lazy DataFrame chain; Catalyst fuses all scalar
cleaning into a single projection (CollapseProject) and the only wide
operation is the final dropDuplicates.

Raw input schema (FIXTURES.md §F1 — physical CSV columns after the 1-line
prologue): Mnemonic, `Item Code`, `Start Date`, `End Date`, `Item Name`,
Confidentiality, ItemType, `Reporting Form`, Description, SeriesGlossary,
plus a trailing blank column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.functions import clean as C

# Rename map — reference mdrm_data_collect_process.py:173-184.
RENAMES = {
    "Mnemonic": "mnemonic",
    "Item Code": "item_code",
    "Start Date": "start_date",
    "End Date": "end_date",
    "Item Name": "item_name",
    "Confidentiality": "is_conf",
    "ItemType": "item_type",
    "Reporting Form": "reporting_form",
    "Description": "description",
    "SeriesGlossary": "series_glossary",
}

_TEXT_COLS = ("Description", "SeriesGlossary")


def strip_prologue(src_path: str, staged_path: str, lines: int = 1) -> None:
    """Drop the N-line prologue at staging time (reference :147 skiprows=1).

    The fetch step (SURVEY §2.1 S1) is driver-side by design — the prologue
    strip belongs there, before the distributed CSV scan, so the scan itself
    stays a plain header-row `spark.read.csv` with full pushdown.
    """
    with open(src_path, "rb") as f:
        for _ in range(lines):
            f.readline()
        rest = f.read()
    with open(staged_path, "wb") as f:
        f.write(rest)


def read_mdrm_csv(spark: SparkSession, path: str) -> DataFrame:
    """Header-row CSV scan of the staged (prologue-stripped) file."""
    return spark.read.option("header", True).option("multiLine", True).csv(path)


def mdrm_dictionary(raw: DataFrame) -> DataFrame:
    """Full dictionary transform — reference process_csv semantics:

    clean text (F1–F4, :157-167) → drop trailing blank col (:170) → rename
    (:173-186) → derive item_type_explain (F5, :189-193) / is_conf bool
    (F6, :196) / mdrm key (F7, :205) → dedup (:208) → reporting_forms array
    (F8, :211) → drop reporting_form (:214).
    """
    df = raw
    for c in _TEXT_COLS:
        if c in df.columns:
            df = df.withColumn(c, C.clean_text(c))
    # positional drop of the trailing blank column (reference iloc[:, :-1])
    known = list(RENAMES)
    trailing = [c for c in df.columns if c not in known]
    df = df.drop(*trailing)
    df = df.withColumnsRenamed(RENAMES)
    df = (
        df.withColumn("item_type_explain", C.item_type_label("item_type"))
        .withColumn("is_conf", C.yn_flag("is_conf"))
        .withColumn("mdrm", C.mdrm_key("mnemonic", "item_code"))
        .dropDuplicates()
        .withColumn("reporting_forms", C.split_to_array("reporting_form"))
        .drop("reporting_form")
    )
    return df


def write_json_records(df: DataFrame, path: str) -> None:
    """JSON-records sink (reference :266 `to_json(orient='records')`)."""
    df.write.mode("overwrite").json(path)

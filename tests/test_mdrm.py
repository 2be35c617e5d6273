"""Unit tests for the MDRM dictionary pipeline — semantics mirrored from the
reference (mdrm_data_collect_process.py:132-216), including its edge cases:
duplicate rows, null Reporting Form, HTML/&#x0D;/\\r/\\n\\n dirt."""

from __future__ import annotations

from scripts_toolkit_spark.plans.mdrm import mdrm_dictionary

RAW_COLS = [
    "Mnemonic",
    "Item Code",
    "Start Date",
    "End Date",
    "Item Name",
    "Confidentiality",
    "ItemType",
    "Reporting Form",
    "Description",
    "SeriesGlossary",
    "trailing_blank",
]


def _raw(spark, rows):
    schema = ", ".join(f"`{c}` string" for c in RAW_COLS)
    return spark.createDataFrame(rows, schema)


def test_full_pipeline_semantics(spark):
    rows = [
        # duplicate row (exercises dropDuplicates, reference :208)
        ("RCON", "2170", "9/30/2016 12:00:00 AM", "12/31/9999 12:00:00 AM",
         "Total assets", "Y", "F", "FFIEC 031,FFIEC 041",
         "<b>Total</b> assets&#x0D;\r line\n\ntwo", "gloss<i>x</i>", ""),
        ("RCON", "2170", "9/30/2016 12:00:00 AM", "12/31/9999 12:00:00 AM",
         "Total assets", "Y", "F", "FFIEC 031,FFIEC 041",
         "<b>Total</b> assets&#x0D;\r line\n\ntwo", "gloss<i>x</i>", ""),
        # null reporting form (exercises array default, reference :211)
        ("UBPR", "E001", "3/31/2010 12:00:00 AM", "12/31/9999 12:00:00 AM",
         "Some ratio", "N", "R", None, "plain", "plain", ""),
    ]
    out = mdrm_dictionary(_raw(spark, rows)).orderBy("mdrm").collect()
    assert len(out) == 2  # dedup removed the exact-duplicate row

    r = {row["mdrm"]: row for row in out}
    tot = r["RCON2170"]
    assert tot["description"] == "Total assets line\ntwo"  # F1-F4 chain
    assert tot["series_glossary"] == "glossx"
    assert tot["is_conf"] is True  # 'Y' → True (F6)
    assert tot["item_type_explain"] == "Financial reported"  # F5 map
    assert tot["reporting_forms"] == ["FFIEC 031", "FFIEC 041"]  # F8

    ratio = r["UBPRE001"]
    assert ratio["is_conf"] is False
    assert ratio["item_type_explain"] == "Rate"
    assert ratio["reporting_forms"] == []  # null → empty list, not null
    assert "reporting_form" not in out[0].asDict()  # dropped (:214)


def test_unmapped_item_type_yields_null_label(spark):
    rows = [("AAAA", "0001", "d", "d", "x", "N", "Z", None, "d", "d", "")]
    out = mdrm_dictionary(_raw(spark, rows)).collect()[0]
    assert out["item_type_explain"] is None

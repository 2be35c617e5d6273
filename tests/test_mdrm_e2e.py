"""§3.1 end-to-end: raw MDRM CSV file (with prologue + dirt) → staged strip
→ distributed CSV scan → dictionary transform → JSON-records sink."""

from __future__ import annotations

import json
import os

from scripts_toolkit_spark.io.sinks import write_json_records
from scripts_toolkit_spark.plans.mdrm import mdrm_dictionary, read_mdrm_csv, strip_prologue

RAW_CSV = (
    "MDRM Data Dictionary export 2024-06-30\n"  # 1-line prologue (skiprows=1)
    'Mnemonic,"Item Code","Start Date","End Date","Item Name",Confidentiality,'
    'ItemType,"Reporting Form",Description,SeriesGlossary,\n'
    'RCON,2170,9/30/2016 12:00:00 AM,12/31/9999 12:00:00 AM,Total assets,Y,F,'
    '"FFIEC 031,FFIEC 041","<b>Total</b> assets","gloss<i>x</i>",\n'
    'RCON,2170,9/30/2016 12:00:00 AM,12/31/9999 12:00:00 AM,Total assets,Y,F,'
    '"FFIEC 031,FFIEC 041","<b>Total</b> assets","gloss<i>x</i>",\n'
    "UBPR,E001,3/31/2010 12:00:00 AM,12/31/9999 12:00:00 AM,Some ratio,N,R,,plain,plain,\n"
)


def test_mdrm_csv_pipeline_e2e(spark, tmp_path):
    src = str(tmp_path / "mdrm_export.csv")
    open(src, "w").write(RAW_CSV)

    staged = str(tmp_path / "mdrm_staged.csv")
    strip_prologue(src, staged)

    raw = read_mdrm_csv(spark, staged)
    assert raw.count() == 3

    out = mdrm_dictionary(raw)
    rows = {r["mdrm"]: r for r in out.collect()}
    assert len(rows) == 2  # dedup removed the duplicate
    assert rows["RCON2170"]["description"] == "Total assets"
    assert rows["RCON2170"]["reporting_forms"] == ["FFIEC 031", "FFIEC 041"]
    assert rows["RCON2170"]["is_conf"] is True
    assert rows["UBPRE001"]["item_type_explain"] == "Rate"

    dest = str(tmp_path / "dict_json")
    write_json_records(out, dest, coalesce_single=True)
    files = [f for f in os.listdir(dest) if f.endswith(".json")]
    assert len(files) == 1
    recs = [json.loads(line) for line in open(os.path.join(dest, files[0]))]
    assert {r["mdrm"] for r in recs} == {"RCON2170", "UBPRE001"}

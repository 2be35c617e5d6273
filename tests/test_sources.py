"""Sources/sinks tests: distributed ZIP explode, XBRL linkbase parsing, and
the full §3.3 taxonomy pipeline end-to-end on a synthetic linkbase zip."""

from __future__ import annotations

import json
import os
import zipfile

import pytest

from pyspark.sql import functions as F

from scripts_toolkit_spark.io import sinks
from scripts_toolkit_spark.io.sources import (
    fetch_to_staging,
    linkbase_edges,
    linkbase_label_tables,
    read_pdf_spans,
    zip_members,
)
from scripts_toolkit_spark.operators import graph as G

PRES_XML = b"""<?xml version="1.0"?>
<linkbase>
  <presentationLink>
    <presentationArc xlink:from="root" xlink:to="sch-RC"/>
    <presentationArc xlink:from="sch-RC" xlink:to="line_12"/>
    <presentationArc xlink:from="line_12" xlink:to="cc_RCON2170"/>
    <presentationArc xlink:from="sch-RCB" xlink:to="colset_1"/>
    <presentationArc xlink:from="root" xlink:to="sch-RCB"/>
    <presentationArc xlink:from="colset_1" xlink:to="column_A"/>
    <presentationArc xlink:from="column_A" xlink:to="cc_RCON2170"/>
  </presentationLink>
</linkbase>
"""

CAP_XML = b"""<?xml version="1.0"?>
<linkbase>
  <labelLink>
    <labelArc xlink:from="sch-RC" xlink:to="lab_rc"/>
    <labelArc xlink:from="cc_RCON2170" xlink:to="lab_2170"/>
    <label xlink:label="lab_rc">Balance Sheet</label>
    <label xlink:label="lab_2170">Total assets</label>
  </labelLink>
</linkbase>
"""


@pytest.fixture(scope="module")
def linkbase_zip(tmp_path_factory):
    d = tmp_path_factory.mktemp("xbrl")
    path = os.path.join(str(d), "call-report031-2022-06-30.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("report-pres.xml", PRES_XML)
        zf.writestr("report-cap.xml", CAP_XML)
        zf.writestr("readme.txt", b"noise")
    return path


def test_zip_members_distributed(spark, linkbase_zip):
    rows = {r["member"]: r for r in zip_members(spark, linkbase_zip).collect()}
    assert set(rows) == {"report-pres.xml", "report-cap.xml", "readme.txt"}
    assert rows["report-pres.xml"]["size"] == len(PRES_XML)
    filtered = zip_members(spark, linkbase_zip, name_filter="-pres").collect()
    assert [r["member"] for r in filtered] == ["report-pres.xml"]


def test_fetch_file_scheme(tmp_path, linkbase_zip):
    staged = fetch_to_staging(f"file://{linkbase_zip}", str(tmp_path / "stage"))
    assert os.path.getsize(staged) == os.path.getsize(linkbase_zip)


def test_taxonomy_pipeline_end_to_end(spark, linkbase_zip, tmp_path):
    """§3.3 full chain: zip → member extract → arc parse → edges → leaves →
    path expansion → classify → label join → nested assembly → golden JSON."""
    members = {r["member"]: bytes(r["content"]) for r in zip_members(spark, linkbase_zip).collect()}
    edges = linkbase_edges(spark, members["report-pres.xml"])
    label_arcs, labels = linkbase_label_tables(spark, members["report-cap.xml"])

    lv = G.leaves(edges).where(F.col("node").startswith("cc_"))
    classified = G.classify_paths(G.expand_paths(edges, lv, "root"))

    # resolve arc-indirect labels: node -> arc -> label text
    node_labels = (
        label_arcs.join(labels, label_arcs["arc_to"] == labels["label_key"])
        .select(F.col("arc_from").alias("node"), "label_text")
    )
    assembled = G.assemble_taxonomy(classified, node_labels)
    out = sinks.export_taxonomy_json(
        G.taxonomy_json(assembled), str(tmp_path), "031", "2022-06-30"
    )
    assert os.path.basename(out) == "031_2022-06-30.json"
    doc = json.load(open(out))
    assert doc["form_number"] == "031"
    data = doc["data"]["cc_RCON2170"]
    schedules = data["schedules"]
    assert set(schedules) == {"RC", "RCB"}  # multi-placement concept
    assert schedules["RC"]["line_ids"]["schedule"]["label"] == "Balance Sheet"
    assert schedules["RCB"]["column_ids"]["column"]["code"] == "column_A"


def test_pdf_decoder_missing_path_raises(spark):
    # the decoder is no longer import-gated (pure-Python subset fallback);
    # a glob matching nothing fails loudly at scan time
    with pytest.raises(Exception):
        read_pdf_spans(spark, "/tmp/nonexistent*.pdf").collect()

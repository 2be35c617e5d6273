"""Capstone pipeline test: every §3 stage chained end-to-end —
manifest fetch → zip explode → wide matrix decode(stand-in) → profile →
melt → partitioned EAV store → pruned read → dictionary enrichment →
pivot → JSON export. One run through the whole engine."""

from __future__ import annotations

import json
import os
import zipfile

from pyspark.sql import functions as F

from scripts_toolkit_spark.io.sinks import write_json_records
from scripts_toolkit_spark.io.sources import fetch_manifest, zip_members
from scripts_toolkit_spark.operators.joins import broadcast_enrich
from scripts_toolkit_spark.operators.reshape import pivot_from_eav, write_eav
from scripts_toolkit_spark.plans.xport import wide_to_eav


def test_full_pipeline_showcase(spark, tmp_path):
    # --- stage 0: two "quarterly archives" with CSV stand-ins for XPT ------
    csv_q1 = "entity,DATE,RCON2170,RCFD3210,FLAG\n1,20240331,100.5,7,1\n2,20240331,200.25,,0\n"
    csv_q2 = "entity,DATE,RCON2170,RCFD3210,FLAG\n1,20240630,110.75,9,0\n2,20240630,205.5,11,1\n"
    archives = []
    for i, csv in enumerate((csv_q1, csv_q2)):
        p = str(tmp_path / f"q{i}.zip")
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr(f"bank_data_q{i}.csv", csv)
        archives.append(p)

    # --- stage 1: manifest fetch (S1 scale path) + zip explode (S2) --------
    manifest = spark.createDataFrame([(f"file://{p}",) for p in archives], "url string")
    fetched = fetch_manifest(spark, manifest)
    assert {r["status"] for r in fetched.collect()} == {"ok"}

    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for r in fetched.collect():
        open(os.path.join(staged, os.path.basename(r["url"])), "wb").write(bytes(r["content"]))
    members = zip_members(spark, os.path.join(staged, "*.zip"), name_filter=".csv")
    assert members.count() == 2

    # --- stage 2: decode + profile + melt per quarter (§3.2) ---------------
    eav_parts = []
    for r in members.collect():
        csv_path = str(tmp_path / r["member"])
        open(csv_path, "wb").write(bytes(r["content"]))
        wide = spark.read.option("header", True).option("inferSchema", True).csv(csv_path)
        wide = wide.select(
            "entity", "DATE",
            *[F.col(c).cast("double") for c in ("RCON2170", "RCFD3210", "FLAG")],
        )
        eav_parts.append(wide_to_eav(wide))
    eav = eav_parts[0].unionByName(eav_parts[1])

    # profiler routed FLAG→bool, RCFD3210→int, RCON2170→float
    types = {r["mdrm"]: r["data_type"] for r in eav.select("mdrm", "data_type").distinct().collect()}
    assert types == {"rcon2170": "float", "rcfd3210": "int", "flag": "bool"}

    # --- stage 3: partitioned store + pruned read (§1.3) -------------------
    store = str(tmp_path / "facts")
    write_eav(eav, store)
    q2 = spark.read.parquet(store).where(F.col("quarter") == 20240630)
    files = q2.select(F.input_file_name()).distinct().collect()
    assert all("quarter=20240630" in r[0] for r in files)

    # null int observation was skipped (entity 2, q1 RCFD3210)
    assert spark.read.parquet(store).where(
        (F.col("mdrm") == "rcfd3210") & (F.col("quarter") == 20240331)
    ).count() == 1

    # --- stage 4: dictionary enrichment (J4) + pivot (R4) ------------------
    dictionary = spark.createDataFrame(
        [("rcon2170", "Total assets"), ("rcfd3210", "Equity capital"), ("flag", "Some flag")],
        "mdrm string, item_name string",
    )
    enriched = broadcast_enrich(spark.read.parquet(store), dictionary, "mdrm", "left")
    assert enriched.where(F.col("item_name").isNull()).count() == 0

    wide_view = pivot_from_eav(
        enriched.where(F.col("data_type") == "float"),
        ["rcon2170"],
        "float_data",
        ("rssd", "quarter"),
    )
    vals = {(r["rssd"], r["quarter"]): r["rcon2170"] for r in wide_view.collect()}
    assert vals[(1, 20240630)] == 110.75 and vals[(2, 20240331)] == 200.25

    # --- stage 5: JSON delivery (S7) ---------------------------------------
    out = str(tmp_path / "delivery")
    write_json_records(wide_view, out, coalesce_single=True)
    lines = [
        json.loads(line)
        for f in os.listdir(out) if f.endswith(".json")
        for line in open(os.path.join(out, f))
    ]
    assert len(lines) == 4  # 2 banks × 2 quarters

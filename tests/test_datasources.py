"""Custom Python DataSource (Spark 4 API): zipmembers format."""

from __future__ import annotations

import os
import zipfile

import pytest

from scripts_toolkit_spark.io.datasources import register_datasources


@pytest.fixture(scope="module")
def zip_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("zips"))
    for i in range(3):
        with zipfile.ZipFile(os.path.join(d, f"a{i}.zip"), "w") as zf:
            zf.writestr(f"pres-{i}.xml", b"<x/>" * (i + 1))
            zf.writestr("noise.txt", b"n")
    return d


def test_zipmembers_format(spark, zip_dir):
    register_datasources(spark)
    df = spark.read.format("zipmembers").load(os.path.join(zip_dir, "*.zip"))
    rows = df.collect()
    assert len(rows) == 6
    assert df.rdd.getNumPartitions() == 3  # one partition per archive
    by_member = {r["member"]: r for r in rows}
    assert by_member["pres-2.xml"]["size"] == 12
    assert bytes(by_member["pres-1.xml"]["content"]) == b"<x/>" * 2


def test_zipmembers_member_filter(spark, zip_dir):
    register_datasources(spark)
    df = (
        spark.read.format("zipmembers")
        .option("memberFilter", "pres")
        .load(os.path.join(zip_dir, "*.zip"))
    )
    assert sorted(r["member"] for r in df.collect()) == [
        "pres-0.xml",
        "pres-1.xml",
        "pres-2.xml",
    ]

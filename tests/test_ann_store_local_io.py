"""r15 lifecycle-fusion pins: on a LOCAL store the ANN index's KB
control-plane files (/meta, /centroids, /codebook) are written/read
DRIVER-SIDE via pyarrow (zero Spark jobs — guide §5), with the Spark
distributed IO kept as the non-local fallback. These tests pin that the
two write paths produce interchangeable files (same Spark-read schema,
same rows) and that the driver-side readers return exactly what Spark
reads back — the bit-parity precondition for every stored==ad-hoc
guarantee built on top.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from scripts_toolkit_spark.ext import ann_index as ANN
from scripts_toolkit_spark.ext.similarity import local_rows_df


META_VALS = (2, True, True, 64, 4, 16, False, 4, 44, 64)


def test_meta_pyarrow_write_matches_spark_write(spark, tmp_path):
    pa_store = str(tmp_path / "pa_store")
    sp_store = str(tmp_path / "sp_store")
    ANN._write_meta(spark, pa_store, META_VALS)  # local path → pyarrow
    # the non-local fallback body, forced onto a local dir for comparison
    local_rows_df(spark, [META_VALS], ANN._META_SPARK_SCHEMA).write.mode(
        "overwrite"
    ).parquet(sp_store + "/meta")
    pa_df = spark.read.parquet(pa_store + "/meta")
    sp_df = spark.read.parquet(sp_store + "/meta")
    assert [(f.name, f.dataType.simpleString()) for f in pa_df.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in sp_df.schema.fields
    ]
    assert pa_df.collect() == sp_df.collect()
    # the driver-side reader sees the same dict for both layouts
    assert ANN._meta_dict(spark, pa_store) == ANN._meta_dict(spark, sp_store)


def test_centroids_and_codebook_roundtrip(spark, tmp_path):
    store = str(tmp_path / "store")
    cent_rows = [(0, [1.0, 2.5]), (1, [0.25, -3.0])]
    cb_rows = [(0, 0, [1.0]), (0, 1, [2.0]), (1, 0, [3.0]), (1, 1, [4.0])]
    ANN._pa_write_rows(
        ANN._local_fs_path(store + "/centroids"), cent_rows, ANN._centroids_pa_schema()
    )
    ANN._pa_write_rows(
        ANN._local_fs_path(store + "/codebook"), cb_rows, ANN._codebook_pa_schema()
    )
    cents = spark.read.parquet(store + "/centroids")
    assert cents.schema.simpleString() == (
        "struct<cell_id:int,centroid:array<double>>"
    )
    assert sorted((r["cell_id"], r["centroid"]) for r in cents.collect()) == cent_rows
    cb = spark.read.parquet(store + "/codebook")
    assert cb.schema.simpleString() == "struct<s:int,code:int,csub:array<double>>"
    assert ANN._codebook_rows_from_store(store) is not None
    cb_np, m, n_codes, sub_dim = ANN._collect_codebook_store(spark, store)
    assert (m, n_codes, sub_dim) == (2, 2, 1)
    # driver read == Spark collect, element for element
    assert ANN._collect_codebook(cb)[0].tolist() == cb_np.tolist()


def test_centroid_rows_from_store_matches_collect(spark, sf_dir, tmp_path):
    from scripts_toolkit_spark.io.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    store = str(tmp_path / "store")
    ANN.build_ann_index(emb, store, n_cells=8)
    meta = ANN._meta_dict(spark, store)
    rows = ANN._centroid_rows_from_store(spark, store, meta)
    assert rows is not None
    via_spark = sorted(
        (int(r["cell_id"]), list(r["centroid"]))
        for r in spark.read.parquet(store + "/centroids").collect()
    )
    assert rows == via_spark
    # shape helper agrees with the realized model
    assert ANN._centroids_shape_from_files(store) == (len(rows), len(rows[0][1]))


def test_next_batch_id_from_layout(spark, sf_dir, tmp_path):
    from scripts_toolkit_spark.io.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0).limit(200)
    late = emb.where(F.col("vec_id") % 5 == 0).limit(50)
    store = str(tmp_path / "store")
    ANN.build_ann_index(base, store, n_cells=8)
    assert ANN._next_batch_id(spark, store) == 0  # only batch_id=-1 exists
    ANN.append_to_index(spark, store, late)
    assert ANN._next_batch_id(spark, store) == 1


def test_non_local_paths_fall_back(spark):
    assert ANN._local_fs_path("hdfs://nn/store") is None
    assert ANN._local_fs_path("s3a://bucket/store") is None
    assert ANN._local_fs_path("file:///tmp/x") == "/tmp/x"
    assert ANN._local_fs_path("/tmp/x") == "/tmp/x"
    with pytest.raises(FileNotFoundError):
        ANN._pa_read_rows("/tmp/definitely_missing_spark_graft_store")

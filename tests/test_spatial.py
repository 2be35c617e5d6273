"""Grid-bucketed spatial radius join (operators/spatial.py): the grid
pipeline must return EXACTLY the brute-force pair set (gridding is a
candidate generator, never a filter — a point pair within the radius
always lands in adjacent cells), including boundary pairs at dist == r.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.operators.spatial import grid_cell, grid_radius_join


def _points(spark, n=300, seed="sp"):
    ids = spark.range(n).select(F.col("id").alias("point_id"))
    coord = lambda p: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.concat(F.lit(p + "|"), F.col("point_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("long")
        % F.lit(1_000_000)
    ) / F.lit(1_000_000.0) * F.lit(10.0)
    return ids.select("point_id", coord(seed + "lat").alias("lat"), coord(seed + "lon").alias("lon"))


def test_grid_join_equals_brute_force(spark):
    pts = _points(spark, 300).localCheckpoint()
    r = 0.4
    got = {
        (x["id_a"], x["id_b"])
        for x in grid_radius_join(pts, r, "point_id", "lat", "lon").collect()
    }
    a = pts.select(
        F.col("point_id").alias("id_a"), F.col("lat").alias("la"), F.col("lon").alias("lo")
    )
    b = pts.select(
        F.col("point_id").alias("id_b"), F.col("lat").alias("lb"), F.col("lon").alias("lob")
    )
    d2 = (F.col("la") - F.col("lb")) ** 2 + (F.col("lo") - F.col("lob")) ** 2
    brute = {
        (x["id_a"], x["id_b"])
        for x in a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .where(d2 <= r * r)
        .collect()
    }
    assert got == brute
    assert len(brute) > 0  # the fixture actually exercises matches


def test_boundary_pair_exactly_at_radius_kept(spark):
    # dist == r must be INCLUDED (<=), and a pair one cell apart is found.
    pts = spark.createDataFrame(
        [(1, 0.05, 0.05), (2, 0.05, 0.35), (3, 5.0, 5.0)],
        "point_id bigint, lat double, lon double",
    )
    rows = grid_radius_join(pts, 0.3, "point_id", "lat", "lon").collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2)}


def test_grid_cell_negative_coords_floor(spark):
    df = spark.createDataFrame([(-0.01, -1.99)], "lat double, lon double")
    cy, cx = grid_cell(F.col("lat"), F.col("lon"), 1.0)
    row = df.select(cy.alias("cy"), cx.alias("cx")).collect()[0]
    assert (row["cy"], row["cx"]) == (-1, -2)  # floor, not truncation


def test_no_duplicate_pairs(spark):
    pts = _points(spark, 200, seed="dup").localCheckpoint()
    pairs = grid_radius_join(pts, 0.5, "point_id", "lat", "lon").collect()
    keys = [(r["id_a"], r["id_b"]) for r in pairs]
    assert len(keys) == len(set(keys))


def test_grid_knn_equals_brute_force(spark):
    from scripts_toolkit_spark.operators.spatial import grid_knn
    from pyspark.sql.window import Window

    pts = _points(spark, 300, seed="knn").localCheckpoint()
    r, k = 0.8, 4
    queries = pts.where(F.col("point_id") < 20)
    got = sorted(
        (x["query_id"], x["rank"], x["neighbor_id"])
        for x in grid_knn(queries, pts, k, r, "point_id", "lat", "lon").collect()
    )
    a = queries.select(
        F.col("point_id").alias("qid"), F.col("lat").alias("la"), F.col("lon").alias("lo")
    )
    b = pts.select(
        F.col("point_id").alias("nid"), F.col("lat").alias("lb"), F.col("lon").alias("lob")
    )
    d2 = (F.col("la") - F.col("lb")) ** 2 + (F.col("lo") - F.col("lob")) ** 2
    w = Window.partitionBy("qid").orderBy("d2", "nid")
    brute = sorted(
        (x["qid"], x["rk"], x["nid"])
        for x in a.crossJoin(b)
        .where(F.col("qid") != F.col("nid"))
        .withColumn("d2", d2)
        .where(F.col("d2") <= r * r)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .collect()
    )
    assert got == brute and len(got) > 0


def test_grid_knn_excludes_self_and_caps_k(spark):
    from scripts_toolkit_spark.operators.spatial import grid_knn

    pts = _points(spark, 150, seed="cap").localCheckpoint()
    rows = grid_knn(pts, pts, 3, 1.5, "point_id", "lat", "lon").collect()
    per_q = {}
    for x in rows:
        assert x["query_id"] != x["neighbor_id"]
        per_q.setdefault(x["query_id"], []).append(x["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3 for v in per_q.values())

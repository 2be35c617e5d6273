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


def test_grid_knn_multires_equals_brute_force_when_satisfied(spark):
    """The multi-resolution kNN (r12): for every query whose emitted
    level ℓ had ≥ k candidates within the cell size (i.e. every
    non-final-level stop, plus final-level stops that happen to
    satisfy), the emitted top-k must equal the GLOBAL brute-force top-k
    — the 3×3-block coverage guarantee in action. Final-level
    best-effort queries must emit the brute-force top-k RESTRICTED to
    their coarsest block. Also: at most k rows per query, ranks
    contiguous from 1, levels within range."""
    from scripts_toolkit_spark.operators.spatial import grid_knn_multires

    # 300 points over 10°x10°: levels 1/2/3 all exercised (offline check:
    # stop-level histogram {1: 6, 2: 116, 3: 178} for this fixture)
    pts = _points(spark, 300).localCheckpoint()
    k, r0, L = 4, 0.15, 4
    got = grid_knn_multires(pts, pts, k, r0, levels=L).collect()
    assert got, "degenerate: no output"
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert {r["level"] for r in got} <= set(range(L))
    assert len({r["level"] for r in got}) >= 2, "only one level exercised"

    rows = pts.collect()
    coords = {r["point_id"]: (r["lat"], r["lon"]) for r in rows}

    def d2(a, b):
        (xa, ya), (xb, yb) = coords[a], coords[b]
        dx, dy = xa - xb, ya - yb
        return dx * dx + dy * dy

    import math

    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= k
        lv = rs[0]["level"]
        assert all(r["level"] == lv for r in rs)
        # provably_exact (r13): per-query constant, true iff the stopping
        # level's >= k-within-s guarantee held
        pe = rs[0]["provably_exact"]
        assert all(r["provably_exact"] == pe for r in rs)
        s = r0 * (2.0 ** lv)
        others = [p for p in coords if p != q]
        within = sum(1 for p in others if d2(q, p) <= s * s)
        brute = sorted(others, key=lambda p: (d2(q, p), p))
        if within >= k:
            assert pe is True, f"query {q} satisfied but flagged best-effort"
            assert [r["neighbor_id"] for r in rs] == brute[:k], f"query {q} level {lv}"
        else:
            assert lv == L - 1  # only the coarsest level may fall short
            assert pe is False, f"query {q} best-effort but flagged exact"
            block = [
                p for p in others
                if abs(math.floor(coords[p][0] / s) - math.floor(coords[q][0] / s)) <= 1
                and abs(math.floor(coords[p][1] / s) - math.floor(coords[q][1] / s)) <= 1
            ]
            bb = sorted(block, key=lambda p: (d2(q, p), p))
            assert [r["neighbor_id"] for r in rs] == bb[:k], f"query {q} best-effort"

    # pinned insufficient-coarsest fixture (r13 — round-12 verdict Next
    # #6): an isolated pair 0.3° apart has ONE candidate in its coarsest
    # 3×3 block (< k), so its rows MUST come back provably_exact=false,
    # while a tight 4-cluster satisfies k=3 at level 0 with true
    iso = spark.createDataFrame(
        [(1, 0.00, 0.00), (2, 0.01, 0.01), (3, 0.02, 0.00), (4, 0.03, 0.01),
         (5, 9.00, 9.00), (6, 9.30, 9.00)],
        "point_id long, lat double, lon double",
    ).localCheckpoint()
    iso_rows = grid_knn_multires(iso, iso, 3, 0.15, levels=4).collect()
    flags = {}
    for r in iso_rows:
        flags.setdefault(r["query_id"], set()).add(r["provably_exact"])
    for q in (1, 2, 3, 4):
        assert flags[q] == {True}, f"cluster point {q}: {flags.get(q)}"
    for q in (5, 6):
        assert flags[q] == {False}, f"isolated point {q}: {flags.get(q)}"
        assert len([r for r in iso_rows if r["query_id"] == q]) == 1  # best-effort short

    # every query with at least one candidate in its coarsest block emits
    all_q = set(coords)
    missing = all_q - set(by_q)
    s_max = r0 * (2.0 ** (L - 1))
    for q in missing:
        block = [
            p for p in coords
            if p != q
            and abs(math.floor(coords[p][0] / s_max) - math.floor(coords[q][0] / s_max)) <= 1
            and abs(math.floor(coords[p][1] / s_max) - math.floor(coords[q][1] / s_max)) <= 1
        ]
        assert not block, f"query {q} had coarsest-block candidates but emitted nothing"

"""Spatial join demonstrations (r11 wave 2): the grid-bucketed radius
join (operators/spatial.py) under the driver gate.

No table carries coordinates, so each customer gets a deterministic
md5-derived point in a 10°×10° extent — the same synthesis discipline as
the media demos (embeddings → payload): the OPERATOR under test is real,
the inputs are derived reproducibly from the corpus so the DuckDB oracle
can replay them exactly.

Cross-engine determinism: coordinates are (md5-bigint % 10⁶) / 10⁶ × 10 —
integer arithmetic then two IEEE double ops identical in both engines;
the refine metric is planar squared distance (multiply/add only, no libm
trig — see operators/spatial.py docstring for why not haversine); dist2
is rounded to 6 dp for display while the threshold compares the
unrounded double in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators.spatial import grid_radius_join

_RADIUS = 0.15  # degrees; ~8 expected pairs at sf0.001, ~80k at sf0.1


def _coord(prefix: str, key: Column) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix + "|"), key.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return (h % F.lit(1_000_000)) / F.lit(1_000_000.0) * F.lit(10.0)


def spatial_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within _RADIUS degrees (planar) of each other —
    the grid-bucketed radius self-join: cell = radius-sized square, probe
    side explodes to its 9 neighbor cells, candidates come from the cell
    EQUI-join (linear in N for bounded density — never an all-pairs
    plan), refine is one codegen'd squared-distance predicate.

    At 100 TB of points this is the standard spatial-join shape (PostGIS
    ST_DWithin / Sedona gridding); a hot city is ordinary key skew on the
    cell id — AQE skew-split applies unchanged."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("point_id"),
        _coord("lat", F.col("c_custkey")).alias("lat"),
        _coord("lon", F.col("c_custkey")).alias("lon"),
    )
    return grid_radius_join(pts, _RADIUS, "point_id", "lat", "lon")


SPATIAL_RADIUS_PAIRS_SQL = f"""
WITH pts AS (
  SELECT c_custkey AS pid,
    (CAST(('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
       % 1000000) / 1000000.0 * 10.0 AS lat,
    (CAST(('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
       % 1000000) / 1000000.0 * 10.0 AS lon
  FROM customer
),
cells AS (
  SELECT pid, lat, lon,
    CAST(floor(lat / {_RADIUS}) AS BIGINT) AS cy,
    CAST(floor(lon / {_RADIUS}) AS BIGINT) AS cx
  FROM pts
),
probe AS (
  SELECT pid AS id_a, lat AS lat_a, lon AS lon_a, cy + dy AS jcy, cx + dx AS jcx
  FROM cells
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy)
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx)
)
SELECT id_a, b.pid AS id_b,
  round((lat_a - b.lat) * (lat_a - b.lat)
        + (lon_a - b.lon) * (lon_a - b.lon), 6) AS dist2
FROM probe JOIN cells b ON b.cy = probe.jcy AND b.cx = probe.jcx
WHERE id_a < b.pid
  AND (lat_a - b.lat) * (lat_a - b.lat)
      + (lon_a - b.lon) * (lon_a - b.lon)
      <= CAST({_RADIUS} AS DOUBLE) * CAST({_RADIUS} AS DOUBLE)
"""


_KNN_K = 5
_KNN_RADIUS = 1.0  # degrees; bounded-kNN semantics (ST_DWithin + rank)
_KNN_QUERIES = 64  # absolute SF-independent query cap (exact-baseline style)


def spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-nearest-neighbors for a capped deterministic query set:
    the 64 md5-first customers each get their 5 nearest other customers
    within 1°, ranked by (dist2, neighbor_id). The radius bound is the
    semantics (PostGIS ST_DWithin + rank): queries in sparse regions may
    return fewer than k rows, identically in both engines — no
    data-dependent expanding-ring search hides in the plan.

    Plan shape: the query cap goes through the two-stage global_topk (no
    whole-input single-task window); queries explode ×9 to neighbor
    cells and equi-join the bucketed corpus — candidates are
    |queries|·9·density·r², never |queries|×N; the per-query rank
    windows over that bounded candidate set."""
    from scripts_toolkit_spark.operators.spatial import grid_knn
    from scripts_toolkit_spark.operators.topk import global_topk

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("point_id"),
        _coord("lat", F.col("c_custkey")).alias("lat"),
        _coord("lon", F.col("c_custkey")).alias("lon"),
    )
    qset = global_topk(
        pts.withColumn("pri", F.md5(F.col("point_id").cast("string"))),
        [F.asc("pri"), F.asc("point_id")],
        _KNN_QUERIES,
    ).drop("pri", "rank")
    return grid_knn(qset, pts, _KNN_K, _KNN_RADIUS, "point_id", "lat", "lon")


SPATIAL_KNN_SQL = f"""
WITH pts AS (
  SELECT c_custkey AS pid,
    (CAST(('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
       % 1000000) / 1000000.0 * 10.0 AS lat,
    (CAST(('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
       % 1000000) / 1000000.0 * 10.0 AS lon
  FROM customer
),
q AS (
  SELECT pid, lat, lon FROM pts
  QUALIFY row_number() OVER (ORDER BY md5(CAST(pid AS VARCHAR)), pid) <= {_KNN_QUERIES}
),
cand AS (
  SELECT q.pid AS query_id, p.pid AS neighbor_id,
    (q.lat - p.lat) * (q.lat - p.lat) + (q.lon - p.lon) * (q.lon - p.lon) AS d2
  FROM q JOIN pts p ON q.pid != p.pid
)
SELECT query_id, neighbor_id,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS INT)
    AS rank,
  round(d2, 6) AS dist2
FROM cand
WHERE d2 <= {_KNN_RADIUS} * {_KNN_RADIUS}
QUALIFY rank <= {_KNN_K}
"""


_MRK_K = 5
_MRK_BASE = 0.15  # degrees; level ℓ cell = 0.15 · 2^ℓ (0.15/0.3/0.6/1.2)
_MRK_LEVELS = 4


def spatial_knn_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBOUNDED-in-practice kNN through the multi-resolution grid (r12 —
    round-11 verdict "What's missing" #3): the 64 md5-first customers
    each get their 5 nearest other customers with NO caller-supplied
    radius — the fixed 4-level pyramid (cell 0.15° doubling to 1.2°)
    stops each query at the first level whose 3×3 block provably holds
    its true top-5 (≥ k candidates within the cell size ⇒ the global
    top-k is inside the block), and emits the coarsest block's
    best-effort top-5 for queries sparse beyond the last level. The
    emitted `level` column makes the per-query stopping level
    hash-gated, not just the neighbor sets, and `provably_exact` (r13 —
    round-12 verdict Next #6) separates guaranteed-global rows from the
    last level's block-restricted best-effort rows without the caller
    knowing the level semantics.

    Plan shape: `levels` chained bounded-kNN stages over a SHRINKING
    query set (anti-join + materialization boundary per stage — the
    expand_paths discipline); every stage is the probe-×9 explode →
    cell equi-join → per-query window. The ORACLE computes each query's
    stopping level from the monotone within-radius counts and replays
    the block membership + ranking at that level."""
    from scripts_toolkit_spark.operators.spatial import grid_knn_multires
    from scripts_toolkit_spark.operators.topk import global_topk

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("point_id"),
        _coord("lat", F.col("c_custkey")).alias("lat"),
        _coord("lon", F.col("c_custkey")).alias("lon"),
    )
    qset = global_topk(
        pts.withColumn("pri", F.md5(F.col("point_id").cast("string"))),
        [F.asc("pri"), F.asc("point_id")],
        _KNN_QUERIES,
    ).drop("pri", "rank")
    return grid_knn_multires(
        qset, pts, _MRK_K, _MRK_BASE, levels=_MRK_LEVELS,
        id_col="point_id", lat_col="lat", lon_col="lon",
    )


def _mrk_sql() -> str:
    s = [_MRK_BASE * (2.0 ** l) for l in range(_MRK_LEVELS)]
    s2 = [v * v for v in s]
    cnt_cols = ", ".join(
        f"SUM(CASE WHEN d2 <= {s2[l]!r} THEN 1 ELSE 0 END) AS c{l}"
        for l in range(_MRK_LEVELS)
    )
    sat_case = "CASE " + " ".join(
        f"WHEN c{l} >= {_MRK_K} THEN {l}" for l in range(_MRK_LEVELS - 1)
    ) + f" ELSE {_MRK_LEVELS - 1} END"
    s_case = "CASE lv " + " ".join(
        f"WHEN {l} THEN {s[l]!r}" for l in range(_MRK_LEVELS)
    ) + " END"
    return f"""
WITH pts AS (
  SELECT c_custkey AS pid,
    (CAST(('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
       % 1000000) / 1000000.0 * 10.0 AS lat,
    (CAST(('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
       % 1000000) / 1000000.0 * 10.0 AS lon
  FROM customer
),
q AS (
  SELECT pid, lat, lon FROM pts
  QUALIFY row_number() OVER (ORDER BY md5(CAST(pid AS VARCHAR)), pid) <= {_KNN_QUERIES}
),
pairs AS (
  SELECT q.pid AS query_id, q.lat AS lat_a, q.lon AS lon_a,
         p.pid AS neighbor_id, p.lat AS lat_b, p.lon AS lon_b,
    (q.lat - p.lat) * (q.lat - p.lat) + (q.lon - p.lon) * (q.lon - p.lon) AS d2
  FROM q JOIN pts p ON q.pid != p.pid
),
-- per-query stopping level from the monotone within-radius counts (the
-- 3x3 block at cell size s covers the full radius-s ball, so the block
-- count equals the ball count)
sat AS (
  SELECT query_id, {sat_case} AS lv,
         c{_MRK_LEVELS - 1} >= {_MRK_K} AS pe_last
  FROM (SELECT query_id, {cnt_cols} FROM pairs GROUP BY query_id)
),
blocked AS (
  SELECT query_id, neighbor_id, d2, lv, pe
  FROM (
    SELECT p.*, s.lv, {s_case} AS cs,
           (s.lv < {_MRK_LEVELS - 1} OR s.pe_last) AS pe
    FROM pairs p JOIN sat s USING (query_id)
  )
  WHERE abs(CAST(floor(lat_b / cs) AS BIGINT) - CAST(floor(lat_a / cs) AS BIGINT)) <= 1
    AND abs(CAST(floor(lon_b / cs) AS BIGINT) - CAST(floor(lon_a / cs) AS BIGINT)) <= 1
)
SELECT query_id, neighbor_id,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS INT)
    AS rank,
  round(d2, 6) AS dist2,
  CAST(lv AS INT) AS level,
  pe AS provably_exact
FROM blocked
QUALIFY rank <= {_MRK_K}
"""


SPATIAL_KNN_MULTIRES_SQL = _mrk_sql()

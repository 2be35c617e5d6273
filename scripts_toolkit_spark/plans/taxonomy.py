"""Taxonomy/hierarchy pipeline (SURVEY.md §3.3) + driver-contract demos.

The demo hierarchy is synthesized deterministically from the driver star
schema as a 4–5 level DAG shaped like the CDR presentation linkbase:

    root
     └─ sch-region_<r>                (schedule level; code after last '-')
         ├─ line_nation_<n>           (line grouping)
         │   └─ cc_cust_<c>           (leaf concepts, cc_ prefix as in XBRL)
         └─ colset_<n>                (column-set level)
             └─ column_col_<c>        (column level)
                 └─ cc_cust_<c>       (VIP customers only: second path!)

VIP customers (custkey % 10 == 0) therefore reach the root via TWO simple
paths — the multi-path correctness case the reference's golden file
exhibits (a concept on ≥2 placements).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.materialize import materialize as _materialize
from scripts_toolkit_spark.operators import graph as G

ROOT = "root"


def demo_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Child→parent edge list of the demo taxonomy DAG."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    cust_line = c.select(
        F.concat(F.lit("cc_cust_"), "c_custkey").alias("src"),
        F.concat(F.lit("line_nation_"), "c_nationkey").alias("dst"),
    )
    line_sch = n.select(
        F.concat(F.lit("line_nation_"), "n_nationkey").alias("src"),
        F.concat(F.lit("sch-region_"), "n_regionkey").alias("dst"),
    )
    sch_root = r.select(
        F.concat(F.lit("sch-region_"), "r_regionkey").alias("src"),
        F.lit(ROOT).alias("dst"),
    )
    vip = c.where(F.col("c_custkey") % 10 == 0)
    vip_col = vip.select(
        F.concat(F.lit("cc_cust_"), "c_custkey").alias("src"),
        F.concat(F.lit("column_col_"), "c_custkey").alias("dst"),
    )
    col_colset = vip.select(
        F.concat(F.lit("column_col_"), "c_custkey").alias("src"),
        F.concat(F.lit("colset_"), "c_nationkey").alias("dst"),
    )
    colset_sch = n.select(
        F.concat(F.lit("colset_"), "n_nationkey").alias("src"),
        F.concat(F.lit("sch-region_"), "n_regionkey").alias("dst"),
    )
    out = cust_line
    for part in (line_sch, sch_root, vip_col, col_colset, colset_sch):
        out = out.unionByName(part)
    # no distinct: every part is internally unique (src embeds a unique key)
    # and parts are pairwise disjoint (distinct src prefixes), so UNION ALL
    # equals the oracle's UNION without paying a full-edge-list shuffle
    return out


# Recursive-CTE oracle over the same edge construction. Paths rendered as
# '>'-joined strings in leaf→root order.
_EDGES_SQL = """
  SELECT 'cc_cust_' || c_custkey AS src, 'line_nation_' || c_nationkey AS dst FROM customer
  UNION
  SELECT 'line_nation_' || n_nationkey, 'sch-region_' || n_regionkey FROM nation
  UNION
  SELECT 'sch-region_' || r_regionkey, 'root' FROM region
  UNION
  SELECT 'cc_cust_' || c_custkey, 'column_col_' || c_custkey FROM customer WHERE c_custkey % 10 = 0
  UNION
  SELECT 'column_col_' || c_custkey, 'colset_' || c_nationkey FROM customer WHERE c_custkey % 10 = 0
  UNION
  SELECT 'colset_' || n_nationkey, 'sch-region_' || n_regionkey FROM nation
"""

_PATHS_CTE = f"""
WITH RECURSIVE edges AS ({_EDGES_SQL}),
lvs AS (
  SELECT DISTINCT src AS node FROM edges
  WHERE src NOT IN (SELECT dst FROM edges)
),
walk(concept, node, path, depth) AS (
  SELECT node, node, node, 1 FROM lvs WHERE node LIKE 'cc_%' OR node LIKE 'uc_%'
  UNION ALL
  SELECT w.concept, e.dst, w.path || '>' || e.dst, w.depth + 1
  FROM walk w JOIN edges e ON w.node = e.src
),
paths AS (SELECT concept, path, depth FROM walk WHERE node = 'root')
"""


def hierarchy_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1–G3: leaf discovery (anti-join) + iterative path expansion.
    One row per (concept, distinct path to root).

    The edge frame is MATERIALIZED once (r15 — round-14 verdict Next #5):
    the un-cut plan inlined the 6-scan edge-union subtree FOUR times
    (leaves() twice, the closure's internal-edge collect, the starts
    join), and the resulting 2,091-line plan cost ~2 s of driver-side
    compile per run — the dominant slice of this row's wall. One
    checkpoint job collapses every consumer to an RDD scan (interleaved
    A/B: 2.89 → 1.66 s min-of-4, rows identical)."""
    edges = demo_edges(spark, sf_dir).transform(_materialize)
    lv = G.leaves(edges).where(
        F.col("node").startswith("cc_") | F.col("node").startswith("uc_")
    )
    paths = G.expand_paths(edges, lv, ROOT, start_partitions=8)
    return paths.select(
        "concept",
        F.concat_ws(">", "path").alias("path"),
        F.size("path").alias("depth"),
    )


HIERARCHY_PATHS_SQL = _PATHS_CTE + "SELECT concept, path, CAST(depth AS INT) AS depth FROM paths"


# ---- deep-chain variant: 10 intermediate levels stress the fixpoint loop
# (bench comparability item: depth ~13 vs ~5 in hierarchy_paths) ------------
_DEEP = 10


def deep_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Child→parent edges of a deep synthetic taxonomy: customer →
    lvl0..lvl9 (per nation) → schedule (per region) → root."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    parts = [
        c.select(
            F.concat(F.lit("cc_cust_"), "c_custkey").alias("src"),
            F.concat(F.lit("lvl0_nation_"), "c_nationkey").alias("dst"),
        )
    ]
    # one nation scan + exploded level array, not _DEEP-1 separate scans:
    # the per-scan task/analysis overhead dominated the edge build
    parts.append(
        n.select(
            "n_nationkey",
            F.explode(F.array(*[F.lit(k) for k in range(_DEEP - 1)])).alias("k"),
        ).select(
            F.concat(F.lit("lvl"), "k", F.lit("_nation_"), "n_nationkey").alias("src"),
            F.concat(F.lit("lvl"), F.col("k") + 1, F.lit("_nation_"), "n_nationkey").alias(
                "dst"
            ),
        )
    )
    parts.append(
        n.select(
            F.concat(F.lit(f"lvl{_DEEP - 1}_nation_"), "n_nationkey").alias("src"),
            F.concat(F.lit("sch-region_"), "n_regionkey").alias("dst"),
        )
    )
    parts.append(
        r.select(
            F.concat(F.lit("sch-region_"), "r_regionkey").alias("src"),
            F.lit(ROOT).alias("dst"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # parts are pairwise disjoint and internally unique (see demo_edges):
    # skipping distinct saves a full shuffle of the edge list per query
    return out


def hierarchy_paths_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 at 10× depth: same fixpoint join, ~13 iterations — the bench
    entry that makes per-iteration overhead regressions visible.
    Edge frame materialized once — the hierarchy_paths r15 compile cut
    (interleaved A/B: 2.04 → 1.40 s min-of-4)."""
    edges = deep_edges(spark, sf_dir).transform(_materialize)
    lv = G.leaves(edges).where(F.col("node").startswith("cc_"))
    paths = G.expand_paths(edges, lv, ROOT, max_depth=_DEEP + 5, start_partitions=8)
    return paths.select(
        "concept",
        F.concat_ws(">", "path").alias("path"),
        F.size("path").alias("depth"),
    )


_DEEP_EDGES_SQL = f"""
  SELECT 'cc_cust_' || c_custkey AS src, 'lvl0_nation_' || c_nationkey AS dst FROM customer
  UNION
  SELECT 'lvl' || k || '_nation_' || n_nationkey, 'lvl' || (k + 1) || '_nation_' || n_nationkey
  FROM nation, UNNEST(range({_DEEP - 1})) AS t(k)
  UNION
  SELECT 'lvl{_DEEP - 1}_nation_' || n_nationkey, 'sch-region_' || n_regionkey FROM nation
  UNION
  SELECT 'sch-region_' || r_regionkey, 'root' FROM region
"""

HIERARCHY_PATHS_DEEP_SQL = f"""
WITH RECURSIVE edges AS ({_DEEP_EDGES_SQL}),
lvs AS (
  SELECT DISTINCT src AS node FROM edges
  WHERE src NOT IN (SELECT dst FROM edges)
),
walk(concept, node, path, depth) AS (
  SELECT node, node, node, 1 FROM lvs WHERE node LIKE 'cc_%'
  UNION ALL
  SELECT w.concept, e.dst, w.path || '>' || e.dst, w.depth + 1
  FROM walk w JOIN edges e ON w.node = e.src
)
SELECT concept, path, CAST(depth AS INT) AS depth FROM walk WHERE node = 'root'
"""


def hierarchy_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: path classification + positional field extraction (the
    reference's temp_column/temp_line logic as array expressions).
    Edge frame materialized once — the hierarchy_paths r15 compile cut."""
    edges = demo_edges(spark, sf_dir).transform(_materialize)
    lv = G.leaves(edges).where(F.col("node").startswith("cc_"))
    classified = G.classify_paths(G.expand_paths(edges, lv, ROOT, start_partitions=8))
    return classified.select(
        "concept",
        "schedule",
        "kind",
        F.element_at("mid", 1).alias("schedule_code"),
        F.when(F.col("kind") == "column", F.element_at("mid", 2)).alias("colset_code"),
        F.when(F.col("kind") == "column", F.element_at("mid", 3)).alias("column_code"),
        F.when(F.col("kind") == "column", F.greatest(F.size("mid") - 3, F.lit(0)))
        .otherwise(F.greatest(F.size("mid") - 1, F.lit(0)))
        .alias("n_extras"),
    )


HIERARCHY_CLASSIFY_SQL = _PATHS_CTE + """
, parsed AS (
  SELECT concept,
    string_split(path, '>') AS nodes
  FROM paths
)
SELECT concept,
  string_split(nodes[-2], '-')[-1] AS schedule,
  CASE WHEN EXISTS (SELECT 1 FROM unnest(nodes) AS t(x) WHERE x LIKE '%column%') THEN 'column'
       WHEN EXISTS (SELECT 1 FROM unnest(nodes) AS t(x) WHERE x LIKE '%line%') THEN 'line'
       ELSE 'other' END AS kind,
  list_reverse(nodes[2:-2])[1] AS schedule_code,
  CASE WHEN EXISTS (SELECT 1 FROM unnest(nodes) AS t(x) WHERE x LIKE '%column%')
       THEN list_reverse(nodes[2:-2])[2] END AS colset_code,
  CASE WHEN EXISTS (SELECT 1 FROM unnest(nodes) AS t(x) WHERE x LIKE '%column%')
       THEN list_reverse(nodes[2:-2])[3] END AS column_code,
  CASE WHEN EXISTS (SELECT 1 FROM unnest(nodes) AS t(x) WHERE x LIKE '%column%')
       THEN CAST(greatest(len(nodes) - 2 - 3, 0) AS INT)
       ELSE CAST(greatest(len(nodes) - 2 - 1, 0) AS INT) END AS n_extras
FROM parsed
"""

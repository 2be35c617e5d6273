"""Oracle-gated demos for the S1 fleet-scale fetch path (r13 — round-12
verdict Next #5: `io/sources.fetch_manifest` was pytest-only; the driver
gate never exercised URL-manifest fetching end-to-end).

Shape: a deterministic file:// corpus is synthesized from the `nation`
dimension (25 rows, constant at every SF — KB control plane), a manifest
frame of URLs drives `fetch_manifest`'s Arrow-batched per-partition
fetch, and the fetched BYTES are parsed back with pure column expressions
(decode → line split → field split → fold). One manifest row points at a
missing file, so the failure-as-row contract (status != 'ok', no job
abort) is value-gated too. The oracle replays the file contents, byte
lengths, and parsed aggregates straight from `nation` in SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.io.sources import fetch_manifest


def url_manifest_fetch_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 at fleet scale under the value gate: synthesize one CSV per
    region from `nation` (header + 'nationkey,name' lines, nationkey
    ascending, trailing newline — byte-reproducible), stage them in a
    session-scoped dir, fetch via a file:// URL manifest through
    `fetch_manifest` (mapInPandas — executors fetch in parallel; the
    driver only stages the KB fixtures). LOCAL-MODE ASSUMPTION (advisor
    r13): the fixtures live on the DRIVER's /tmp and the file:// fetch
    runs on executors, which is correct only when executors share the
    driver filesystem (local[*] — every driver-gate run). On a real
    cluster this demo's fixtures would need staging on a shared path
    (e.g. under the warehouse/sf_dir); `fetch_manifest` itself is
    transport-agnostic — http(s):// manifests have no such assumption.
    Then parse the fetched bytes
    back: decode → drop header/blank lines → per-file line count and
    nationkey sum folded with `aggregate`. The manifest's sixth row
    points at a missing file and must surface as an error ROW
    (status 'error: URLError', 0 bytes, empty parse), not a job abort.
    Output keyed by basename (the staging dir is session-scoped, so the
    full URL is not oracle-stable)."""
    rows = sorted(
        (int(r["n_nationkey"]), str(r["n_name"]), int(r["n_regionkey"]))
        for r in load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    )
    groups: dict[int, list[tuple[int, str]]] = {}
    for k, name, rk in rows:
        groups.setdefault(rk, []).append((k, name))
    staging = os.path.join(
        "/tmp/spark_graft_fetch_demo", spark.sparkContext.applicationId
    )
    os.makedirs(staging, exist_ok=True)
    urls = []
    for rk in sorted(groups):
        text = (
            "nationkey,name\n"
            + "\n".join(f"{k},{name}" for k, name in groups[rk])
            + "\n"
        )
        path = os.path.join(staging, f"region_{rk}.csv")
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
        urls.append(f"file://{path}",)
    urls.append(f"file://{staging}/missing_9.csv")
    manifest = spark.createDataFrame([(u,) for u in urls], "url string")

    fetched = fetch_manifest(spark, manifest)
    lines = F.filter(
        F.split(F.decode("content", "UTF-8"), "\n"),
        lambda x: (x != F.lit("")) & (x != F.lit("nationkey,name")),
    )
    return fetched.select(
        F.element_at(F.split("url", "/"), -1).alias("fname"),
        "status",
        "n_bytes",
        F.size(lines).alias("n_lines"),
        F.aggregate(
            lines,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.split(x, ",").getItem(0).cast("bigint"),
        ).alias("key_sum"),
    )


URL_MANIFEST_FETCH_MELT_SQL = """
WITH per AS (
  SELECT n_regionkey AS rk,
    'nationkey,name' || chr(10)
      || string_agg(CAST(n_nationkey AS VARCHAR) || ',' || n_name, chr(10)
                    ORDER BY n_nationkey)
      || chr(10) AS content,
    COUNT(*) AS n_lines,
    SUM(n_nationkey) AS key_sum
  FROM nation GROUP BY n_regionkey
)
SELECT 'region_' || CAST(rk AS VARCHAR) || '.csv' AS fname,
       'ok' AS status,
       CAST(strlen(content) AS BIGINT) AS n_bytes,
       CAST(n_lines AS INT) AS n_lines,
       CAST(key_sum AS BIGINT) AS key_sum
FROM per
UNION ALL
SELECT 'missing_9.csv', 'error: URLError', 0, 0, 0
"""

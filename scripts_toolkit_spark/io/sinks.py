"""Sinks (SURVEY.md §2.1 S7–S8).

The reference delivers JSON records (mdrm :266, converter :280,
cdr :258-262) with golden-file naming `<form>_<quarter>.json` (cdr :261).
Parquet partitioned by quarter is the engine's canonical bulk layout; JSON
stays as the export/delivery format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_json_records(df: DataFrame, path: str, coalesce_single: bool = False) -> None:
    """JSON-records sink (S7). `coalesce_single=True` reproduces the
    reference's one-document-per-run delivery for small control outputs;
    leave False for bulk data (one file per partition)."""
    out = df.coalesce(1) if coalesce_single else df
    out.write.mode("overwrite").json(path)


def golden_name(form_number: str, quarter: str, ext: str = "json") -> str:
    """S8: `<form>_<quarter>.<ext>` naming (reference cdr :261)."""
    return f"{form_number}_{quarter}.{ext}"


def write_partitioned_parquet(
    df: DataFrame, base: str, partition_cols: tuple[str, ...] = ("quarter",)
) -> None:
    """Canonical bulk persistence: partition pruning by quarter makes
    per-quarter reads O(quarter) at 100 TB (SURVEY §1.3)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(base)


def export_taxonomy_json(assembled_json: DataFrame, out_dir: str, form_number: str, quarter: str) -> str:
    """Golden-file-shaped taxonomy export: single JSON document per run."""
    dest = os.path.join(out_dir, golden_name(form_number, quarter))
    rows = assembled_json.collect()  # taxonomy exports are KB-scale control data
    import json

    with open(dest, "w") as f:
        json.dump(
            {
                "form_number": form_number,
                "quarter": quarter,
                "data": {r["concept"]: json.loads(r["json"]) for r in rows},
            },
            f,
        )
    return dest


def write_zordered_parquet(
    df: DataFrame,
    base: str,
    zorder_cols: tuple[str, str],
    n_files: int = 32,
    bits: int = 8,
) -> None:
    """Z-ORDERED bulk layout: interleave the two clustering columns'
    bits into a Morton key, range-partition the frame on it, sort within
    each partition, and write one parquet file per partition — so every
    FILE and every ROW GROUP covers a contiguous z-range whose min/max
    footer stats are tight on BOTH columns. A min/max-pruning reader
    (Spark's parquet filter pushdown) then skips most files for a point
    or range predicate on EITHER column — the dominant scan lever at
    100 TB, where partitioning by one column leaves the other a full
    scan. (Same math as the `zorder_layout_stats` contract query; this is
    the real-files form, effectiveness pinned by the pyarrow row-group
    test.)

    Columns scale to the 2^bits grid from a one-row min/max aggregate
    (one cheap pre-pass); the Morton key is pure shift/mask arithmetic.
    `repartitionByRange` samples boundaries — layout, not results, so
    sampling nondeterminism is acceptable in a sink."""
    from pyspark.sql import functions as F

    c1, c2 = zorder_cols
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(c1).cast("double"),
        F.max(c1).cast("double"),
        F.min(c2).cast("double"),
        F.max(c2).cast("double"),
    ).collect()[0]
    grid = (1 << bits) - 1

    def scaled(col: str, lo: float, hi: float):
        span = (hi - lo) or 1.0
        return F.least(
            F.lit(grid),
            F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(grid + 1)).cast("int"),
        )

    b1, b2 = scaled(c1, lo1, hi1), scaled(c2, lo2, hi2)
    zkey = F.lit(0)
    for i in range(bits):
        zkey = zkey + F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i)
        zkey = zkey + F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    (
        df.withColumn("__z", zkey)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(base)
    )

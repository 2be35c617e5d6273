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

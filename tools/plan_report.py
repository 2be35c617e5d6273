"""Generate PLANS.md: a physical-plan audit of every registered query.

For each query: the parquet ReadSchemas (column-pruning evidence), pushed
filters, join strategies, shuffle (Exchange) count, and whether any
CartesianProduct / non-allowlisted BroadcastNestedLoopJoin appears — the
at-a-glance answer to "does this plan survive 100 TB".

Usage: python tools/plan_report.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from scripts_toolkit_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("plan-report")
    qs = e.queries()
    lines = [
        "# PLANS — physical-plan audit of every registered query",
        "",
        f"Generated against `{SF_DIR}` (regenerate: `python tools/plan_report.py`).",
        "Columns: parquet ReadSchemas (pruning), pushed filters, join",
        "strategies, Exchange (shuffle) count, pairing hazards.",
        "",
        "| query | scans (pruned columns) | pushed filters | joins | shuffles | hazards |",
        "|---|---|---|---|---|---|",
    ]
    for name, fn in qs.items():
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # pragma: no cover - report, don't die
            lines.append(f"| {name} | ERROR: {type(ex).__name__} | | | | |")
            continue
        schemas = sorted(
            {seg[: seg.index(">") + 1] for seg in plan.split("ReadSchema: struct")[1:] if ">" in seg}
        )
        scans = "; ".join(f"struct{s}"[:90] for s in schemas) or "(no parquet scan)"
        pushed = sorted(
            {
                m[:60]
                for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
                if m.strip()
            }
        )
        joins = []
        for j in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        ):
            n = plan.count(j)
            if n:
                joins.append(f"{j.replace('Join', '')}×{n}")
        shuffles = plan.count("Exchange ")
        hazards = []
        if "CartesianProduct" in plan:
            hazards.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            hazards.append("BNLJ(reviewed)")
        lines.append(
            "| {} | {} | {} | {} | {} | {} |".format(
                name,
                scans.replace("|", "/"),
                "; ".join(pushed).replace("|", "/") or "—",
                ", ".join(joins) or "—",
                shuffles,
                ", ".join(hazards) or "—",
            )
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(qs)} queries)")


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed to completion (collect of the aggregated result —
results are small by construction) and timed wall-clock. A warmup pass runs
first so JVM/codegen startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the queries whose shapes dominate real workloads — scan-agg,
# fact⋈fact + broadcast dims, top-k, semi-join.
HEADLINE = (
    "pricing_summary",
    "revenue_by_nation",
    "top_unshipped_orders",
    "order_priority_counts",
)


def main() -> None:
    from scripts_toolkit_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("bench")
    qs = e.queries()
    names = [n for n in HEADLINE if n in qs]
    # include any registered query marked for bench via BENCH_EXTRA env
    extra = [n for n in os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",") if n in qs]
    names += [n for n in extra if n not in names]

    # warmup: run the first query once to pay JVM + codegen startup
    qs[names[0]](spark, SF_DIR).limit(1).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, SF_DIR).collect()
        timings[name] = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

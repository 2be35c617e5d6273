"""Warm min-of-N timer for a list of registered queries under the CURRENT
environment — the building block for interleaved config A/Bs (r15).

Usage: SPARK_GRAFT_AQE_MIN_PARTITION_SIZE=1m python tools/ab_queries.py q1 q2 ... [--repeat N]

Prints one JSON line: {"env": {...}, "queries": {name: {"min":, "med":, "runs": [...]}}}
Run exclusively (no concurrent pytest/bench — CLAUDE.md contention rule).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 3
    for a in sys.argv[1:]:
        if a.startswith("--repeat="):
            repeat = int(a.split("=")[1])

    from scripts_toolkit_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("ab-queries")
    qs = e.queries()

    def _noop(df):
        df.write.mode("overwrite").format("noop").save()

    # warm the JVM + the Arrow worker pool exactly like bench.py
    qs[args[0]](spark, SF_DIR).limit(1).collect()

    def _touch(it):
        import pandas as _pd

        for pdf in it:
            yield _pd.DataFrame({"x": pdf["id"][:1]})

    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(_touch, "x long").count()

    out = {}
    for name in args:
        runs = []
        for _ in range(repeat):
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
        out[name] = {
            "min": min(runs),
            "med": round(statistics.median(runs), 3),
            "runs": runs,
        }
    print(
        json.dumps(
            {
                "env": {
                    "floor": os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "1b"),
                },
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()

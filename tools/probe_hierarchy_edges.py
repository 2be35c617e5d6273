"""A/B: does materializing the demo edge frame cut hierarchy_paths'
driver-side plan-compile gap? (r15 — round-14 verdict Next #5: 2.0 s of
the 3.1 s wall was plan compile; the 2,091-line plan inlines the 6-scan
edge-union subtree FOUR times — leaves() twice, the closure collect,
the starts join.)

Usage: python tools/probe_hierarchy_edges.py [repeat=4]
Interleaves BASE (registered shape) and MAT (edges localCheckpointed
before leaves/expand) in one session; prints min/med of each.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.session import get_spark
    from scripts_toolkit_spark.materialize import materialize as _mat
    from scripts_toolkit_spark.plans import taxonomy as T
    from scripts_toolkit_spark.operators import graph as G

    spark = get_spark("probe-hierarchy-edges")

    def base():
        return T.hierarchy_paths(spark, SF_DIR)

    def mat():
        edges = T.demo_edges(spark, SF_DIR).transform(_mat)
        lv = G.leaves(edges).where(
            F.col("node").startswith("cc_") | F.col("node").startswith("uc_")
        )
        paths = G.expand_paths(edges, lv, T.ROOT, start_partitions=8)
        return paths.select(
            "concept",
            F.concat_ws(">", "path").alias("path"),
            F.size("path").alias("depth"),
        )

    def deep_base():
        return T.hierarchy_paths_deep(spark, SF_DIR)

    def deep_mat():
        edges = T.deep_edges(spark, SF_DIR).transform(_mat)
        lv = G.leaves(edges).where(F.col("node").startswith("cc_"))
        paths = G.expand_paths(
            edges, lv, T.ROOT, max_depth=T._DEEP + 5, start_partitions=8
        )
        return paths.select(
            "concept",
            F.concat_ws(">", "path").alias("path"),
            F.size("path").alias("depth"),
        )

    def _noop(df):
        df.write.mode("overwrite").format("noop").save()

    _noop(base())  # warm
    out = {}
    for name, fn in (("base", base), ("mat", mat), ("deep_base", deep_base), ("deep_mat", deep_mat)):
        out[name] = []
    for _ in range(repeat):
        for name, fn in (("base", base), ("mat", mat), ("deep_base", deep_base), ("deep_mat", deep_mat)):
            t0 = time.time()
            _noop(fn())
            out[name].append(time.time() - t0)
    # result parity check (cheap, sf-level): same sorted rows
    b = sorted(map(tuple, base().collect()))
    m = sorted(map(tuple, mat().collect()))
    print("rows equal:", b == m, len(b))
    for name, runs in out.items():
        print(
            f"{name:10} min={min(runs):.3f} med={statistics.median(runs):.3f} runs={[round(r,3) for r in runs]}"
        )


if __name__ == "__main__":
    main()

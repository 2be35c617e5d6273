"""Targeted timing probe for the PQ ANN serving family (round-14 —
round-13 verdict Next #1): times the three regressed registered queries
(ann_topk_spilled / ann_topk_ivfpq / ann_index_spilled) plus the
residual and plain store SERVING legs in isolation, warm-min over
repeats, on the current code. Run exclusively (no concurrent pytest /
bench — CLAUDE.md contention note).

Usage: python tools/probe_pq_family.py [repeat]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from scripts_toolkit_spark.ext import ann_index as ANN
    from scripts_toolkit_spark.io.catalog import load_table
    from scripts_toolkit_spark.session import get_spark

    spark = get_spark("probe_pq_family")
    qs = e.queries()

    def _noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # same pool warmups as bench.py
    qs["ann_topk_ivf"](spark, SF_DIR).limit(1).collect()

    def _touch(it):
        import pandas as _pd

        for pdf in it:
            yield _pd.DataFrame({"x": pdf["id"][:1]})

    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(_touch, "x long").count()

    print(f"loadavg={os.getloadavg()[0]:.2f} repeat={repeat} sf_dir={SF_DIR}")
    results = {}
    for name in ("ann_topk_ivfpq", "ann_topk_spilled", "ann_index_spilled"):
        runs = []
        for _ in range(repeat):
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            runs.append(time.time() - t0)
        results[name] = min(runs)
        print(f"{name}: min={min(runs):.3f} runs={[round(r, 3) for r in runs]}")

    # serving legs in isolation (store built once, search repeated warm)
    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    late = emb.where(F.col("vec_id") % 5 == 0)
    root = "/tmp/spark_graft_probe_pq/" + spark.sparkContext.applicationId
    specs = {
        "serving_residual": (
            lambda p: (
                ANN.build_ann_index(
                    base, p, n_home=2, residual=True, pq_n_codes=64, m=4, sub_dim=16
                ),
                ANN.append_to_index(spark, p, late),
            ),
            lambda p: _noop(
                ANN.search_index(spark, p, k=3, n_probe=4, use_pq=True, rerank_factor=16)
            ),
        ),
        "serving_plain_pq": (
            lambda p: (ANN.build_ann_index(base, p, n_home=2), ANN.append_to_index(spark, p, late)),
            lambda p: _noop(ANN.search_index(spark, p, k=3, n_probe=3)),
        ),
    }
    for name, (build, serve) in specs.items():
        path = f"{root}/{name}"
        shutil.rmtree(path, ignore_errors=True)
        build(path)
        runs = []
        for _ in range(repeat):
            t0 = time.time()
            serve(path)
            runs.append(time.time() - t0)
        results[name] = min(runs)
        print(f"{name}: min={min(runs):.3f} runs={[round(r, 3) for r in runs]}")
        shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()

"""Dump `.explain("formatted")` for bench queries into plans/r15/.

Usage: python tools/dump_plans_r15.py <suffix: before|after> [names...]
(default names: every bench query — HEADLINE + EXTRA_DEFAULT).

The optimization-round deliverable: plans/r15/<query>_<suffix>.txt holds
the formatted physical plan so a reader can check plan-shape claims
(Exchange count, join strategy, PushedFilters, Python-eval nodes)
without running Spark. NOTE: building a demo's DataFrame executes its
lifecycle side effects (store builds), so run this exclusively like the
bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> None:
    import bench
    import __spark_entry__ as e
    from scripts_toolkit_spark.session import get_spark

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    spark = get_spark("dump-plans-r15")
    qs = e.queries()
    if not names:
        names = [n for n in bench.HEADLINE + bench.EXTRA_DEFAULT if n in qs]
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # pragma: no cover — record, don't die
            plan = f"ERROR building plan: {type(ex).__name__}: {ex}\n"
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")


if __name__ == "__main__":
    main()

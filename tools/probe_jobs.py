"""Job-level wall-clock attribution for a registered query (r14).

Runs ONE query with the Spark event log enabled, then parses the log and
prints every job's duration + call site for the WARM repeat — at sf0.1
the heavy entries are dominated by fixed per-job overheads (driver
round-trips, plan compiles, tiny-task scheduling), so the question is
"which driver-side step schedules which jobs, and what does each cost",
not "which stage shuffles the most bytes".

Usage: python tools/probe_jobs.py <query_name> [repeat=2]
Run exclusively (no concurrent pytest/bench — CLAUDE.md contention rule).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LOG_DIR = "/tmp/spark_graft_eventlogs"


def _event_lines(app_id: str):
    """Yield event-log JSON lines — Spark 4 writes a rolling
    `eventlog_v2_<appId>/` directory of `events_*` parts; older layouts a
    single `<appId>` file."""
    flat = os.path.join(LOG_DIR, app_id)
    if os.path.isfile(flat):
        with open(flat) as f:
            yield from f
        return
    d = os.path.join(LOG_DIR, f"eventlog_v2_{app_id}")
    parts = sorted(
        p for p in os.listdir(d) if p.startswith("events_")
    )
    for p in parts:
        fp = os.path.join(d, p)
        if p.endswith(".zstd"):
            # no python zstd module in this env; shell out to the zstd CLI
            import subprocess

            out = subprocess.run(
                ["zstd", "-dc", fp], capture_output=True, check=True
            ).stdout
            yield from out.decode("utf-8").splitlines()
        else:
            with open(fp) as f:
                yield from f


def main() -> None:
    name = sys.argv[1]
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    # the probe session is session.py's config EXACTLY (advisor r14 #4:
    # the hand-duplicated dict drifted once and misattributed the very
    # overhead being measured) with only the event log layered on top
    from scripts_toolkit_spark.session import engine_confs

    cpus = os.environ["SPARK_GRAFT_CPUS"]
    builder = SparkSession.builder.appName(f"probe-jobs-{name}").master(f"local[{cpus}]")
    for k, v in engine_confs().items():
        builder = builder.config(k, v)
    spark = (
        builder.config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", LOG_DIR)
        .getOrCreate()
    )

    import __spark_entry__ as e

    qs = e.queries()
    fn = qs[name]

    def _noop(df):
        df.write.mode("overwrite").format("noop").save()

    # pool warmups as in bench.py
    fn(spark, SF_DIR).limit(1).collect()

    def _touch(it):
        import pandas as _pd

        for pdf in it:
            yield _pd.DataFrame({"x": pdf["id"][:1]})

    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(_touch, "x long").count()

    marks = []
    for i in range(repeat):
        t0 = time.time()
        _noop(fn(spark, SF_DIR))
        t1 = time.time()
        marks.append((t0 * 1000, t1 * 1000, t1 - t0))
        print(f"run {i}: {t1 - t0:.3f}s")

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: job start/end + call site within the LAST run
    lo, hi, wall = marks[-1]
    jobs = {}
    for line in _event_lines(app_id):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "site": props.get("callSite.short", "?"),
                "stages": len(ev.get("Stage IDs", [])),
                "tasks": sum(
                    s.get("Number of Tasks", 0)
                    for s in ev.get("Stage Infos", [])
                ),
            }
        elif ev.get("Event") == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]
    rows = [
        (j["start"], (j.get("end", j["start"]) - j["start"]) / 1000.0, j["site"], j["stages"], j["tasks"])
        for j in jobs.values()
        if lo <= j["start"] <= hi
    ]
    rows.sort()
    total_job = sum(r[1] for r in rows)
    print(f"\nwarm run wall {wall:.3f}s; {len(rows)} jobs, sum(job durations) {total_job:.3f}s")
    print(f"gap (driver-side, between jobs): {wall - total_job:.3f}s")
    prev_end = None
    for start, dur, site, stages, tasks in rows:
        gap = (start - prev_end) / 1000.0 if prev_end is not None else 0.0
        prev_end = start + dur * 1000
        print(f"  +{gap:6.3f} gap | {dur:7.3f}s {stages}st/{tasks:3d}tk  {site}")


if __name__ == "__main__":
    main()

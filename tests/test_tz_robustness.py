"""Timezone robustness: events-based queries must produce UTC-stable
results even when the hosting session starts in a non-UTC timezone (the
driver runs queries in ITS session, whose tz we don't control)."""

from __future__ import annotations

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.streaming.windows import tumbling_counts


def test_events_queries_pin_utc(spark, sf_dir):
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ev = load_table(spark, sf_dir, "events")  # must pin tz back to UTC
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = {
            (r["window_start"], r["event_type"]): r["n"]
            for r in tumbling_counts(ev).collect()
        }
        # recompute from a clean-UTC state — identical boundaries expected
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        want = {
            (r["window_start"], r["event_type"]): r["n"]
            for r in tumbling_counts(load_table(spark, sf_dir, "events")).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)

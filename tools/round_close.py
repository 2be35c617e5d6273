"""One-command round close-out (round-9 verdict Next #5): the manifest
refresh + ordering check have been forgotten twice running (r8: missed
refresh left the gate red; r9: a comment-only docstring edit drifted a
registered fn's hash). This tool makes the close-out a single command:

    python tools/round_close.py [--all] [changed_query ...]

1. refreshes tests/registry_manifest.json (tools/update_registry_manifest.py);
2. runs tests/test_registry_order.py and FAILS LOUDLY if the ordering
   contract is red (e.g. a changed query parked past the window — the
   manifest refresh only touches in-window hashes, so that stays red by
   design until the query is rotated in);
3. prints the tri-SF verify commands for the queries named on the
   command line (CLAUDE.md: changed queries must verify at sf0.001,
   sf0.01 AND sf0.1 — several past bugs showed at only one SF), or a
   reminder when none are named.

`--all` (round-10 verdict Next #3) additionally runs the FULL-REGISTRY
oracle sweep at sf0.01 — the driver samples only the first 50 of the
registry, so out-of-window correctness otherwise rests on rotation-time
runs plus judge sampling. The sweep's counts land in FULL_SWEEP.json at
the repo root (commit it with the round close) and any failure fails
this tool. Takes ~10-15 min; do not overlap a bench measurement.

Without --all it does NOT run verify sweeps itself: they take minutes
each and must not overlap a bench measurement (CLAUDE.md contention
note), so the operator runs them deliberately.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def full_sweep() -> int:
    """Run verify_local over EVERY registered query at sf0.01, record the
    summary (and any failures) in FULL_SWEEP.json."""
    print("== full-registry oracle sweep (sf0.01) ==", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_local.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    out = r.stdout
    sys.stdout.write(out[-4000:])
    m = re.search(r"(\d+) ok, (\d+) weak \(rows-only\), (\d+) FAILED of (\d+)", out)
    summary = {
        "sf_dir": os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01"),
        "ok": int(m.group(1)) if m else None,
        "weak_rows_only": int(m.group(2)) if m else None,
        "failed": int(m.group(3)) if m else None,
        "total": int(m.group(4)) if m else None,
        "failed_names": re.findall(r"^FAIL (\S+):", out, re.M),
        "rc": r.returncode,
    }
    with open(os.path.join(REPO, "FULL_SWEEP.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nfull sweep: {summary['ok']}/{summary['total']} ok -> FULL_SWEEP.json")
    if r.returncode != 0 or (summary["failed"] or 0) > 0 or summary["ok"] is None:
        print("FULL SWEEP RED — fix before closing the round", file=sys.stderr)
        return 1
    return 0


def main(argv: list[str]) -> int:
    changed = [a for a in argv if not a.startswith("-")]
    run_all = "--all" in argv

    print("== 1/3 refresh registry manifest ==", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "update_registry_manifest.py")],
        cwd=REPO,
    )
    if r.returncode != 0:
        print("manifest refresh FAILED", file=sys.stderr)
        return r.returncode

    print("== 2/3 registry ordering contract ==", flush=True)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_registry_order.py", "-q"],
        cwd=REPO,
    )
    if r.returncode != 0:
        print(
            "ordering contract RED: a changed query is parked past the "
            "first-50 window (the refresh cannot green it — rotate the "
            "query into the window in registry.py, then rerun this tool)",
            file=sys.stderr,
        )
        return r.returncode

    print("== 3/3 tri-SF verify (run these, not during a bench) ==", flush=True)
    if changed:
        for sf in SFS:
            print(
                "SPARK_GRAFT_VERIFY_SF_DIR={} python tools/verify_local.py {}".format(
                    sf, " ".join(changed)
                )
            )
    else:
        print(
            "(no changed queries named — pass them as arguments to print "
            "the three verify commands; CLAUDE.md requires all three SFs)"
        )
    if run_all:
        rc = full_sweep()
        if rc != 0:
            return rc
    print("round_close: manifest + ordering green" + (" + full sweep" if run_all else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

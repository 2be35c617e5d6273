"""Record the driver-sample-window state of the query registry.

Writes tests/registry_manifest.json: name → md5(fn source ‖ oracle SQL),
but ONLY entries currently inside the first-50 sample window are
refreshed — out-of-window entries keep their previously recorded hash.
That asymmetry is the whole mechanism: a query changed while sitting
past the window keeps mismatching its manifest entry no matter how often
this tool runs, so `tests/test_registry_order.py` stays red until the
query is rotated into the window (CLAUDE.md ordering contract).

Run after every registry rotation: python tools/update_registry_manifest.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
MANIFEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "registry_manifest.json",
)


def main() -> int:
    from scripts_toolkit_spark.contract import registry_fingerprints

    fps = registry_fingerprints()
    old: dict[str, str] = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            old = json.load(f)
    new = {
        name: (h if i < WINDOW else old.get(name, h if name not in old else old[name]))
        for i, (name, h) in enumerate(fps.items())
    }
    # entries never recorded before (fresh manifest) take their current
    # hash regardless of position — the guard starts enforcing from the
    # NEXT change
    with open(MANIFEST, "w") as f:
        json.dump(new, f, indent=1)
        f.write("\n")
    refreshed = [n for i, n in enumerate(fps) if i < WINDOW]
    print(f"recorded {len(new)} entries ({len(refreshed)} in-window refreshed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

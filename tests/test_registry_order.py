"""ORDERING-CONTRACT guard (round-4 verdict Next #4).

The driver's correctness gate samples the FIRST 50 registered queries.
The repo rule (CLAUDE.md): every query NEW or MATERIALLY CHANGED in the
current round must sit inside that window so it receives a hard external
correctness row. Round 4 shipped two queries past the window; this test
makes that mistake mechanically impossible to repeat:

- `tests/registry_manifest.json` records md5(fn source ‖ oracle SQL)
  per query, refreshed ONLY for in-window entries by
  `tools/update_registry_manifest.py`;
- a query whose current fingerprint differs from its manifest entry (or
  that has no entry) is "new/changed since last recorded" and must be
  at position < 50;
- in-window entries must match the manifest exactly, which forces the
  manifest regeneration step after every rotation — so the committed
  manifest always reflects what the driver will actually sample.

Known limitation (documented in `registry_fingerprints`): the hash
covers the registered function + oracle string, not library helpers it
calls — rotating callers of a changed ext/ helper stays a judgment call.
"""

from __future__ import annotations

import json
import os

from scripts_toolkit_spark.contract import registry_fingerprints

WINDOW = 50
MANIFEST = os.path.join(os.path.dirname(__file__), "registry_manifest.json")


def _manifest() -> dict[str, str]:
    assert os.path.exists(MANIFEST), (
        "tests/registry_manifest.json missing - run "
        "`python tools/update_registry_manifest.py`"
    )
    with open(MANIFEST) as f:
        return json.load(f)


def test_new_or_changed_queries_inside_sample_window():
    fps = registry_fingerprints()
    manifest = _manifest()
    violations = [
        (i, name)
        for i, (name, h) in enumerate(fps.items())
        if i >= WINDOW and manifest.get(name) != h
    ]
    assert not violations, (
        "queries new/changed since the last recorded rotation sit PAST the "
        f"driver's {WINDOW}-query sample window: {violations}. Rotate them "
        "into the leading tier of scripts_toolkit_spark/registry.py, then "
        "run `python tools/update_registry_manifest.py`."
    )


def test_manifest_reflects_current_window():
    """In-window entries must match the manifest bit-for-bit — this is
    what forces `tools/update_registry_manifest.py` to run after every
    rotation, so the recorded hashes always describe the exact code the
    driver samples."""
    fps = registry_fingerprints()
    manifest = _manifest()
    stale = [
        name
        for i, (name, h) in enumerate(fps.items())
        if i < WINDOW and manifest.get(name) != h
    ]
    assert not stale, (
        f"manifest out of date for in-window queries {stale}; run "
        "`python tools/update_registry_manifest.py`"
    )

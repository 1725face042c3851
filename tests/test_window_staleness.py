"""Mechanized stale-green detection (VERDICT r11 ask #2).

The driver's correctness harness certifies the FIRST 50 entries of
``queries()`` each round.  Twice (r10, r11) a plan/oracle changed after
the window froze and shipped with a stale green, caught only by a judge
reading diffs.  This test makes that class of bug a red suite instead:

- ``plans/_query_hashes.json`` snapshots sha256(plan source + oracle)
  per query, regenerated ONLY at window rotation via
  ``python tools/window_manifest.py --write``;
- any query whose live hash differs from the manifest — or that was
  registered after the snapshot — MUST sit inside the driver window so
  it re-earns its green the same round it changed;
- a manifest entry for a query that no longer exists means a rename or
  delete happened without re-snapshotting; the new name is already
  forced in-window by the "new" rule, and the stale key must be cleaned
  up at the next rotation.

No SparkSession needed: hashes cover source text and the materialized
oracle strings, both available at import time.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import window_manifest  # noqa: E402


def test_manifest_exists_and_covers_registry():
    manifest = window_manifest.load_manifest()
    assert manifest, (
        "plans/_query_hashes.json missing or empty — regenerate with "
        "`python tools/window_manifest.py --write` at window rotation"
    )
    live = window_manifest.live_hashes()
    # Every registered query must have a manifest entry OR be in-window
    # (the "new this round" case, asserted below); a mostly-empty
    # manifest would quietly disable the whole mechanism.
    assert len(manifest) >= 0.9 * len(live)


def test_changed_queries_sit_in_driver_window():
    live = window_manifest.live_hashes()
    manifest = window_manifest.load_manifest()
    changed, new, removed = window_manifest.diff(live, manifest)
    window = set(window_manifest.window_names())

    stale = [n for n in changed if n not in window]
    assert not stale, (
        f"plan/oracle changed since the manifest snapshot but NOT in the "
        f"driver window (first {window_manifest.WINDOW_SIZE} of queries()): "
        f"{stale}. Add them to _DRIVER_PRIORITY's head so the green is "
        f"re-earned this round, then they rotate out next rotation."
    )

    lagged = [n for n in new if n not in window]
    assert not lagged, (
        f"queries registered after the manifest snapshot but NOT in the "
        f"driver window: {lagged}. The r8 no-lag rule: anything registered "
        f"this round sits inside the window."
    )

    # Renames/deletes leave a dangling manifest key; the rename's new name
    # is forced in-window above.  Cap the drift so the manifest cannot rot.
    assert len(removed) <= 5, (
        f"{len(removed)} manifest entries no longer exist in the registry "
        f"({removed[:8]}...): re-snapshot at rotation."
    )

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
    self_changed, deep_changed, new, removed = window_manifest.diff(live, manifest)
    window = set(window_manifest.window_names())

    stale = [n for n in self_changed if n not in window]
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

    # Helper-only changes (the plan calls a package function whose source
    # changed, e.g. the r12 LSH-cap edit to similarity.lsh_ann_topk that
    # never touched the registered ann_lsh_top5 body): window it, or
    # acknowledge it by name + reason in plans._DEEP_CHANGE_ACK — a broad
    # helper refactor can flag more queries than one window holds, and
    # the ack is an explicit diffable record instead of a silent miss.
    ack = window_manifest.deep_change_ack()
    unacked = [n for n in deep_changed if n not in window and n not in ack]
    assert not unacked, (
        f"shared-helper change reaches these queries' plans but they are "
        f"neither in the driver window nor acknowledged in "
        f"plans._DEEP_CHANGE_ACK: {unacked}"
    )
    for name, reason in ack.items():
        assert isinstance(reason, str) and len(reason) >= 20, (
            f"_DEEP_CHANGE_ACK[{name!r}] needs a real reason string"
        )

    # Renames/deletes leave a dangling manifest key; the rename's new name
    # is forced in-window above.  Cap the drift so the manifest cannot rot.
    assert len(removed) <= 5, (
        f"{len(removed)} manifest entries no longer exist in the registry "
        f"({removed[:8]}...): re-snapshot at rotation."
    )

"""Per-query source-hash manifest for mechanized stale-green detection.

Twice (r10: q5_local_supplier_volume / events_sliding_rollup; r11:
events_path_trigrams) a query's plan or oracle changed after its driver
window froze, leaving a "green" CORRECTNESS row that no longer certifies
the shipped code.  Both catches came from a judge reading diffs; this
tool mechanizes the rule (VERDICT r11 ask #2).

Model
-----
``neo4j_enterprise_spark/plans/_query_hashes.json`` snapshots, for every
registered query, ``sha256(plan-function source + oracle SQL)``.  The
manifest is regenerated ONLY at window-rotation time (the start of a
round, right after ``_DRIVER_PRIORITY`` is rewritten for the new window).
``tests/test_window_staleness.py`` then asserts that every query whose
live hash differs from the manifest — or that is absent from it — sits
inside the driver window (the first 50 entries of ``queries()`` order).
Any in-round plan/oracle edit therefore turns the suite red until the
query is added to the window, which is exactly the standing rule the
hand-maintained registry comment kept getting wrong.

``--write`` refuses to run while a changed query is missing from the
window: you cannot accidentally launder a pending change out of the
mechanism by re-snapshotting mid-round.  ``--force`` overrides (only
sane immediately after a driver round has re-earned the greens).

Known limitation (documented, accepted): the hash covers the registered
function's own source (decorator included) and the materialized oracle
string.  A behavior change hidden entirely inside a *shared helper* that
the plan calls is not caught on the plan side — but oracle-side helpers
ARE caught because the oracle is hashed post-interpolation, and both
r10/r11 incidents were in-body edits that this hash catches.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MANIFEST_PATH = REPO / "neo4j_enterprise_spark" / "plans" / "_query_hashes.json"
WINDOW_SIZE = 50  # the driver checks the first 50 entries of queries()


def query_hash(query) -> str:
    """sha256 over the registered plan function's source + oracle SQL.

    ``inspect.getsource`` includes the ``@register(...)`` decorator call,
    so oracle edits made inline in the decorator are covered twice
    (source text and materialized string) — harmless.
    """
    try:
        src = inspect.getsource(query.spark)
    except (OSError, TypeError):  # e.g. a lambda defined in a REPL
        src = repr(query.spark)
    oracle = query.oracle if query.oracle is not None else "<rows-only>"
    h = hashlib.sha256()
    h.update(src.encode("utf-8"))
    h.update(b"\x00--oracle--\x00")
    h.update(oracle.encode("utf-8"))
    return h.hexdigest()


def live_hashes() -> dict[str, str]:
    sys.path.insert(0, str(REPO))
    from neo4j_enterprise_spark.plans import all_queries

    return {name: query_hash(q) for name, q in all_queries().items()}


def load_manifest() -> dict[str, str]:
    if not MANIFEST_PATH.exists():
        return {}
    return json.loads(MANIFEST_PATH.read_text())


def diff(live: dict[str, str], manifest: dict[str, str]):
    """Returns (changed, new, removed) name lists, each sorted."""
    changed = sorted(
        n for n, h in live.items() if n in manifest and manifest[n] != h
    )
    new = sorted(n for n in live if n not in manifest)
    removed = sorted(n for n in manifest if n not in live)
    return changed, new, removed


def window_names() -> list[str]:
    from neo4j_enterprise_spark.plans import all_queries

    return list(all_queries())[:WINDOW_SIZE]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--write", action="store_true", help="regenerate the manifest")
    ap.add_argument(
        "--force",
        action="store_true",
        help="write even if changed queries are outside the window",
    )
    args = ap.parse_args()

    live = live_hashes()
    manifest = load_manifest()
    changed, new, removed = diff(live, manifest)
    window = set(window_names())

    out_of_window = [n for n in changed + new if n not in window]
    for label, names in (("changed", changed), ("new", new), ("removed", removed)):
        for n in names:
            mark = "" if n in window or label == "removed" else "  <-- NOT IN WINDOW"
            print(f"{label:8s} {n}{mark}")
    if not (changed or new or removed):
        print(f"manifest in sync: {len(live)} queries, no drift")

    if args.write:
        if out_of_window and not args.force:
            print(
                f"\nREFUSING to write: {len(out_of_window)} changed/new "
                f"queries are outside the driver window ({out_of_window}). "
                "Add them to _DRIVER_PRIORITY first (or --force)."
            )
            return 1
        MANIFEST_PATH.write_text(
            json.dumps(dict(sorted(live.items())), indent=1) + "\n"
        )
        print(f"\nwrote {MANIFEST_PATH} ({len(live)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

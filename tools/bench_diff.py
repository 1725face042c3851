#!/usr/bin/env python
"""Per-query regression diff between two bench JSON files.

Usage: python tools/bench_diff.py BENCH_r02.json BENCH_r03.json
Prints queries sorted by ratio (new/old), flagging >1.25x regressions —
run after perf work or before a round ends to catch accidental
slowdowns the totals hide.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    # driver-recorded files wrap the metric line; accept both shapes
    if "queries" not in d and "tail" in d:
        d = json.loads("{" + d["tail"].rsplit("{", 1)[-1]) if False else d
    return d.get("queries", {})


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    rows = []
    for name in sorted(set(old) | set(new)):
        a, b = old.get(name), new.get(name)
        if a and b:
            rows.append((b / a, name, a, b))
        else:
            print(f"  only-in-{'new' if b else 'old'}: {name}")
    rows.sort(reverse=True)
    for r, name, a, b in rows:
        flag = "  <-- REGRESSION" if r > 1.25 else ""
        print(f"{name:40s} {a:7.2f}s -> {b:7.2f}s  ({r:.2f}x){flag}")
    ta, tb = sum(r[2] for r in rows), sum(r[3] for r in rows)
    print(f"TOTAL (shared queries) {ta:.2f}s -> {tb:.2f}s ({tb / ta:.2f}x)")


if __name__ == "__main__":
    main()

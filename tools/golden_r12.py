#!/usr/bin/env python
"""Capture (or compare) golden outputs for queries touched by r12
optimizations: rows collected, canonically sorted, dumped as JSON.

Usage:
  python tools/golden_r12.py capture <out.json> <sf_dir> <name> [name...]
  python tools/golden_r12.py compare <golden.json> <sf_dir>

``compare`` re-runs every query in the file and fails loudly on any
row-set or schema difference — the proof that a physical-plan
optimization did not change what the query computes.
"""

from __future__ import annotations

import json
import math
import sys

from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark


def _canon(v):
    if isinstance(v, float):
        # repr round-trips doubles exactly; NaN normalized
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (list, tuple)):
        return [_canon(x) for x in v]
    return v


def _rows(df):
    cols = df.columns
    rows = sorted(
        [[_canon(r[c]) for c in cols] for r in df.collect()],
        key=lambda r: json.dumps(r, default=str),
    )
    return {"schema": [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields], "rows": rows}


def main() -> None:
    mode, path, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    qs = all_queries()
    spark = get_spark("golden-r12")
    if mode == "capture":
        names = sys.argv[4:]
        out = {}
        for name in names:
            out[name] = _rows(qs[name].spark(spark, sf_dir))
            print(f"captured {name}: {len(out[name]['rows'])} rows")
        with open(path, "w") as f:
            json.dump(out, f)
    else:
        golden = json.load(open(path))
        failed = []
        for name, want in golden.items():
            got = _rows(qs[name].spark(spark, sf_dir))
            if got != want:
                failed.append(name)
                print(f"MISMATCH {name}: schema/rows differ "
                      f"(want {len(want['rows'])} rows, got {len(got['rows'])})")
            else:
                print(f"OK {name}: {len(got['rows'])} rows identical")
        if failed:
            sys.exit(f"golden mismatch: {failed}")
    spark.stop()


if __name__ == "__main__":
    main()

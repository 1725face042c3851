#!/usr/bin/env python
"""Dump FULL ``explain("formatted")`` output for bench queries (and any
extra names passed) into plans/r13/<query>_<tag>.txt — the round-13
optimization evidence files (OPTIMIZATION_r13.md cites them).

Usage: python tools/explain_r13.py <tag> [sf_dir] [name ...]
  tag: 'before' or 'after'
  sf_dir: default /root/testdata/sf0.1
  name...: optional subset; default = all bench queries
"""

from __future__ import annotations

import io
import os
import sys

from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    qs = all_queries()
    if not names:
        names = sorted(n for n, q in qs.items() if q.bench)
    os.makedirs("plans/r13", exist_ok=True)
    spark = get_spark("explain-r13")
    for name in names:
        df = qs[name].spark(spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = f"plans/r13/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} [{tag}]\n\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

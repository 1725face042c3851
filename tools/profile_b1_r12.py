#!/usr/bin/env python
"""r12: time each b1 check family on the 100k fixture exactly the way
bench.py does (warmup count, then median-of-3 counts), and print the
join strategies each family's plan picks. Isolates where the 5.6 s
graph_validation_suite_100k wall goes.

Usage: PYTHONPATH=. python tools/profile_b1_r12.py [node_count]
"""

from __future__ import annotations

import re
import sys
import time

from neo4j_enterprise_spark.graph.generator import fixture_graph
from neo4j_enterprise_spark.operators import record_checks as rc
from neo4j_enterprise_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("profile-b1-r12")
    t0 = time.perf_counter()
    g = fixture_graph(spark, node_count=n)
    print(f"fixture built+persisted in {time.perf_counter()-t0:.1f}s (un-timed)")
    fams = rc.check_families(g)
    for fam, df in fams.items():
        df.count()  # warmup like bench.py
    total = 0.0
    for fam, df in fams.items():
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.count()
            samples.append(time.perf_counter() - t0)
        dt = sorted(samples)[1]
        total += dt
        joins = re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)"
            r"\s+(\w+)",
            _explain(df),
        )
        from collections import Counter

        print(
            f"{fam}: median {dt:.3f}s {[round(s,3) for s in samples]}  "
            f"joins={dict(Counter('%s/%s' % j for j in joins))}"
        )
    print(f"TOTAL {total:.3f}s")
    spark.stop()


def _explain(df) -> str:
    import io
    import sys as _sys

    buf = io.StringIO()
    old, _sys.stdout = _sys.stdout, buf
    try:
        df.explain("formatted")
    finally:
        _sys.stdout = old
    return buf.getvalue()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness: runs the headline declared queries and prints one
JSON line ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Scale dir from ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
cores from ``$SPARK_GRAFT_CPUS`` (default 32). Each query is fully
materialized via a count-style action (collect on bounded outputs).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    queries = {n: q for n, q in all_queries().items() if q.bench}
    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        n = df.count()  # full materialization
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

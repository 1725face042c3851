#!/usr/bin/env python
"""Steady-state timer for r12 A/B work: median of N noop-sink runs per
query (guide §1.4 — times the computation, not the collect), steal
samples discarded, one un-timed warm pass first.

Usage: PYTHONPATH=. python tools/time_r12.py <sf_dir> <runs> <name> [name...]
"""

from __future__ import annotations

import sys
import time

from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark


def _steal() -> float:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / 100.0
    except (OSError, IndexError, ValueError):
        return 0.0


def main() -> None:
    sf_dir, runs = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    qs = all_queries()
    spark = get_spark("time-r12")
    from neo4j_enterprise_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    for name in names:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        attempts = 0
        while len(samples) < runs and attempts < 3 * runs:
            attempts += 1
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"timed:{name}")
            st0 = _steal()
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if _steal() - st0 > max(1.0, 0.3 * dt):
                continue
            samples.append(dt)
        samples.sort()
        med = samples[len(samples) // 2] if samples else float("nan")
        print(f"{name}: median {med:.3f}s  samples {[round(s,3) for s in samples]}")
    spark.stop()


if __name__ == "__main__":
    main()

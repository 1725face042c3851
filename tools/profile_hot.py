#!/usr/bin/env python
"""A/B profiler for the bench hot spots (q18/q10/q13/q3).

Times each query steady-state (median of N runs after warmup) under
config variants: AQE on/off, shuffle partitions, decimal vs double.
Usage: python tools/profile_hot.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark

HOT = [
    "q18_large_volume_customers",
    "q10_returned_items",
    "q13_customer_distribution",
    "q3_shipping_priority",
    "events_hourly_rollup",
    "q1_pricing_summary",
]


def time_query(spark, q, sf_dir, runs=3):
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return min(samples), statistics.median(samples)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qs = all_queries()
    spark = get_spark("profile")
    from neo4j_enterprise_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    variants = {
        "baseline(aqe=on,sp=32)": {},
        "aqe=off": {"spark.sql.adaptive.enabled": "false"},
        "sp=8": {"spark.sql.shuffle.partitions": "8"},
        "aqe=off,sp=8": {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    }
    results = {}
    for vname, confs in variants.items():
        saved = {}
        for k, v in confs.items():
            saved[k] = spark.conf.get(k)
            spark.conf.set(k, v)
        for name in HOT:
            q = qs[name]
            # warmup for this variant
            q.spark(spark, sf_dir).count()
            best, med = time_query(spark, q, sf_dir)
            results.setdefault(name, {})[vname] = (round(best, 3), round(med, 3))
            print(f"{vname:24s} {name:32s} best={best:.3f} med={med:.3f}", flush=True)
        for k, v in saved.items():
            spark.conf.set(k, v)
    print("\nSummary (best):")
    for name, r in results.items():
        row = " ".join(f"{v}={t[0]}" for v, t in r.items())
        print(f"  {name}: {row}")
    spark.stop()


if __name__ == "__main__":
    main()

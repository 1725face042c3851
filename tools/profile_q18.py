#!/usr/bin/env python
"""Deep-dive on q18 variance: 10 runs, per-run wall clock, under
targeted conf toggles."""

from __future__ import annotations

import sys
import time

from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    q = all_queries()["q18_large_volume_customers"]
    spark = get_spark("q18prof")
    from neo4j_enterprise_spark.catalog import load_table

    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).count()

    toggles = {
        "base": {},
        "no-skewjoin": {"spark.sql.adaptive.skewJoin.enabled": "false"},
        "no-localreader": {
            "spark.sql.adaptive.localShuffleReader.enabled": "false"
        },
        "bigger-advisory": {
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m"
        },
        "no-aqe": {"spark.sql.adaptive.enabled": "false"},
    }
    for name, confs in toggles.items():
        saved = {}
        for k, v in confs.items():
            saved[k] = spark.conf.get(k)
            spark.conf.set(k, v)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name:18s} {times}", flush=True)
        for k, v in saved.items():
            spark.conf.set(k, v)
    spark.stop()


if __name__ == "__main__":
    main()

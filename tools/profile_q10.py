#!/usr/bin/env python
"""q10 deep-dive under the new session confs."""

from __future__ import annotations

import sys
import time

from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qs = all_queries()
    spark = get_spark("q10prof")
    from neo4j_enterprise_spark.catalog import load_table

    for t in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf_dir, t).count()

    toggles = {
        "base(advisory=128m)": {},
        "advisory=64m": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m"},
        "advisory=16m": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"},
        "no-aqe": {"spark.sql.adaptive.enabled": "false"},
    }
    for qname in ("q10_returned_items", "q13_customer_distribution"):
        q = qs[qname]
        for name, confs in toggles.items():
            saved = {}
            for k, v in confs.items():
                saved[k] = spark.conf.get(k)
                spark.conf.set(k, v)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                q.spark(spark, sf_dir).count()
                times.append(round(time.perf_counter() - t0, 3))
            print(f"{qname:28s} {name:22s} {times}", flush=True)
            for k, v in saved.items():
                spark.conf.set(k, v)
    spark.stop()


if __name__ == "__main__":
    main()

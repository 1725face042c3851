#!/usr/bin/env python
"""First recorded rows/schema evidence for the rows-only registry queries
that have never had a driver row (VERDICT r10 ask #5 — they produce
float/HLL/engine-specific outputs so they carry no SQL oracle, but their
row counts and schemas are deterministic and recordable).

Runs each at sf0.01 (the driver's correctness SF) and prints one line
per query: name, row count, schema. Output is pasted into COVERAGE.md
as a disclosed-local record.

Usage: PYTHONPATH=. python tools/rows_only_evidence.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark

DEFAULT_NAMES = [
    "ann_ivf_top5",
    "ann_pq_top5",
    "ann_ivf_pq_top5",
    "docs_bpe_merges",
    "docs_simhash",
    "docs_minhash_lsh_candidates",
    "events_approx_stats",
    "events_distinct_sketch_merge",
    "graph_betweenness_sampled",
    "graph_coloring_luby",
    "graph_hyperball_reach",
    "graph_personalized_pagerank",
    "media_feature_neighbors",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_NAMES
    spark = get_spark("rows-only-evidence")
    qs = all_queries()
    print(f"# rows-only evidence  sf_dir={sf_dir}")
    print("| query | rows | schema |")
    print("|---|---|---|")
    for n in names:
        q = qs[n]
        try:
            df = q.spark(spark, sf_dir)
            rows = df.count()
            print(f"| {n} | {rows} | `{df.schema.simpleString()}` |", flush=True)
        except Exception as exc:  # noqa: BLE001 — record the failure row
            print(f"| {n} | ERROR | `{exc!r}` |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""B1 canonical-scale measurement: build the reference-shaped fixture at
N nodes (3 rels + 4 props per node — N=10M reproduces the reference's
canonical 10M-node/30M-rel ConsistencyPerformanceCheck.java:76-87 store)
and time the full per-family check suite, reporting the reference's
per-store recordsPerSecond.

Usage: python tools/b1_scale.py [node_count]
Generation is un-timed (store build is separate from the timed FullCheck
in the reference too); each family is timed on a single COLD pass — at
canonical scale the volume dominates, so JIT warmup noise is already
amortized (the 100k bench phase keeps the warmed-median methodology).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from neo4j_enterprise_spark.graph.generator import fixture_graph
from neo4j_enterprise_spark.operators import record_checks as rc
from neo4j_enterprise_spark.session import get_spark


def main(n: int) -> None:
    spark = get_spark("b1-scale")
    t0 = time.perf_counter()
    g = fixture_graph(spark, node_count=n)
    counts = rc.family_element_counts(g)
    gen_s = time.perf_counter() - t0
    total_rec = sum(counts.values())
    print(f"# fixture: {n} nodes, {total_rec} records, built+counted in {gen_s:.1f}s")
    total = 0.0
    for fam, df in rc.check_families(g).items():
        t0 = time.perf_counter()
        df.count()
        dt = time.perf_counter() - t0
        total += dt
        rps = round(counts[fam] / dt) if dt > 0 else 0
        print(f"b1_check_{fam}: {counts[fam]} records in {dt:.2f}s = {rps}/s")
    print(f"TOTAL: {total_rec} records in {total:.1f}s = {round(total_rec / total)}/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)

#!/usr/bin/env python
"""r13 b1 A/B: {r12 branches, r13 fused} x {stock 32-part fixture,
size-derived fixture} — interleaved same-session medians per family,
plus a full row-compare of old vs new on the corrupted checker fixture.

Usage: PYTHONPATH=. python tools/ab_b1_r13.py [runs] [node_count]
"""

from __future__ import annotations

import sys
import time

from neo4j_enterprise_spark.graph.generator import generate_graph
from neo4j_enterprise_spark.graph.model import PropertyGraph
from neo4j_enterprise_spark.operators import _rc_r12_frozen as rc_old
from neo4j_enterprise_spark.operators import record_checks as rc_new
from neo4j_enterprise_spark.plans.checker import fixture_graph as corrupted_fixture
from neo4j_enterprise_spark.session import get_spark


def _steal() -> float:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / 100.0
    except (OSError, IndexError, ValueError):
        return 0.0


def _median(spark, df, runs):
    df.count()  # warm
    samples = []
    attempts = 0
    while len(samples) < runs and attempts < 3 * runs:
        attempts += 1
        spark.sparkContext._jvm.System.gc()
        st0 = _steal()
        t0 = time.perf_counter()
        df.count()
        dt = time.perf_counter() - t0
        if _steal() - st0 > max(1.0, 0.3 * dt):
            continue
        samples.append(dt)
    samples.sort()
    return samples[len(samples) // 2] if samples else float("nan"), samples


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    node_count = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("ab-b1-r13")

    # --- row-identity: old vs new on the CORRUPTED fixture --------------
    gc = corrupted_fixture(spark)
    fams_old_c = rc_old.check_families(gc)
    fams_new_c = rc_new.check_families(gc)
    print("== row-compare on corrupted checker fixture ==")
    for fam in fams_old_c:
        a, b = fams_old_c[fam], fams_new_c[fam]
        only_old = a.exceptAll(b).count()
        only_new = b.exceptAll(a).count()
        n = a.count()
        status = "IDENTICAL" if only_old == only_new == 0 else "DIVERGED"
        print(f"  {fam}: {n} rows, old-only={only_old}, new-only={only_new} -> {status}")
        assert only_old == 0 and only_new == 0, f"{fam} diverged"

    # --- fixtures: stock (r12 layout) vs sized (r13 fixture_graph) ------
    stock = generate_graph(spark, node_count=node_count).persist()
    for df in stock.tables().values():
        df.count()
    from neo4j_enterprise_spark.graph.generator import fixture_graph

    sized = fixture_graph(spark, node_count=node_count)
    print("== partition counts ==")
    for name in ("nodes", "relationships", "properties"):
        print(
            f"  {name}: stock {stock.tables()[name].rdd.getNumPartitions()}"
            f" -> sized {sized.tables()[name].rdd.getNumPartitions()}"
        )

    cells = {
        "old/stock": rc_old.check_families(stock),
        "new/stock": rc_new.check_families(stock),
        "old/sized": rc_old.check_families(sized),
        "new/sized": rc_new.check_families(sized),
    }
    totals = dict.fromkeys(cells, 0.0)
    fams = list(next(iter(cells.values())).keys())
    print(f"== timings (median of {runs}, interleaved per family) ==")
    for fam in fams:
        line = [f"  {fam}:"]
        for cell, f in cells.items():
            spark.sparkContext.setJobDescription(f"{cell}:{fam}")
            med, samples = _median(spark, f[fam], runs)
            totals[cell] += med
            line.append(f"{cell}={med:.3f}")
        print(" ".join(line))
    print("== totals ==")
    for cell, t in totals.items():
        print(f"  {cell}: {t:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

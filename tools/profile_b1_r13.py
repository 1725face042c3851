#!/usr/bin/env python
"""r13 b1-family profiler: where do the 7.7-9.6 bench seconds go?

Modes (positional arg):
  time       — median-of-N count() per family on the memoized 100k fixture
               (the exact bench measurement), plus partition/task counts.
  plans      — explain('formatted') per family -> plans/r13/b1_<fam>_{tag}.txt
  parts      — same fixture data persisted at size-derived partition counts
               (interleaved A/B vs the stock 32-partition layout).

Usage: PYTHONPATH=. python tools/profile_b1_r13.py time [runs] [node_count]
"""

from __future__ import annotations

import io
import sys
import time

from pyspark.sql import functions as F

from neo4j_enterprise_spark.graph.generator import fixture_graph, generate_graph
from neo4j_enterprise_spark.graph.model import PropertyGraph
from neo4j_enterprise_spark.operators import record_checks as rc
from neo4j_enterprise_spark.session import get_spark


def _steal() -> float:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / 100.0
    except (OSError, IndexError, ValueError):
        return 0.0


def _median_time(spark, df, runs=5, label=""):
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
    med = samples[len(samples) // 2] if samples else float("nan")
    print(f"  {label}: {med:.3f}s (samples {[round(s,3) for s in samples]})")
    return med


def _explain_str(df) -> str:
    buf = io.StringIO()
    stdout, sys.stdout = sys.stdout, buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    return buf.getvalue()


def repartitioned(spark, node_count: int, rows_per_part: int) -> PropertyGraph:
    """The fixture re-persisted at size-derived partition counts."""
    par = spark.sparkContext.defaultParallelism
    g = generate_graph(spark, node_count=node_count)

    def _n(rows):
        return max(1, min(par, -(-rows // rows_per_part)))

    sized = PropertyGraph(
        nodes=g.nodes.repartition(_n(node_count), "id").persist(),
        relationships=g.relationships.repartition(_n(node_count * 3), "id").persist(),
        properties=g.properties.repartition(_n(node_count * 4), "id").persist(),
        relationship_types=g.relationship_types.persist(),
        property_keys=g.property_keys.persist(),
        graph_props=g.graph_props.persist(),
    )
    for df in sized.tables().values():
        df.count()
    return sized


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    node_count = (
        int(sys.argv[3])
        if len(sys.argv) > 3 and sys.argv[3].isdigit()
        else 100_000
    )
    spark = get_spark("profile-b1-r13")

    if mode == "time":
        g = fixture_graph(spark, node_count=node_count)
        for name, df in g.tables().items():
            print(f"{name}: {df.rdd.getNumPartitions()} partitions")
        total = 0.0
        for fam, df in rc.check_families(g).items():
            spark.sparkContext.setJobDescription(f"b1:{fam}")
            total += _median_time(spark, df, runs, fam)
        print(f"TOTAL: {total:.3f}s")

    elif mode == "plans":
        tag = sys.argv[3] if len(sys.argv) > 3 else "before"
        g = fixture_graph(spark, node_count=node_count)
        for fam, df in rc.check_families(g).items():
            txt = _explain_str(df)
            path = f"plans/r13/b1_{fam}_{tag}.txt"
            with open(path, "w") as f:
                f.write(f"# b1_check_{fam} — explain('formatted'), 100k fixture [{tag}]\n\n")
                f.write(txt)
            import re

            n_ex = len(re.findall(r"\bExchange\b", txt))
            n_j = len(
                re.findall(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", txt)
            )
            print(f"{fam}: {len(txt.splitlines())} lines, {n_ex} Exchange, {n_j} joins -> {path}")

    elif mode == "parts":
        rows_per_part = int(sys.argv[3]) if len(sys.argv) > 3 else 250_000
        print("== stock fixture (generator defaults) ==")
        g0 = fixture_graph(spark, node_count=node_count)
        fams0 = rc.check_families(g0)
        print("== size-derived fixture ==")
        g1 = repartitioned(spark, node_count, rows_per_part)
        for name, df in g1.tables().items():
            print(f"{name}: {df.rdd.getNumPartitions()} partitions")
        fams1 = rc.check_families(g1)
        # interleaved: stock then sized per family
        t0 = t1 = 0.0
        for fam in fams0:
            spark.sparkContext.setJobDescription(f"stock:{fam}")
            t0 += _median_time(spark, fams0[fam], runs, f"stock {fam}")
            spark.sparkContext.setJobDescription(f"sized:{fam}")
            t1 += _median_time(spark, fams1[fam], runs, f"sized {fam}")
        print(f"TOTAL stock {t0:.3f}s vs sized {t1:.3f}s")

    spark.stop()


if __name__ == "__main__":
    main()

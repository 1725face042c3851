#!/usr/bin/env python
"""Component-attribution ladders for the two unattributed sf30 weak rows
(VERDICT r10 ask #6): q13_customer_distribution and cypher_with_having.

Same discipline as the BASELINE §13 q5 ladder: one session, plan rebuilt
every sample, System.gc() between samples, median-of-N, components
materialized with the no-op sink (format("noop") — full execution, no
driver collection cost in the component rows). For cypher_with_having
the derived-graph branch caches (graph/derive._CACHE) are explicitly
dropped and rebuilt so COLD (build) vs WARM (steady-state) walls are
separated — the r10 verdict's open question is whether the derived-graph
rebuild dominates the sf30 wall.

Usage: PYTHONPATH=. python tools/profile_r11.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import tools.compare_duckdb as cdb
from neo4j_enterprise_spark import catalog
from neo4j_enterprise_spark.graph import derive
from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark

from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf30"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cdb.RUNS = runs
    spark = get_spark("profile-r11")
    qs = all_queries()

    def gc_pause():
        spark.sparkContext._jvm.System.gc()

    def med(fn):
        return cdb.median5(fn, pre=gc_pause)

    print(f"# r11 component ladders  sf_dir={sf_dir}  runs={runs}", flush=True)

    # ---------------- q13 ------------------------------------------------
    q13 = qs["q13_customer_distribution"]
    q13.spark(spark, sf_dir).collect()  # warm codegen/listing
    t_full = med(lambda: q13.spark(spark, sf_dir).toPandas())

    def orders_agg():
        o = catalog.load_table(spark, sf_dir, "orders")
        noop(o.groupBy("o_custkey").agg(F.count("*").alias("cnt")))

    def customer_scan():
        c = catalog.load_table(spark, sf_dir, "customer")
        noop(c.select("c_custkey"))

    orders_agg()
    t_oagg = med(orders_agg)
    customer_scan()
    t_cscan = med(customer_scan)
    print(f"q13 full={t_full:.3f}s  orders_groupBy={t_oagg:.3f}s  "
          f"customer_scan={t_cscan:.3f}s  "
          f"join+redist+sort_residual={t_full - t_oagg - t_cscan:.3f}s",
          flush=True)

    # ---------------- cypher_with_having --------------------------------
    cwh = qs["cypher_with_having"]

    def drop_graph_cache():
        for k, df in list(derive._CACHE.items()):
            df.unpersist(True)
        derive._CACHE.clear()

    # COLD: includes building+persisting the PLACED/IN_NATION/nation
    # branch caches (what a fresh compare session pays on first run)
    def cold():
        drop_graph_cache()
        cwh.spark(spark, sf_dir).toPandas()

    cold()
    t_cold = med(cold)

    # WARM: steady-state with branch caches hot (what the sf30 table
    # timed, since compare_duckdb warms once before sampling)
    cwh.spark(spark, sf_dir).collect()
    t_warm = med(lambda: cwh.spark(spark, sf_dir).toPandas())

    # branch materialization alone (cold each sample)
    def placed_only():
        drop_graph_cache()
        noop(derive.derived_rels(spark, sf_dir).filter(F.col("type_name") == "PLACED"))

    placed_only()
    t_placed = med(placed_only)

    def in_nation_only():
        drop_graph_cache()
        noop(
            derive.derived_rels(spark, sf_dir).filter(
                F.col("type_name") == "IN_NATION"
            )
        )

    in_nation_only()
    t_in_nation = med(in_nation_only)

    # WARM heavy-agg component: PLACED groupBy src HAVING >= 12
    drop_graph_cache()
    cwh.spark(spark, sf_dir).collect()  # re-warm caches

    def heavy_agg():
        rels = derive.derived_rels(spark, sf_dir)
        noop(
            rels.filter(F.col("type_name") == "PLACED")
            .groupBy("src")
            .agg(F.count("*").alias("n_orders"))
            .filter(F.col("n_orders") >= 12)
        )

    heavy_agg()
    t_heavy = med(heavy_agg)

    print(f"cypher_with_having cold={t_cold:.3f}s  warm={t_warm:.3f}s  "
          f"placed_build={t_placed:.3f}s  in_nation_build={t_in_nation:.3f}s  "
          f"warm_heavy_agg={t_heavy:.3f}s  "
          f"warm_join_tail={t_warm - t_heavy:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

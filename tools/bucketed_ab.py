#!/usr/bin/env python
"""Bucketed-at-rest A/B for the TPC-H shuffle tail (VERDICT r6 item 4).

q10/q18/q21 are correct-but->2x rows whose residual vs DuckDB is the
orderkey shuffle legs a partitioned engine pays at query time when the
facts are stored as FLAT parquet. The engine already ships bucketed
writers (`sources/sink.write_bucketed`) whose joins are asserted
Exchange-free in tests — this tool measures what that layout buys the
three tail queries end-to-end:

  1. materialize lineitem + orders from the flat sf dir as bucketed,
     bucket-sorted tables (N_BUCKETS BY ORDERKEY — the join/group key
     all three queries shuffle on; 64 = two balanced waves on the
     32-thread rig, and the r10 writer fix gives one file per bucket);
  2. run each query median-of-N steal-clean on the FLAT inputs, then
     again with `catalog.load_table` redirected to the bucketed tables;
  3. print the A/B rows + the Exchange counts of both physical plans,
     markdown-ready for BASELINE.md §10.

Bucket metadata lives in the session's in-memory catalog (no Hive), so
write + measure happen in ONE session — which is also the honest
comparison: identical JVM, identical warmup discipline.

Usage: PYTHONPATH=. python tools/bucketed_ab.py [sf_dir] [runs]
"""

from __future__ import annotations

import shutil
import sys

sys.path.insert(0, ".")

import tools.compare_duckdb as cdb
from neo4j_enterprise_spark import catalog
from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark
from neo4j_enterprise_spark.sources import sink

QUERIES = (
    "q10_returned_items",
    "q18_large_volume_customers",
    "q21_sole_late_supplier",
    # r9: q5's residual after split sums + shuffle_hash is the fact's
    # orderkey exchange — the same layout lever applies
    "q5_local_supplier_volume",
    # r10: q4's only fact join is on orderkey — co-bucketed layout
    # removes both exchanges
    "q4_order_priority",
    # r11: q13's wall is the groupBy(o_custkey) fact aggregation — a
    # CUSTKEY-bucketed orders removes that exchange (BASELINE §14)
    "q13_customer_distribution",
)
BUCKET_SPEC = {
    # table -> (bucket/sort column, registered table name)
    "lineitem": ("l_orderkey", "bkt_lineitem"),
    "orders": ("o_orderkey", "bkt_orders"),
}
# per-query redirects that want a DIFFERENT bucket key than the default
EXTRA_TABLES = {
    # registered table -> (source table, bucket/sort column)
    "bkt_orders_cust": ("orders", "o_custkey"),
}
QUERY_OVERRIDES = {
    "q13_customer_distribution": {"orders": "bkt_orders_cust"},
}
N_BUCKETS = 64


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cdb.RUNS = runs

    spark = get_spark("bucketed-ab")
    qs = all_queries()

    print(f"# bucketed-at-rest A/B  sf_dir={sf_dir}  runs={runs}", flush=True)
    for src, (col, tbl) in BUCKET_SPEC.items():
        # the in-memory catalog forgets tables between runs but the
        # warehouse files survive — clear both before (re)writing
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
        df = catalog.load_table(spark, sf_dir, src)
        sink.write_bucketed(df, tbl, [col], n_buckets=N_BUCKETS, sort_cols=[col])
        print(f"#   {tbl}: {src} bucketed x{N_BUCKETS} by {col}", flush=True)
    for tbl, (src, col) in EXTRA_TABLES.items():
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
        df = catalog.load_table(spark, sf_dir, src)
        sink.write_bucketed(df, tbl, [col], n_buckets=N_BUCKETS, sort_cols=[col])
        print(f"#   {tbl}: {src} bucketed x{N_BUCKETS} by {col}", flush=True)

    flat_load = catalog.load_table
    current_query = {"name": None}

    def bucketed_load(spark, sf_dir_, name):
        override = QUERY_OVERRIDES.get(current_query["name"], {})
        if name in override:
            return spark.table(override[name])
        if name in BUCKET_SPEC:
            return spark.table(BUCKET_SPEC[name][1])
        return flat_load(spark, sf_dir_, name)

    # the plan modules bind `load_table` at import time — patch there
    from neo4j_enterprise_spark.plans import relational

    def gc_pause():
        spark.sparkContext._jvm.System.gc()

    rows = []
    for qname in QUERIES:
        q = qs[qname]
        current_query["name"] = qname
        timings = {}
        plans = {}
        for mode, loader in (("flat", flat_load), ("bucketed", bucketed_load)):
            relational.load_table = loader
            df = q.spark(spark, sf_dir)
            df.collect()  # warm (codegen, bucket file listing)
            # capture the plan AFTER execution: with AQE the pre-collect
            # executedPlan() is only the initial plan — count Exchanges
            # in the FINAL adaptive section (before "== Initial Plan ==")
            plans[mode] = (
                df._jdf.queryExecution().executedPlan().toString()
            ).split("== Initial Plan ==")[0]
            # rebuild the plan EVERY sample: re-collecting one DataFrame
            # object reuses its shuffle map outputs (skipped stages) and
            # times only the final stage — compare_duckdb rebuilds too
            timings[mode] = cdb.median5(
                lambda ld=loader: (
                    setattr(relational, "load_table", ld),
                    q.spark(spark, sf_dir).toPandas(),
                )[1],
                pre=gc_pause,
            )
        relational.load_table = flat_load
        rows.append((qname, timings, plans))
        print(
            f"#   {qname}: flat {timings['flat']:.3f}s "
            f"bucketed {timings['bucketed']:.3f}s "
            f"(exchanges {plans['flat'].count('Exchange')} -> "
            f"{plans['bucketed'].count('Exchange')})",
            flush=True,
        )

    print("\n| query | flat s | bucketed s | speedup | Exchanges flat→bkt |")
    print("|---|---|---|---|---|")
    for qname, t, p in rows:
        sp = t["flat"] / t["bucketed"] if t["bucketed"] else float("inf")
        print(
            f"| {qname} | {t['flat']:.2f} | {t['bucketed']:.2f} | "
            f"{sp:.2f}x | {p['flat'].count('Exchange')}→"
            f"{p['bucketed'].count('Exchange')} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-pass attribution for the TPC-H scan-agg family at sf10
(VERDICT r8 ask #4): q1 / q4 / q5 walls grew ~5-7x on 10x volume
against sub-second DuckDB oracles, so the sf1 "scheduler floor"
explanation no longer covers them. Decompose each query into its
physical passes and time every rung on BOTH engines, so the residual
is attributed to a specific pass (scan, quantize, join, agg) instead
of asserted to be "SIMD".

Rungs (every Spark rung is a complete job, median of N steal-clean):
  q1: scan+filter count  ->  1-col quantized agg  ->  full 8-agg
  q4: orders-slice count ->  li 2-col scan count  ->  join count(*)
      -> full (join + count_distinct)
  q5: li 3-col scan+quantize agg -> +orders join -> +supplier+customer
      -> full 6-way
DuckDB gets the same rungs as SQL so the comparison is pass-by-pass,
not total-by-total.

Usage: PYTHONPATH=. python tools/profile_tpch_sf10.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

import tools.compare_duckdb as cdb
from neo4j_enterprise_spark.catalog import load_table
from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    if len(sys.argv) > 2:
        cdb.RUNS = int(sys.argv[2])
    spark = get_spark("tpch-attr")
    jgc = spark.sparkContext._jvm.System.gc
    qs = all_queries()
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ("lineitem", "orders", "customer", "supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    print(f"# profile_tpch_sf10 sf_dir={sf_dir} runs={cdb.RUNS}", flush=True)

    li = load_table(spark, sf_dir, "lineitem")

    # ------------------------------------------------------------ q1
    filt = F.col("l_shipdate") <= F.lit("1999-12-01").cast("date")
    qq = F.round(F.col("l_quantity") * 100).cast("long")

    def q1_scan():
        li.filter(filt).select("l_returnflag", "l_linestatus").groupBy(
            "l_returnflag", "l_linestatus"
        ).count().collect()

    def q1_one():
        li.filter(filt).groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(qq.cast("decimal(27,0)")).cast("double").alias("s")
        ).collect()

    def q1_full():
        qs["q1_pricing_summary"].spark(spark, sf_dir).collect()

    duck_rungs_q1 = {
        "scan+group count": """
            SELECT l_returnflag, l_linestatus, COUNT(*) FROM lineitem
            WHERE l_shipdate <= DATE '1999-12-01'
            GROUP BY l_returnflag, l_linestatus""",
        "1-col quantized agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)
            FROM lineitem WHERE l_shipdate <= DATE '1999-12-01'
            GROUP BY l_returnflag, l_linestatus""",
        "full": qs["q1_pricing_summary"].oracle,
    }
    spark_rungs_q1 = {
        "scan+group count": q1_scan,
        "1-col quantized agg": q1_one,
        "full": q1_full,
    }

    # ------------------------------------------------------------ q4
    o_slice = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("date"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li2 = li.select("l_orderkey", "l_shipdate")

    def q4_orders():
        o_slice.groupBy("o_orderpriority").count().collect()

    def q4_liscan():
        li2.agg(F.count("*"), F.max("l_shipdate")).collect()

    def q4_join():
        li2.join(
            o_slice,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
        ).groupBy("o_orderpriority").count().collect()

    def q4_full():
        qs["q4_order_priority"].spark(spark, sf_dir).collect()

    duck_rungs_q4 = {
        "orders-slice count": """
            SELECT o_orderpriority, COUNT(*) FROM orders
            WHERE o_orderdate >= DATE '1997-01-01'
              AND o_orderdate < DATE '1997-07-01'
            GROUP BY o_orderpriority""",
        "li 2-col scan": "SELECT COUNT(*), MAX(l_shipdate) FROM lineitem",
        "join count(*)": """
            SELECT o_orderpriority, COUNT(*)
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
            WHERE o.o_orderdate >= DATE '1997-01-01'
              AND o.o_orderdate < DATE '1997-07-01'
            GROUP BY o_orderpriority""",
        "full": qs["q4_order_priority"].oracle,
    }
    spark_rungs_q4 = {
        "orders-slice count": q4_orders,
        "li 2-col scan": q4_liscan,
        "join count(*)": q4_join,
        "full": q4_full,
    }

    # ------------------------------------------------------------ q5
    li5 = li.select(
        "l_orderkey",
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_q"),
    )
    o5 = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c5 = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s5 = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")

    def q5_scan():
        li5.agg(F.sum(F.col("rev_q").cast("decimal(27,0)")).cast("double")).collect()

    def q5_jo():
        li5.join(o5, F.col("l_orderkey") == F.col("o_orderkey")).agg(
            F.sum(F.col("rev_q").cast("decimal(27,0)")).cast("double")
        ).collect()

    def q5_jsc():
        (
            li5.join(o5, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(s5), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(
                c5,
                (F.col("o_custkey") == F.col("c_custkey"))
                & (F.col("c_nationkey") == F.col("s_nationkey")),
            )
            .groupBy("s_nationkey")
            .agg(F.sum(F.col("rev_q").cast("decimal(27,0)")).cast("double"))
            .collect()
        )

    def q5_full():
        qs["q5_local_supplier_volume"].spark(spark, sf_dir).collect()

    duck_rungs_q5 = {
        "li scan+quantize agg": """
            SELECT CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS HUGEINT))
                   AS DOUBLE) FROM lineitem""",
        "+orders join": """
            SELECT CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS HUGEINT))
                   AS DOUBLE)
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate >= DATE '1996-01-01'
              AND o.o_orderdate < DATE '1998-01-01'""",
        "+supp+cust join": """
            SELECT s.s_nationkey,
                   CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS HUGEINT))
                   AS DOUBLE)
            FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN customer c ON o.o_custkey = c.c_custkey
                             AND c.c_nationkey = s.s_nationkey
            WHERE o.o_orderdate >= DATE '1996-01-01'
              AND o.o_orderdate < DATE '1998-01-01'
            GROUP BY s.s_nationkey""",
        "full": qs["q5_local_supplier_volume"].oracle,
    }
    spark_rungs_q5 = {
        "li scan+quantize agg": q5_scan,
        "+orders join": q5_jo,
        "+supp+cust join": q5_jsc,
        "full": q5_full,
    }

    for qname, srungs, drungs in (
        ("q1", spark_rungs_q1, duck_rungs_q1),
        ("q4", spark_rungs_q4, duck_rungs_q4),
        ("q5", spark_rungs_q5, duck_rungs_q5),
    ):
        print(f"\n## {qname}", flush=True)
        print("| rung | spark s | duckdb s | ratio |", flush=True)
        print("|---|---|---|---|", flush=True)
        for label in srungs:
            fn = srungs[label]
            fn()  # warm
            s = cdb.median5(fn, pre=jgc)
            sql = drungs[label]
            con.execute(sql).fetchall()
            d = cdb.median5(lambda: con.execute(sql).fetchall())
            print(
                f"| {label} | {s:.2f} | {d:.3f} | {s / max(d, 1e-9):.1f}x |",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()

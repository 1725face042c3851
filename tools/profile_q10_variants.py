#!/usr/bin/env python
"""q10 variant shoot-out at sf1: where does the 5x-vs-DuckDB residual go?

Variants:
  current      — registered plan (per-order preagg, decimal(27,0), shuffle_hash)
  no_preagg    — join li->orders directly, single groupBy(o_custkey)
  long_sum     — per-order sum in BIGINT (safe: <=7 items/order), decimal only
                 at the customer rollup
  bcast_cust   — current + explicit broadcast(customer)
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from neo4j_enterprise_spark.catalog import load_table
from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark


def rev_q():
    return F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )


def finish(df, c, n):
    return (
        df.join(c, F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            (F.col("rev_cust").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def v_no_preagg(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    joined = li.select("l_orderkey", rev_q().alias("rq")).hint("shuffle_hash").join(
        o, F.col("l_orderkey") == o["o_orderkey"]
    )
    agg = joined.groupBy("o_custkey").agg(
        F.sum(F.col("rq").cast("decimal(27,0)")).alias("rev_cust")
    )
    return finish(agg, c, n)


def v_long_sum(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    per_order = li.groupBy("l_orderkey").agg(F.sum(rev_q()).alias("rev_long"))
    agg = (
        per_order.hint("shuffle_hash")
        .join(o, per_order["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(F.col("rev_long").cast("decimal(27,0)")).alias("rev_cust"))
    )
    return finish(agg, c, n)


def v_bcast_cust(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(rev_q().cast("decimal(27,0)")).alias("rev_dec")
    )
    agg = (
        per_order.hint("shuffle_hash")
        .join(o, per_order["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum("rev_dec").alias("rev_cust"))
    )
    return (
        agg.join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            (F.col("rev_cust").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf1"
    spark = get_spark("q10variants")
    jvm = spark._jvm
    qs = all_queries()
    for t in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf_dir, t).count()
    variants = {
        "current": lambda s, d: qs["q10_returned_items"].spark(s, d),
        "no_preagg": v_no_preagg,
        "long_sum": v_long_sum,
        "bcast_cust": v_bcast_cust,
    }
    ref = None
    for name, fn in variants.items():
        fn(spark, sf_dir).collect()  # warm
        times = []
        for _ in range(7):
            jvm.System.gc()
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        if ref is None:
            ref = rows
        ok = rows == ref
        times.sort()
        print(
            f"{name:12s} med={statistics.median(times):.3f} "
            f"min={times[0]:.3f} max={times[-1]:.3f} match={ok}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

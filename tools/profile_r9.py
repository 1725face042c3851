#!/usr/bin/env python
"""Round-9 sf10 profiles (VERDICT r8 asks #3 and #6).

1. cypher_with_having — the r8 17x row. A/B: the NEW per-type tagged
   derivation (plan-time branch pruning; graph/derive.py) vs the
   RETIRED single-persisted-union form (all five rel types in one
   cache, reconstructed inline as the A/B reference), vs the DuckDB
   oracle. Also prints first-touch materialization cost of each
   derivation (what a cold session pays before the caches are warm).

2. docs_tfidf_keywords — the r8 5.7x row. Variants:
     a. CURRENT: tf groupBy -> df groupBy -> tf JOIN df -> doc window
     b. WINDOW-DF: df as count(*) OVER (PARTITION BY term) on tf
        (drops the separate df aggregate + join — one term shuffle)
     c. BCAST-DF: force broadcast(df) into the join (no term-side
        shuffle of tf; honest only while the vocabulary fits a
        broadcast — printed with the measured vocab size)

Usage: PYTHONPATH=. python tools/profile_r9.py [sf_dir] [runs]
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
from pyspark.sql.window import Window


# ---------------------------------------------------------------- retired
def derived_rels_single_union(spark, sf_dir):
    """The RETIRED pre-r9 derivation: ALL five rel types in ONE
    persisted union (type constants materialized inside the cache, so
    typed filters scan every block) — A/B reference only."""
    from neo4j_enterprise_spark.graph.derive import (
        CONTAINS_OFF, IN_NATION_OFF, IN_REGION_OFF, ORDER_OFF, PART_OFF,
        SUPP_NATION_OFF, SUPP_OFF, NATION_OFF, REGION_OFF,
    )

    placed = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("id"),
        F.col("o_custkey").cast("long").alias("src"),
        (F.col("o_orderkey") + ORDER_OFF).cast("long").alias("dst"),
        F.lit(1).alias("type_id"),
        F.lit("PLACED").alias("type_name"),
    )
    w_dup = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    contains = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("seq", F.row_number().over(w_dup))
        .select(
            (
                (F.col("l_orderkey") * 8 + F.col("l_linenumber")) * 16
                + F.col("seq")
                + CONTAINS_OFF
            ).cast("long").alias("id"),
            (F.col("l_orderkey") + ORDER_OFF).cast("long").alias("src"),
            (F.col("l_partkey") + PART_OFF).cast("long").alias("dst"),
            F.lit(2).alias("type_id"),
            F.lit("CONTAINS").alias("type_name"),
        )
    )
    in_nation = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + IN_NATION_OFF).cast("long").alias("id"),
        F.col("c_custkey").cast("long").alias("src"),
        (F.col("c_nationkey") + NATION_OFF).cast("long").alias("dst"),
        F.lit(3).alias("type_id"),
        F.lit("IN_NATION").alias("type_name"),
    )
    supp_nation = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + SUPP_NATION_OFF).cast("long").alias("id"),
        (F.col("s_suppkey") + SUPP_OFF).cast("long").alias("src"),
        (F.col("s_nationkey") + NATION_OFF).cast("long").alias("dst"),
        F.lit(4).alias("type_id"),
        F.lit("SUPP_NATION").alias("type_name"),
    )
    in_region = load_table(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + IN_REGION_OFF).cast("long").alias("id"),
        (F.col("n_nationkey") + NATION_OFF).cast("long").alias("src"),
        (F.col("n_regionkey") + REGION_OFF).cast("long").alias("dst"),
        F.lit(5).alias("type_id"),
        F.lit("IN_REGION").alias("type_name"),
    )
    return (
        placed.unionByName(contains)
        .unionByName(in_nation)
        .unionByName(supp_nation)
        .unionByName(in_region)
    )


def with_having_over(nodes, rels):
    """cypher_with_having's compiled shape, parameterized by the rels
    frame so both derivations run the identical downstream plan."""
    heavy = (
        rels.filter(F.col("type_name") == "PLACED")
        .groupBy(F.col("src").alias("c"))
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )
    in_nation = rels.filter(F.col("type_name") == "IN_NATION").select(
        F.col("src").alias("c"), F.col("dst").alias("n")
    )
    return (
        heavy.join(in_nation, "c")
        .join(nodes.select(F.col("id").alias("n"), "name"), "n")
        .groupBy(F.col("name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_heavy_customers"),
            F.sum("n_orders").cast("long").alias("total_orders"),
        )
        .orderBy("nation_name")
    )


# ---------------------------------------------------------------- tfidf
def tfidf_base(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.length(F.trim(F.col("text"))) > 0)
    toks = base.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    nd = base.agg(F.count("*").cast("long").alias("n_docs"))
    return tf, nd


def tfidf_topk(scored, top_k=3):
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "term", "tf", "df", "score",
                F.col("rk").cast("long").alias("rk"))
    )


def tfidf_window_df(spark, sf_dir):
    """Variant b: df via an unbounded count window on tf — one term
    shuffle replaces groupBy+join."""
    tf, nd = tfidf_base(spark, sf_dir)
    wdf = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count("*").over(wdf).cast("long"))
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "score", (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
        )
    )
    return tfidf_topk(scored)


def tfidf_bcast_df(spark, sf_dir):
    """Variant c: broadcast the (term, df) vocabulary into the join."""
    tf, nd = tfidf_base(spark, sf_dir)
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "score", (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
        )
    )
    return tfidf_topk(scored)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    if len(sys.argv) > 2:
        cdb.RUNS = int(sys.argv[2])
    spark = get_spark("r9profile")
    qs = all_queries()
    jgc = spark.sparkContext._jvm.System.gc
    print(f"# profile_r9 sf_dir={sf_dir} runs={cdb.RUNS}", flush=True)

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ("documents", "customer", "orders", "lineitem", "supplier",
              "nation", "region", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # ---- 1. cypher_with_having ------------------------------------
    q = qs["cypher_with_having"]
    # cold first-touch: new derivation (branch caches materialize lazily)
    t0 = time.perf_counter()
    q.spark(spark, sf_dir).toPandas()
    cold_new = time.perf_counter() - t0
    s_new = cdb.median5(lambda: q.spark(spark, sf_dir).toPandas(), pre=jgc)

    old_rels = derived_rels_single_union(spark, sf_dir).persist()
    from neo4j_enterprise_spark.graph.derive import derived_nodes
    nodes = derived_nodes(spark, sf_dir)
    t0 = time.perf_counter()
    with_having_over(nodes, old_rels).toPandas()
    cold_old = time.perf_counter() - t0
    s_old = cdb.median5(lambda: with_having_over(nodes, old_rels).toPandas(), pre=jgc)
    old_rels.unpersist()

    con.execute(q.oracle).df()  # warm
    d = cdb.median5(lambda: con.execute(q.oracle).df())
    print("| variant | warm s | cold-first s | vs duckdb |", flush=True)
    print("|---|---|---|---|", flush=True)
    print(f"| with_having NEW per-type tagged | {s_new:.2f} | {cold_new:.2f} | {s_new / max(d, 1e-9):.1f}x |", flush=True)
    print(f"| with_having OLD single union | {s_old:.2f} | {cold_old:.2f} | {s_old / max(d, 1e-9):.1f}x |", flush=True)
    print(f"| duckdb oracle | {d:.3f} | — | 1.0x |", flush=True)

    # ---- 2. tfidf variants -----------------------------------------
    q = qs["docs_tfidf_keywords"]
    vocab = tfidf_base(spark, sf_dir)[0].select("term").distinct().count()
    print(f"# tfidf vocab size at this sf: {vocab}", flush=True)
    variants = {
        "CURRENT (groupBy df + join)": lambda: q.spark(spark, sf_dir).toPandas(),
        "WINDOW-DF": lambda: tfidf_window_df(spark, sf_dir).toPandas(),
        "BCAST-DF": lambda: tfidf_bcast_df(spark, sf_dir).toPandas(),
    }
    con2 = duckdb.connect()
    con2.execute("SET threads TO 32")
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    con2.execute(q.oracle).df()
    d = cdb.median5(lambda: con2.execute(q.oracle).df())
    print("| tfidf variant | spark s | vs duckdb |", flush=True)
    print("|---|---|---|", flush=True)
    for label, fn in variants.items():
        fn()  # warm
        s = cdb.median5(fn, pre=jgc)
        print(f"| {label} | {s:.2f} | {s / max(d, 1e-9):.1f}x |", flush=True)
    print(f"| duckdb oracle | {d:.3f} | 1.0x |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Root-cause the two queries whose Spark/DuckDB ratio WORSENED from sf1
to sf10 (VERDICT r6: docs_bigram_counts 0.9x -> 2.7x,
docs_heavy_hitter_terms 2.2x -> 3.8x — both explode-the-corpus token
plans), plus the measured A/B for the two phrase-search strategies
(VERDICT r6 item 8).

Per-variant wall clock, median-of-N steal-clean (compare_duckdb's
discipline), plan rebuilt every sample, Arrow materialization:

  bigram_hof      the registered plan: transform(sequence) lambda builds
                  (w1,w2) structs array-side — interpreted, allocates
                  per element (the §9 'convert a HOF when the lambda
                  allocates' candidate)
  bigram_window   posexplode + LEAD over a doc-keyed window — one
                  shuffle, all whole-stage codegen
  bigram_oracle   the DuckDB twin
  hh_explode_only corpus explode + count only (no vocabulary aggregate)
                  — isolates Generate+scan cost from the agg
  hh_full         the registered heavy-hitter plan
  hh_oracle       the DuckDB twin
  phrase_hof      registered docs_phrase_search_hof (rlike prefilter +
                  positional HOF verify)
  phrase_postings registered docs_phrase_search_postings (m-1
                  (doc,pos)-keyed equi-joins, no lambdas; also the
                  plan behind the default docs_phrase_search since r8)
  phrase_oracle   the DuckDB twin (same list_filter loop as the HOF)

Usage: PYTHONPATH=. python tools/profile_sf10_tail.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

import tools.compare_duckdb as cdb
from neo4j_enterprise_spark.catalog import load_table
from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bigram_window(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.select(
            F.col("tok").alias("w1"), F.lead("tok", 1).over(w).alias("w2")
        )
        .filter(F.col("w2").isNotNull())
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    pair = bg.groupBy("w1", "w2").agg(F.count("*").alias("pair_n"))
    pre = pair.groupBy("w1").agg(F.sum("pair_n").alias("prefix_n"))
    return (
        pair.join(pre, "w1")
        .select("w1", "w2", "pair_n", "prefix_n")
        .orderBy(F.desc("pair_n"), "w1", "w2")
        .limit(30)
    )


def hh_explode_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    return toks.agg(F.count("*").alias("n"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    cdb.RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("profile-sf10-tail")
    qs = all_queries()
    load_table(spark, sf_dir, "documents").count()  # warm FS cache
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    jgc = spark.sparkContext._jvm.System.gc

    def t_spark(fn):
        fn(spark, sf_dir).toPandas()  # warm codegen
        return cdb.median5(lambda: fn(spark, sf_dir).toPandas(), pre=jgc)

    def t_duck(sql):
        con.execute(sql).df()
        return cdb.median5(lambda: con.execute(sql).df())

    variants = [
        ("bigram_hof", lambda: t_spark(qs["docs_bigram_counts"].spark)),
        ("bigram_window", lambda: t_spark(bigram_window)),
        ("bigram_oracle", lambda: t_duck(qs["docs_bigram_counts"].oracle)),
        ("hh_explode_only", lambda: t_spark(hh_explode_only)),
        ("hh_full", lambda: t_spark(qs["docs_heavy_hitter_terms"].spark)),
        ("hh_oracle", lambda: t_duck(qs["docs_heavy_hitter_terms"].oracle)),
        ("phrase_hof", lambda: t_spark(qs["docs_phrase_search_hof"].spark)),
        (
            "phrase_postings",
            lambda: t_spark(qs["docs_phrase_search_postings"].spark),
        ),
        ("phrase_oracle", lambda: t_duck(qs["docs_phrase_search"].oracle)),
    ]
    print(f"# profile_sf10_tail sf_dir={sf_dir} runs={cdb.RUNS}", flush=True)
    for name, thunk in variants:
        print(f"| {name} | {thunk():.2f}s |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

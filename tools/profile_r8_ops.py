#!/usr/bin/env python
"""sf10 profile of the round-8 operators: each registered plan vs its
DuckDB oracle (medians of N steal-clean samples), plus an inline A/B of
the ExactSubstr gram-count fix (r7 unbounded per-gram window vs the r8
map-side-combinable groupBy + digest semi-join).

Usage: PYTHONPATH=. python tools/profile_r8_ops.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

import tools.compare_duckdb as cdb
from neo4j_enterprise_spark.catalog import load_table
from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark

QUERIES = (
    "docs_char_gini",
    "docs_gopher_rules",
    "docs_tfidf_keywords",
    "docs_dup_rate_by_source",
    "docs_langid_agreement",
    "docs_exact_substr_spans",
    "emb_norm_outliers",
)


def exact_substr_window_form(spark, sf_dir):
    """The RETIRED r7 rendering — corpus-wide gram counts via an
    unbounded Window.partitionBy(gram) — kept here only as the A/B
    reference for the r8 skew fix."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    k, min_count = 4, 2
    toks = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    wlead = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(wlead) for i in range(1, k)]
    grams = toks.select(
        "doc_id",
        "pos",
        F.when(
            F.lead("tok", k - 1).over(wlead).isNotNull(),
            F.concat_ws(" ", *parts),
        ).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    wcnt = Window.partitionBy("gram")
    dup = (
        grams.withColumn("cnt", F.count("*").over(wcnt))
        .filter(F.col("cnt") >= min_count)
        .select("doc_id", "pos")
    )
    wpos = Window.partitionBy("doc_id").orderBy("pos")
    flagged = dup.select(
        "doc_id",
        "pos",
        F.when((F.col("pos") - F.lag("pos", 1).over(wpos)) > k, 1)
        .otherwise(0)
        .alias("brk"),
    )
    islands = flagged.select(
        "doc_id",
        "pos",
        F.sum("brk")
        .over(wpos.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    spans = islands.groupBy("doc_id", "island").agg(
        (F.max("pos") - F.min("pos") + k).cast("long").alias("span_len")
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum("span_len").cast("long").alias("dup_tokens"),
            F.max("span_len").cast("long").alias("max_span_len"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    if len(sys.argv) > 2:
        cdb.RUNS = int(sys.argv[2])
    spark = get_spark("r8profile")
    qs = all_queries()
    for t in ("documents", "embeddings"):
        load_table(spark, sf_dir, t).count()
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    jgc = spark.sparkContext._jvm.System.gc
    print(f"# profile_r8_ops sf_dir={sf_dir} runs={cdb.RUNS}", flush=True)
    print("| query | spark s | duckdb s | ratio |", flush=True)
    print("|---|---|---|---|", flush=True)
    for name in QUERIES:
        q = qs[name]
        q.spark(spark, sf_dir).toPandas()  # warm
        s = cdb.median5(lambda: q.spark(spark, sf_dir).toPandas(), pre=jgc)
        con.execute(q.oracle).df()  # warm
        d = cdb.median5(lambda: con.execute(q.oracle).df())
        print(
            f"| {name} | {s:.2f} | {d:.3f} | {s / max(d, 1e-9):.1f}x |",
            flush=True,
        )
    # A/B: the retired window form of exact_substr
    exact_substr_window_form(spark, sf_dir).toPandas()  # warm
    s_old = cdb.median5(
        lambda: exact_substr_window_form(spark, sf_dir).toPandas(), pre=jgc
    )
    print(f"| exact_substr WINDOW form (retired r7) | {s_old:.2f} | — | — |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

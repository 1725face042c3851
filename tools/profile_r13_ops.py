#!/usr/bin/env python
"""r13 asks #4-#7 A/B harness: LSH candidate-dedup restructure, span_dedup
reassembly variants, bigram prefix-marginal variants, BPE train scale
receipt. Every variant is row-compared against the shipped operator on the
same data before it is timed; timing is the noop sink (guide §1.4),
interleaved same-session medians with steal-polluted samples discarded.

Usage: PYTHONPATH=. python tools/profile_r13_ops.py <lsh|span|bigram|bpe> [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_enterprise_spark.plans import all_queries
from neo4j_enterprise_spark.session import get_spark


def _steal() -> float:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / 100.0
    except (OSError, IndexError, ValueError):
        return 0.0


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _median(spark, build, runs, label):
    spark.sparkContext.setJobDescription(label)
    _noop(build())  # warm
    samples: list[float] = []
    attempts = 0
    while len(samples) < runs and attempts < 3 * runs:
        attempts += 1
        spark.sparkContext._jvm.System.gc()
        st0 = _steal()
        t0 = time.perf_counter()
        _noop(build())
        dt = time.perf_counter() - t0
        if _steal() - st0 > max(1.0, 0.3 * dt):
            continue
        samples.append(dt)
    samples.sort()
    med = samples[len(samples) // 2] if samples else float("nan")
    print(f"  {label}: median {med:.3f}s of {[round(s, 3) for s in samples]}")
    return med


def _identical(old: DataFrame, new: DataFrame, what: str) -> None:
    only_old = old.exceptAll(new).count()
    only_new = new.exceptAll(old).count()
    n = old.count()
    status = "IDENTICAL" if only_old == only_new == 0 else "DIVERGED"
    print(f"  rows[{what}]: n={n} old-only={only_old} new-only={only_new} -> {status}")
    assert only_old == 0 and only_new == 0, f"{what} diverged"


# --- ask #4: LSH candidate dedup --------------------------------------------


def _lsh_topk_variant(emb, seeds, k=5, planes_per_band=4, bands=16, dims=64, seed=42):
    """lsh_ann_topk with the pair-distinct replaced by a seed-grouped
    collect_set + explode: ONE hash(seed) exchange (with map-side partial
    dedup) feeds dedup AND the top-k window, instead of hash(seed,
    neighbor) for distinct plus hash(seed) for the window."""
    from neo4j_enterprise_spark.operators.dedup import drop_oversized_buckets
    from neo4j_enterprise_spark.operators.similarity import (
        MAX_BUCKET_DEFAULT,
        _dot,
        drop_unsearchable,
        lsh_buckets,
        quantize,
    )

    emb = drop_unsearchable(emb, dims=dims)
    seeds = drop_unsearchable(seeds, dims=dims)
    buckets = drop_oversized_buckets(
        lsh_buckets(emb, planes_per_band, bands, dims, seed), MAX_BUCKET_DEFAULT
    ).localCheckpoint(eager=True)
    seed_buckets = buckets.join(
        F.broadcast(seeds.select(F.col("vec_id"))), "vec_id"
    ).withColumnRenamed("vec_id", "seed")
    cand = (
        seed_buckets.join(buckets, ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("seed"))
        .groupBy("seed")
        .agg(F.collect_set("vec_id").alias("ns"))
        .select("seed", F.explode("ns").alias("neighbor"))
    )
    q = seeds.select(
        F.col("vec_id").alias("seed"), quantize(F.col("embedding")).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    c = emb.select(
        F.col("vec_id").alias("neighbor"), quantize(F.col("embedding")).alias("cv")
    ).withColumn("cn", _dot(F.col("cv"), F.col("cv")))
    scored = (
        cand.join(F.broadcast(q), "seed")
        .join(c, "neighbor")
        .select(
            "seed",
            "neighbor",
            (
                _dot(F.col("qv"), F.col("cv")).cast("double")
                / F.sqrt((F.col("qn") * F.col("cn")).cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("seed").orderBy(F.desc("score"), F.asc("neighbor"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("seed", "neighbor", "score", "rk")
    )


def _neardup_lsh_variant(emb, threshold=0.4, planes_per_band=4, bands=16, dims=64, seed=42):
    from neo4j_enterprise_spark.operators.dedup import drop_oversized_buckets
    from neo4j_enterprise_spark.operators.similarity import (
        MAX_BUCKET_DEFAULT,
        _dot,
        drop_unsearchable,
        lsh_buckets,
        quantize,
    )

    emb = drop_unsearchable(emb, dims=dims)
    buckets = drop_oversized_buckets(
        lsh_buckets(emb, planes_per_band, bands, dims, seed), MAX_BUCKET_DEFAULT
    ).localCheckpoint(eager=True)
    cand = (
        buckets.join(buckets.withColumnRenamed("vec_id", "other"), ["band", "bucket"])
        .filter(F.col("vec_id") < F.col("other"))
        .groupBy("vec_id")
        .agg(F.collect_set("other").alias("bs"))
        .select(F.col("vec_id").alias("a"), F.explode("bs").alias("b"))
    )
    q = emb.select(
        F.col("vec_id").alias("a"), quantize(F.col("embedding")).alias("qa")
    ).withColumn("na", _dot(F.col("qa"), F.col("qa")))
    c = emb.select(
        F.col("vec_id").alias("b"), quantize(F.col("embedding")).alias("qb")
    ).withColumn("nb", _dot(F.col("qb"), F.col("qb")))
    return (
        cand.join(q, "a")
        .join(c, "b")
        .select(
            "a",
            "b",
            (
                _dot(F.col("qa"), F.col("qb")).cast("double")
                / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def run_lsh(spark, sf_dir, runs):
    from neo4j_enterprise_spark.operators import similarity
    from neo4j_enterprise_spark.plans.pipeline import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 20)

    old_topk = similarity.lsh_ann_topk(emb, seeds, k=5).orderBy("seed", "rk")
    new_topk = _lsh_topk_variant(emb, seeds, k=5).orderBy("seed", "rk")
    _identical(old_topk, new_topk, "ann_lsh_top5")

    old_md5 = similarity.lsh_ann_topk(
        emb, seeds, k=5, planes_per_band=4, bands=4, dims=64, seed=42
    ).orderBy("seed", "rk")
    new_md5 = _lsh_topk_variant(
        emb, seeds, k=5, planes_per_band=4, bands=4, dims=64, seed=42
    ).orderBy("seed", "rk")
    _identical(old_md5, new_md5, "ann_lsh_md5_top5")

    old_nd = similarity.embedding_near_dup_lsh(emb, threshold=0.4).orderBy("a", "b")
    new_nd = _neardup_lsh_variant(emb, threshold=0.4).orderBy("a", "b")
    _identical(old_nd, new_nd, "docs_embedding_near_dup_lsh")

    print(f"== timings ({sf_dir}, median of {runs}, interleaved) ==")
    for _ in range(1):
        _median(spark, lambda: similarity.lsh_ann_topk(emb, seeds, k=5).orderBy("seed", "rk"), runs, "topk OLD (pair distinct)")
        _median(spark, lambda: _lsh_topk_variant(emb, seeds, k=5).orderBy("seed", "rk"), runs, "topk NEW (seed collect_set)")
        _median(spark, lambda: similarity.embedding_near_dup_lsh(emb, threshold=0.4).orderBy("a", "b"), runs, "neardup OLD")
        _median(spark, lambda: _neardup_lsh_variant(emb, threshold=0.4).orderBy("a", "b"), runs, "neardup NEW")


# --- ask #5: span_dedup reassembly -------------------------------------------


def _span_parts(docs, text_col="text", block=4):
    import pandas as pd

    def _spanify(batches):
        for pdf in batches:
            ids: list = []
            idxs: list = []
            blocks: list = []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                if text is None:
                    continue
                toks = text.split(" ")
                nb = max((len(toks) + block - 1) // block, 1)
                for i in range(nb):
                    ids.append(did)
                    idxs.append(i)
                    blocks.append(" ".join(toks[i * block : (i + 1) * block]))
            yield pd.DataFrame({"doc_id": ids, "block_idx": idxs, "block": blocks})

    return docs.select("doc_id", text_col).mapInPandas(
        _spanify, "doc_id long, block_idx int, block string"
    )


def _span_dedup_pandas(docs, block=4, min_count=2):
    """Verdict ask #5 variant A: Arrow applyInPandas reassembly instead of
    the interpreted collect_list+array_sort+md5 aggregate."""
    import hashlib

    import pandas as pd

    spans = _span_parts(docs, block=block)
    joined = spans.withColumn("cnt", F.count("*").over(Window.partitionBy("block")))

    def _reassemble(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values("block_idx")
        hot = g["cnt"] >= min_count
        clean = " ".join(g.loc[~hot, "block"])
        return pd.DataFrame(
            {
                "doc_id": [g["doc_id"].iloc[0]],
                "n_blocks": [len(g)],
                "n_removed": [int(hot.sum())],
                "clean_md5": [hashlib.md5(clean.encode()).hexdigest()],
            }
        )

    return joined.groupBy("doc_id").applyInPandas(
        _reassemble, "doc_id long, n_blocks long, n_removed long, clean_md5 string"
    )


def _span_dedup_hotjoin(docs, block=4, min_count=2):
    """Variant B (guide §3.2 shape): corpus-wide span counts via ONE
    partial-agged groupBy whose hot survivors join back to a second spanify
    pass — the corpus-sized span stream never shuffles (docs are contiguous
    per partition, so the per-doc aggregate partial-aggs to 1 row/doc
    map-side); only the compacted per-doc rows and the distinct-span counts
    cross the network."""
    spans = _span_parts(docs, block=block)
    hot = (
        spans.groupBy("block")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("block", F.lit(True).alias("__hot"))
    )
    flagged = spans.join(hot, "block", "left")
    kept = F.array_sort(
        F.collect_list(
            F.when(F.col("__hot").isNull(), F.struct("block_idx", "block"))
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.col("__hot").isNotNull().cast("long")).alias("n_removed"),
        F.md5(F.concat_ws(" ", F.transform(kept, lambda x: x["block"]))).alias(
            "clean_md5"
        ),
    )


def run_span(spark, sf_dir, runs):
    from neo4j_enterprise_spark.operators import dedup
    from neo4j_enterprise_spark.plans.pipeline import load_table

    docs = load_table(spark, sf_dir, "documents")
    cur = dedup.span_dedup(docs, block=4, min_count=2)
    pan = _span_dedup_pandas(docs)
    hotj = _span_dedup_hotjoin(docs)
    _identical(cur, pan, "span_dedup pandas-reassembly")
    _identical(cur, hotj, "span_dedup hot-join")
    print(f"== timings ({sf_dir}, median of {runs}, interleaved) ==")
    _median(spark, lambda: dedup.span_dedup(docs, block=4, min_count=2), runs, "CURRENT (window + interpreted agg)")
    _median(spark, lambda: _span_dedup_pandas(docs), runs, "A: applyInPandas reassembly")
    _median(spark, lambda: _span_dedup_hotjoin(docs), runs, "B: hot-set join, no window")


# --- ask #7: bigram prefix marginal ------------------------------------------


def _bigram_counts_window(spark, sf_dir):
    from neo4j_enterprise_spark.plans.pipeline import load_table

    docs = load_table(spark, sf_dir, "documents")
    bg = (
        docs.select(F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN "
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i - 1] AS w1, t[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    pair = bg.groupBy("w1", "w2").agg(F.count("*").alias("pair_n"))
    return (
        pair.withColumn("prefix_n", F.sum("pair_n").over(Window.partitionBy("w1")))
        .select("w1", "w2", "pair_n", "prefix_n")
        .orderBy(F.desc("pair_n"), "w1", "w2")
        .limit(30)
    )


def run_bigram(spark, sf_dir, runs):
    cur_fn = all_queries()["docs_bigram_counts"].spark
    new = _bigram_counts_window(spark, sf_dir)
    _identical(cur_fn(spark, sf_dir), new, "docs_bigram_counts window-form")
    print(f"== timings ({sf_dir}, median of {runs}, interleaved) ==")
    _median(spark, lambda: cur_fn(spark, sf_dir), runs, "CURRENT (pair->pre join)")
    _median(spark, lambda: _bigram_counts_window(spark, sf_dir), runs, "window prefix marginal")

    # ask #7 literal receipt: does runtime exchange reuse dedupe the
    # tokenize+explode subtree in the join form? lazy vs checkpointed pair.
    def _ckpt_form():
        from neo4j_enterprise_spark.plans.pipeline import load_table

        docs = load_table(spark, sf_dir, "documents")
        bg = (
            docs.select(F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
            .select(
                F.explode(
                    F.expr(
                        "CASE WHEN size(t) >= 2 THEN "
                        "transform(sequence(1, size(t) - 1),"
                        " i -> struct(t[i - 1] AS w1, t[i] AS w2)) "
                        "ELSE array() END"
                    )
                ).alias("p")
            )
            .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
            .filter((F.col("w1") != "") & (F.col("w2") != ""))
        )
        pair = bg.groupBy("w1", "w2").agg(F.count("*").alias("pair_n")).localCheckpoint(eager=True)
        pre = pair.groupBy("w1").agg(F.sum("pair_n").alias("prefix_n"))
        return (
            pair.join(pre, "w1")
            .select("w1", "w2", "pair_n", "prefix_n")
            .orderBy(F.desc("pair_n"), "w1", "w2")
            .limit(30)
        )

    _median(spark, _ckpt_form, runs, "join form, pair checkpointed")


# --- ask #6: BPE train scale receipt -----------------------------------------


def run_bpe(spark, sf_dir, runs):
    from neo4j_enterprise_spark.operators.text import bpe_train
    from neo4j_enterprise_spark.plans.pipeline import load_table

    docs = load_table(spark, sf_dir, "documents")
    samples = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"bpe_train run {i}")
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        merges, words = bpe_train(docs, n_merges=8)
        dt = time.perf_counter() - t0
        words.unpersist()
        samples.append(dt)
        print(f"  bpe_train n_merges=8: {dt:.3f}s ({len(merges)} merges)")
    samples.sort()
    print(f"  median: {samples[len(samples) // 2]:.3f}s")


def main() -> None:
    which = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark(f"profile-r13-{which}")
    {"lsh": run_lsh, "span": run_span, "bigram": run_bigram, "bpe": run_bpe}[
        which
    ](spark, sf_dir, runs)
    spark.stop()


if __name__ == "__main__":
    main()

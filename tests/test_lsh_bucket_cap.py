"""Oversized-LSH-bucket guard (dedup.drop_oversized_buckets): a
pathological bucket — many documents sharing a band signature — must be
dropped from candidate generation (bounded per-bucket pair work at
100 TB), reported by oversized_bucket_report, and the capped output must
still match the SQL oracle when the oracle replays the same cap."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from neo4j_enterprise_spark.operators import dedup, similarity

# 40 byte-identical docs (every band bucket holds all 40 — one
# degenerate bucket family) + 2 genuine near-dups + singletons.
# The near-dups differ in ONE token of 300: shingle Jaccard ≈ 0.97
# (minhash bands collide) and simhash hamming = 1 (within the ball).
CLONE = "the quick brown fox jumps over the lazy dog again and again " * 3
_BASE_WORDS = [f"w{i}tok" for i in range(300)]
NEAR_A = " ".join(_BASE_WORDS)
NEAR_B = " ".join(["changed0"] + _BASE_WORDS[1:])
LONERS = [f"unique document number {i} with its own words w{i} x{i} y{i} z{i}" for i in range(4)]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, CLONE) for i in range(40)]
    rows += [(100, NEAR_A), (101, NEAR_B)]
    rows += [(110 + i, t) for i, t in enumerate(LONERS)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_drops_pathological_bucket(docs):
    uncapped = dedup.minhash_lsh_pairs(docs, portable=True, max_bucket_size=None)
    capped = dedup.minhash_lsh_pairs(docs, portable=True, max_bucket_size=10)
    un = {(r.doc_a, r.doc_b) for r in uncapped.collect()}
    cp = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # uncapped: the 40-clone bucket alone contributes 780 pairs
    assert (0, 1) in un and len(un) >= 780
    # capped: clone pairs gone, the small-bucket near-dup pair survives
    assert cp <= un and (0, 1) not in cp
    assert (100, 101) in cp


def test_minhash_dropped_bucket_report(docs):
    sig = dedup.minhash_signatures(dedup.shingles(docs), portable=True)
    buckets = dedup.minhash_buckets(docs, portable=True)
    report = dedup.oversized_bucket_report(buckets, 10).collect()
    # every one of the 16 bands holds the size-40 clone bucket
    assert len(report) == 16
    assert all(r.bucket_size == 40 for r in report)
    del sig


def test_minhash_capped_output_matches_oracle(docs, tmp_path):
    """Oracle parity ON the capped output with the cap actually firing:
    the registered oracle SQL (parameterized to the same cap) over the
    same rows must hash-match the capped Spark plan."""
    from neo4j_enterprise_spark.plans.pipeline import _minhash_oracle_sql

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    d_rows = sorted(
        tuple(r) for r in con.execute(_minhash_oracle_sql(max_bucket_size=10)).fetchall()
    )
    s_rows = sorted(
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            docs.filter(F.col("doc_id") < 200), portable=True, max_bucket_size=10
        ).collect()
    )
    assert s_rows == [tuple(r) for r in d_rows]
    assert s_rows, "cap must not empty the healthy buckets"
    assert (0, 1) not in s_rows, "oracle and engine both dropped the clones"


def test_simhash_cap(docs):
    sig = dedup.simhash_md5_60(docs)
    uncapped = dedup.simhash_banded_pairs(sig, max_bucket_size=None)
    capped = dedup.simhash_banded_pairs(sig, max_bucket_size=10)
    un = {(r.doc_a, r.doc_b) for r in uncapped.collect()}
    cp = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (0, 1) in un and cp <= un and (0, 1) not in cp
    assert (100, 101) in cp  # near-dup pair lives in small buckets


def test_embedding_lsh_cap(spark):
    # 30 identical vectors (one degenerate bucket per band) + 2 near-dups
    base = [1.0] * 64
    near = [1.0] * 63 + [0.9]
    rows = [(i, base) for i in range(30)]
    rows += [(100, [float((i * 7 + 3) % 5 - 2) for i in range(64)])]
    rows += [(101, near)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = similarity.embedding_near_dup_lsh(emb, threshold=0.9, max_bucket_size=None)
    capped = similarity.embedding_near_dup_lsh(emb, threshold=0.9, max_bucket_size=8)
    un = {(r.a, r.b) for r in uncapped.collect()}
    cp = {(r.a, r.b) for r in capped.collect()}
    assert (0, 1) in un and cp <= un and (0, 1) not in cp
    # clone bucket also swallows vec 101 (same hyperplane signs as base):
    # the cap drops its bucket too — capped output loses recall, never
    # invents pairs (the documented trade; report names the bucket)
    buckets = similarity.lsh_buckets(emb, 4, 16, 64, 42)
    report = dedup.oversized_bucket_report(buckets, 8)
    assert report.count() >= 16


def test_ann_lsh_cap(spark):
    """lsh_ann_topk shares the guard (ADVICE r11): a degenerate bucket of
    clones is dropped from candidate generation, so a seed inside it only
    sees candidates from its other bands; seeds in healthy buckets are
    unaffected."""
    base = [1.0] * 64
    rows = [(i, base) for i in range(30)]  # clone bucket, includes seed 0
    # distinct, non-colliding vectors incl. seed 40
    rows += [
        (40 + j, [float(((i + j) * 7 + 3) % 5 - 2) for i in range(64)])
        for j in range(6)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds = emb.filter(F.col("vec_id").isin(0, 40))
    uncapped = similarity.lsh_ann_topk(emb, seeds, k=3, max_bucket_size=None)
    capped = similarity.lsh_ann_topk(emb, seeds, k=3, max_bucket_size=8)
    un = {(r.seed, r.neighbor) for r in uncapped.collect()}
    cp = {(r.seed, r.neighbor) for r in capped.collect()}
    assert (0, 1) in un  # clones find each other uncapped
    # NOT cp <= un: top-k RE-RANKS after the cap (clones out-rank the
    # healthy vectors for seed 40 uncapped), so capped rows can be new —
    # the cap bounds candidate WORK, it is not monotone on top-k output.
    assert not any(s == 0 for s, _ in cp)  # seed 0's only bucket dropped
    # the healthy seed still fills its top-k from its surviving buckets
    # (its candidate set may shrink if a band bucket it shares with the
    # clones is dropped — lost recall, never invented pairs)
    assert len({n for s, n in cp if s == 40}) == 3

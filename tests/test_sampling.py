"""Deterministic split/sample semantics and contamination correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_enterprise_spark.catalog import load_table
from neo4j_enterprise_spark.operators import sampling


def test_hash_split_disjoint_exhaustive_and_sized(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    split = sampling.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive, disjoint by construction
    assert counts["train"] / n > 0.7 and counts["val"] / n < 0.2


def test_hash_split_stable_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.9, "eval": 0.1}
    a = sorted(sampling.hash_split(docs, "doc_id", w).select("doc_id", "split").collect())
    b = sorted(
        sampling.hash_split(docs.repartition(13), "doc_id", w).select("doc_id", "split").collect()
    )
    assert a == b


def test_hash_sample_is_subset_and_prefix_monotone(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    small = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.1).select("doc_id").collect()}
    big = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    assert small <= big  # growing the fraction only ADDS rows
    assert 0 < len(small) < len(big) < docs.count()


def test_stratified_sample_respects_fractions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.0, "de": 1.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "en" not in langs
    n_de = docs.filter(F.col("lang") == "de").count()
    # fraction 1.0 clamps to threshold 'ffff' (excludes only prefix 'ffff':
    # 1/65536 of keys) — everything else survives
    assert out.filter(F.col("lang") == "de").count() >= n_de * 0.99


def test_contamination_bounds(spark):
    # two text groups: any holdout doc is a verbatim copy of every doc in
    # its own group and shares nothing with the other group
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(40)]
    rows += [(100 + i, "totally different words nothing shared here at all") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in sampling.ngram_contamination(docs, {"train": 0.5, "eval": 0.5}).collect()
    }
    # every holdout doc is either a verbatim copy of a train doc (rate 1.0)
    # or shares nothing (rate 0.0), depending on which text group it's in —
    # provided at least one doc of its group landed in train
    train_ids = {
        r["doc_id"]
        for r in sampling.hash_split(docs, "doc_id", {"train": 0.5, "eval": 0.5})
        .filter(F.col("split") == "train")
        .collect()
    }
    grp_a_train = any(i in train_ids for i in range(40))
    grp_b_train = any(100 + i in train_ids for i in range(10))
    for doc_id, r in out.items():
        expected = 1.0 if (doc_id < 100 and grp_a_train) or (doc_id >= 100 and grp_b_train) else 0.0
        assert r["contamination"] == expected, (doc_id, r)
        assert r["n_shingles"] > 0


def test_vocabulary_counts_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "c c c")], "doc_id long, text string"
    )
    rows = {r["term"]: (r["term_freq"], r["doc_freq"]) for r in sampling.vocabulary(docs).collect()}
    assert rows == {"a": (3, 2), "b": (1, 1), "c": (4, 2)}


def test_bpe_token_stats_counts(spark):
    from neo4j_enterprise_spark.operators.text import bpe_token_stats

    docs = spark.createDataFrame(
        [(1, "Hello, world42 foo_bar!"), (2, "aaa aaa")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
    # Hello , world 42 foo _ bar !  → 8 tokens, all distinct, 4 word runs
    assert (rows[1]["n_bpe_tokens"], rows[1]["n_distinct_tokens"], rows[1]["n_word_tokens"]) == (8, 8, 4)
    assert (rows[2]["n_bpe_tokens"], rows[2]["n_distinct_tokens"], rows[2]["n_word_tokens"]) == (2, 1, 2)


def test_redact_scrubs_and_counts(spark):
    from neo4j_enterprise_spark.operators.text import redact

    docs = spark.createDataFrame(
        [(1, "write a.b@x.com or 12345678 ok"), (2, "clean text only")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact(docs).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_long_digits"] == 1
    assert rows[1]["redacted_text"] == "write <EMAIL> or <LONG_DIGITS> ok"
    assert rows[2]["n_email"] == 0 and rows[2]["redacted_text"] == "clean text only"


def test_incremental_state_merge_and_delete(spark, sf_dir):
    from neo4j_enterprise_spark.operators import incremental

    ev = load_table(spark, sf_dir, "events")
    milli = F.round(F.col("value") * 1000).cast("long")
    keys, meas = ["event_type"], {"sum_value_milli": milli}
    full = incremental.sum_state(ev, keys, meas)
    sub = ev.filter(F.col("event_id") % 5 == 0)
    rest = ev.filter(F.col("event_id") % 5 != 0)
    # full - sub == state(rest), row-for-row
    derived = incremental.merge_states(
        [full, incremental.negate_state(incremental.sum_state(sub, keys, meas), keys)],
        keys,
    )
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, incremental.sum_state(rest, keys, meas).collect())
    )
    # deleting everything empties the state entirely
    gone = incremental.merge_states(
        [full, incremental.negate_state(full, keys)], keys
    )
    assert gone.count() == 0


def test_exact_k_sample_size_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sampling.exact_k_sample(docs, "doc_id", 50).select("doc_id").collect()
    b = sampling.exact_k_sample(docs.repartition(9), "doc_id", 50).select("doc_id").collect()
    assert len(a) == 50 and sorted(a) == sorted(b)


def test_per_group_cap_limits_and_keeps_small_groups(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    capped = sampling.per_group_cap(ev, ["user_id"], "event_id", 5)
    sizes = capped.groupBy("user_id").count()
    assert sizes.filter(F.col("count") > 5).count() == 0
    # groups already under the cap are untouched
    small = ev.groupBy("user_id").count().filter(F.col("count") <= 5)
    kept = sizes.join(small, "user_id", "inner")
    assert sorted(map(tuple, kept.collect())) == sorted(map(tuple, small.collect()))


def test_pack_sequences_contiguous_and_stable(spark):
    from neo4j_enterprise_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(40)], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget=10, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["start_tok"])
        pos = 0
        for r in rows:
            assert r["start_tok"] == pos  # contiguous concat stream
            assert r["seq_in_shard"] == pos // 10
            end_seq = (pos + r["n_tokens"] - 1) // 10
            assert r["n_seqs_spanned"] == end_seq - r["seq_in_shard"] + 1
            pos += r["n_tokens"]
    # stable under repartitioning: assignment is key-derived only
    again = pack_sequences(docs.repartition(13), budget=10, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_mixture_resample_exact_proportions(spark):
    from neo4j_enterprise_spark.operators.sampling import mixture_resample

    rows = (
        [(i, "a") for i in range(100)]
        + [(i + 100, "b") for i in range(50)]
        + [(i + 200, "c") for i in range(10)]
        + [(i + 300, "drop_me") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # weights a:3 b:2 c:1 (W=6): N = min(100*6/3, 50*6/2, 10*6/1) = 60
    # quotas: a=30, b=20, c=10
    out = mixture_resample(df, "lang", {"a": 3, "b": 2, "c": 1}).collect()
    by = {}
    for r in out:
        by[r["lang"]] = by.get(r["lang"], 0) + 1
    assert by == {"a": 30, "b": 20, "c": 10}
    # deterministic: same selection on re-run over repartitioned input
    again = mixture_resample(
        df.repartition(7), "lang", {"a": 3, "b": 2, "c": 1}
    ).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_epoch_shuffle_deterministic_and_seed_sensitive(spark):
    from neo4j_enterprise_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    a = {(r["doc_id"], r["shard"], r["pos"]) for r in epoch_shuffle(df, seed=1).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in epoch_shuffle(df, seed=1).collect()}
    c = {(r["doc_id"], r["shard"], r["pos"]) for r in epoch_shuffle(df, seed=2).collect()}
    assert a == b  # re-run stable
    assert a != c  # new seed = new permutation
    # shard membership static across seeds; positions dense per shard
    assert {(d, s) for d, s, _ in a} == {(d, s) for d, s, _ in c}
    from collections import defaultdict

    by_shard = defaultdict(set)
    for _, s, p in a:
        by_shard[s].add(p)
    assert all(ps == set(range(len(ps))) for ps in by_shard.values())


def test_leakage_safe_split_keeps_near_dups_together(spark, sf_dir):
    from neo4j_enterprise_spark.plans import all_queries

    # build a corpus where doc 0 has a near-duplicate; the canonical-keyed
    # split must put every cluster member in ONE split
    from neo4j_enterprise_spark.catalog import load_table
    from neo4j_enterprise_spark.operators import dedup, sampling
    from neo4j_enterprise_spark.operators.traversal import connected_components

    docs = load_table(spark, sf_dir, "documents").limit(30)
    dups = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(dups)
    sh = dedup.shingles(corpus)
    cand = (
        sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    edges = (
        dedup.ngram_jaccard(corpus, cand)
        .filter(F.col("jaccard") >= 0.6)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    cc = connected_components(edges)
    assigned = corpus.select("doc_id").join(
        cc.select(F.col("node_id").alias("doc_id"), "component"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("canon")
    )
    split = sampling.hash_split(assigned, "canon", {"train": 0.5, "val": 0.25, "test": 0.25})
    rows = {r["doc_id"]: (r["canon"], r["split"]) for r in split.collect()}
    for i in range(3):
        assert rows[i][0] == rows[i + 100_000][0], "near-dups share a canonical"
        assert rows[i][1] == rows[i + 100_000][1], "near-dups share a split"


def test_token_budget_sample_fills_each_stratum(spark):
    from neo4j_enterprise_spark.operators.sampling import token_budget_sample

    rows = [(i, "a" if i < 20 else "b", "tok " * 9 + "tok") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = token_budget_sample(docs, {"a": 35, "b": 100}, stratum_col="source")
    agg = {r["source"]: (r["n"], r["tok"]) for r in
           kept.groupBy("source").agg(
               F.count("*").alias("n"), F.sum("n_tok").alias("tok")).collect()}
    # 10-token docs: budget 35 -> 4 docs (30 before 4th < 35, 40 after);
    # budget 100 -> 10 docs
    assert agg["a"] == (4, 40)
    assert agg["b"] == (10, 100)
    # deterministic: same selection on re-run
    again = token_budget_sample(docs, {"a": 35, "b": 100}, stratum_col="source")
    assert {r["doc_id"] for r in kept.collect()} == {r["doc_id"] for r in again.collect()}


def test_negative_edge_samples_no_positives_deterministic(spark):
    from neo4j_enterprise_spark.operators.sampling import (
        negative_edge_samples,
    )

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12)], "src long, dst long"
    )
    a = negative_edge_samples(edges, k=4, seed=7).collect()
    b = negative_edge_samples(edges, k=4, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    pos = {(1, 10), (1, 11), (2, 10), (3, 12)}
    for r in a:
        assert (r.src, r.neg_dst) not in pos  # never a real edge
        assert r.src != r.neg_dst
    # a different seed draws a different sample
    c = negative_edge_samples(edges, k=4, seed=8).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_bloom_contamination_no_false_negatives(spark, sf_dir):
    """The Bloom screen must agree with the exact operator on every
    verified count (a Bloom filter has NO false negatives: every truly
    contaminated shingle is a candidate), and its FP accounting must be
    internally consistent."""
    docs = load_table(spark, sf_dir, "documents")
    weights = {"train": 0.9, "eval": 0.1}
    exact = {
        r["doc_id"]: r
        for r in sampling.ngram_contamination(docs, weights).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in sampling.bloom_contamination(docs, weights).collect()
    }
    assert set(bloom) == set(exact)
    for doc_id, b in bloom.items():
        e = exact[doc_id]
        assert b["n_shingles"] == e["n_shingles"]
        assert b["n_exact"] == e["n_contaminated"], doc_id
        assert b["contamination"] == e["contamination"]
        assert b["n_exact"] <= b["n_maybe"] <= b["n_shingles"]
        assert b["n_false_pos"] == b["n_maybe"] - b["n_exact"] >= 0


def test_bloom_contamination_fp_rate_bounded(spark, sf_dir):
    """m=258048 bits / 4 hashes over the sf0.001 train shingles should
    keep the measured false-positive rate on CLEAN shingles far below
    saturation (sanity: the sketch is actually selective, not all-ones)."""
    docs = load_table(spark, sf_dir, "documents")
    agg = (
        sampling.bloom_contamination(docs, {"train": 0.9, "eval": 0.1})
        .agg(
            F.sum("n_shingles").alias("n"),
            F.sum("n_maybe").alias("maybe"),
            F.sum("n_exact").alias("exact"),
        )
        .collect()[0]
    )
    clean = agg["n"] - agg["exact"]
    fps = agg["maybe"] - agg["exact"]
    assert clean > 0
    assert fps / clean < 0.25, (fps, clean)

"""Property-based tests (hypothesis): chain-ordering and diff-check
invariants hold for arbitrary generator shapes — the upgrade over the
reference's example-based suite noted in SURVEY.md §5."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neo4j_enterprise_spark.graph.generator import generate_graph
from neo4j_enterprise_spark.graph.model import NO_POINTER
from neo4j_enterprise_spark.operators.diff import snapshot_diff
from neo4j_enterprise_spark.operators.record_checks import validate

_slow = settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    n=st.integers(min_value=2, max_value=60),
    rel_counts=st.tuples(st.integers(0, 3), st.integers(0, 2)),
    seed=st.integers(0, 2**16),
)
@_slow
def test_generated_graph_always_validates_clean(spark, n, rel_counts, seed):
    g = generate_graph(
        spark,
        node_count=n,
        rel_specs={"FOO": rel_counts[0], "BAR": rel_counts[1]},
        prop_specs={"INTEGER": 1, "STRING": 1},
        seed=seed,
    )
    assert validate(g).count() == 0


@given(n=st.integers(min_value=2, max_value=60), seed=st.integers(0, 2**16))
@_slow
def test_chain_order_is_ascending_id_per_endpoint(spark, n, seed):
    g = generate_graph(spark, node_count=n, seed=seed)
    rels = g.relationships
    # walking src_next from every chain head in link order must visit ids
    # ascending: equivalently, src_next > id whenever set
    bad_next = rels.filter(
        (F.col("src_next") != NO_POINTER) & (F.col("src_next") <= F.col("id"))
    ).count()
    bad_prev = rels.filter(
        (F.col("src_prev") != NO_POINTER) & (F.col("src_prev") >= F.col("id"))
    ).count()
    assert bad_next == 0 and bad_prev == 0


@given(
    n=st.integers(min_value=5, max_value=50),
    drop_mod=st.integers(2, 7),
    seed=st.integers(0, 2**10),
)
@_slow
def test_snapshot_diff_partitions_changes(spark, n, drop_mod, seed):
    g = generate_graph(spark, node_count=n, seed=seed)
    old = g.nodes
    new = (
        old.filter(F.col("id") % drop_mod != 0)  # removals
        .unionByName(
            old.select(
                (F.col("id") + 100_000).alias("id"), "in_use", "next_rel", "next_prop"
            ).limit(3)  # additions
        )
    )
    d = snapshot_diff(old, new, "id", ["in_use", "next_rel", "next_prop"])
    by_change = {r["change"]: r["cnt"] for r in d.groupBy("change").agg(F.count("*").alias("cnt")).collect()}
    n_removed = old.filter(F.col("id") % drop_mod == 0).count()
    assert by_change.get("removed", 0) == n_removed
    assert by_change.get("added", 0) == min(3, n)
    assert "changed" not in by_change


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12
        ).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    block=st.integers(min_value=2, max_value=4),
)
def test_span_dedup_counts_are_conserved(spark, texts, block):
    """n_removed + surviving spans == n_blocks, and a doc's clean text is
    a subsequence digest: removing zero spans must reproduce the
    original block join exactly."""
    from neo4j_enterprise_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = span_dedup(docs, block=block, min_count=2).collect()
    assert len(out) == len(texts)
    import hashlib
    import math

    for r in out:
        toks = texts[r["doc_id"]].split(" ")
        n_blocks = math.ceil(len(toks) / block)
        assert r["n_blocks"] == n_blocks
        assert 0 <= r["n_removed"] <= n_blocks
        if r["n_removed"] == 0:
            joined = " ".join(
                " ".join(toks[i * block : (i + 1) * block])
                for i in range(n_blocks)
            )
            assert r["clean_md5"] == hashlib.md5(joined.encode()).hexdigest()


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    base=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 3)), max_size=12),
    dl=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 3)), max_size=6),
    dr=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 3)), max_size=6),
)
def test_join_delta_always_equals_recompute(spark, base, dl, dr):
    from neo4j_enterprise_spark.operators.incremental import join_delta

    schema_l, schema_r = "k long, l long", "k long, r long"
    L0 = spark.createDataFrame(base or [(99, 0)], schema_l)
    R0 = spark.createDataFrame([(k, v + 100) for k, v in base] or [(98, 0)], schema_r)
    dL = spark.createDataFrame(dl or [(97, 0)], schema_l)
    dR = spark.createDataFrame([(k, v + 200) for k, v in dr] or [(96, 0)], schema_r)
    full = sorted(
        tuple(r) for r in L0.unionByName(dL).join(R0.unionByName(dR), "k").collect()
    )
    maintained = sorted(
        tuple(r)
        for r in L0.join(R0, "k")
        .unionByName(join_delta(L0, R0, dL, dR, ["k"]))
        .collect()
    )
    assert maintained == full


_TOK = st.sampled_from(["scan", "table", "merge", "a", "x"])


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(_TOK, min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_phrase_search_matches_python_mirror(spark, texts):
    """phrase_search == the obvious sequential scan, for arbitrary
    token streams over a colliding alphabet (overlaps, repeats,
    too-short docs, empty docs)."""
    from neo4j_enterprise_spark.operators.text import phrase_search

    phrase = ("table", "scan")
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    expected = {}
    for i, txt in enumerate(texts):
        toks = txt.split()
        hits = [
            p
            for p in range(len(toks) - len(phrase) + 1)
            if tuple(toks[p : p + len(phrase)]) == phrase
        ]
        if hits:
            expected[i] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, phrase=phrase).collect()
    }
    assert got == expected


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    run=st.lists(
        st.sampled_from(["p", "q", "r", "s", "t", "u", "v"]),
        min_size=7,
        max_size=10,
    ),
    pre=st.lists(st.sampled_from(["m", "n"]), min_size=0, max_size=4),
    post=st.lists(st.sampled_from(["y", "z"]), min_size=0, max_size=4),
)
def test_winnow_guarantee_holds_for_random_runs(spark, run, pre, post):
    """The winnowing guarantee (Schleimer et al. Thm: any shared run of
    >= w + k - 1 tokens yields a shared fingerprint) must hold for
    arbitrary shared runs at arbitrary offsets in both documents."""
    from neo4j_enterprise_spark.operators.dedup import winnow_fingerprints

    shared = " ".join(run)  # len >= 7 = w + k - 1 for k=4, w=4
    docs = spark.createDataFrame(
        [
            (1, " ".join(pre) + " " + shared + " " + " ".join(post)),
            (2, shared + " " + " ".join(pre)),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs).collect()
    h1 = {r["fp_hash"] for r in fps if r["doc_id"] == 1}
    h2 = {r["fp_hash"] for r in fps if r["doc_id"] == 2}
    assert h1 & h2


def _spans_reference(texts: dict[int, str], k: int, min_count: int):
    """Python reference for exact_substr_spans: brute-force gram
    counting + island merge."""
    grams: dict[str, int] = {}
    per_doc: dict[int, list[int]] = {}
    for d, t in texts.items():
        toks = t.lower().split()
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            grams[g] = grams.get(g, 0) + 1
    for d, t in texts.items():
        toks = t.lower().split()
        hits = [
            i
            for i in range(len(toks) - k + 1)
            if grams[" ".join(toks[i : i + k])] >= min_count
        ]
        if hits:
            per_doc[d] = hits
    out = {}
    for d, hits in per_doc.items():
        spans = []
        start = prev = hits[0]
        for p in hits[1:]:
            if p - prev > k:
                spans.append((start, prev + k - 1))
                start = p
            prev = p
        spans.append((start, prev + k - 1))
        lens = [e - s + 1 for s, e in spans]
        out[d] = (len(spans), sum(lens), max(lens))
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=24
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_exact_substr_spans_matches_python_reference(spark, data, k):
    from neo4j_enterprise_spark.operators.dedup import exact_substr_spans

    texts = {i: " ".join(toks) for i, toks in enumerate(data)}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["max_span_len"])
        for r in exact_substr_spans(docs, k=k, min_count=2).collect()
    }
    assert got == _spans_reference(texts, k, 2)

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


def _py_gopher(raw: str, min_words: int = 50, max_words: int = 100_000):
    """Pure-Python mirror of text.gopher_rules for one document —
    independent implementation (no shared helpers) for the property
    test."""
    import re

    t = raw.strip(" ")      # Spark/DuckDB trim strips SPACES only
    tl = t.lower()
    toks = re.split(r"\s+", tl, flags=re.ASCII)
    n_words = len(toks)
    word_chars = len(t) - len(re.findall(r"\s", t, flags=re.ASCII))
    n_sym = t.count("#") + t.count("...")
    lines = raw.split("\n")
    n_bullet = sum(ln.startswith(("-", "*", "•")) for ln in lines)
    n_ell = sum(ln.endswith("...") for ln in lines)
    n_alpha = sum(1 for w in toks if re.search(r"[a-z]", w))
    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
    n_stop = sum(w in stop for w in toks)
    r = dict(
        rule_word_count=min_words <= n_words <= max_words,
        rule_mean_word_len=3 * n_words <= word_chars <= 10 * n_words,
        rule_symbol_ratio=10 * n_sym <= n_words,
        rule_bullet_lines=10 * n_bullet <= 9 * len(lines),
        rule_ellipsis_lines=10 * n_ell <= 3 * len(lines),
        rule_alpha_words=5 * n_alpha >= 4 * n_words,
        rule_stop_words=n_stop >= 2,
    )
    r["n_words"] = n_words
    r["keep"] = all(
        v for k, v in r.items() if k.startswith("rule_")
    )
    return r


_doc_text = st.lists(
    st.sampled_from(
        list("abcdefghij XY.#-*•\n") + ["the ", " of ", " and ", "..."]
    ),
    min_size=1,
    max_size=60,
).map("".join)


@given(
    texts=st.lists(_doc_text, min_size=1, max_size=8),
    min_words=st.integers(1, 6),
)
@_slow
def test_gopher_rules_matches_python_mirror(spark, texts, min_words):
    """gopher_rules == an independent pure-Python evaluation of the
    same integer rules, for arbitrary small documents (bullets,
    ellipses, newlines, symbols, stopwords all reachable)."""
    from neo4j_enterprise_spark.operators.text import gopher_rules

    rows = [(i, t) for i, t in enumerate(texts) if t.strip(" ")]
    if not rows:
        return
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(docs, min_words=min_words).collect()
    }
    assert set(got) == {i for i, _ in rows}
    for i, t in rows:
        exp = _py_gopher(t, min_words=min_words)
        g = got[i]
        for k, v in exp.items():
            assert g[k] == v, (k, t, g[k], v)


@given(texts=st.lists(_doc_text, min_size=1, max_size=8))
@_slow
def test_char_gini_matches_python_mirror(spark, texts):
    """char_gini == the definition computed independently in Python:
    (n² − Σc²)/n² over 26 letters + pooled other, on lowered trimmed
    text."""
    from neo4j_enterprise_spark.operators.text import char_gini

    rows = [(i, t) for i, t in enumerate(texts) if t.strip(" ")]
    if not rows:
        return
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chars_counted"], r["gini"])
        for r in char_gini(docs).collect()
    }
    for i, t in rows:
        s = t.strip(" ").lower()  # Spark/DuckDB trim = spaces only
        n = len(s)
        counts = [s.count(ch) for ch in "abcdefghijklmnopqrstuvwxyz"]
        other = n - sum(counts)
        sumsq = sum(c * c for c in counts) + other * other
        assert got[i] == (n, (n * n - sumsq) / (n * n))


@given(
    texts=st.lists(
        st.text(alphabet=list("abc de"), min_size=1, max_size=30),
        min_size=1,
        max_size=6,
    ),
    top_k=st.integers(1, 3),
)
@_slow
def test_tfidf_keywords_matches_python_mirror(spark, texts, top_k):
    """tfidf_keywords == brute-force tf * N / df with (score desc,
    term asc) ranking, for arbitrary token soups."""
    from collections import Counter

    from neo4j_enterprise_spark.operators.text import tfidf_keywords

    rows = [(i, t) for i, t in enumerate(texts) if t.strip(" ")]
    if not rows:
        return
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tfs = {
        i: Counter(w for w in t.strip(" ").lower().split() if w)
        for i, t in rows
    }
    n_docs = len(rows)  # matches the operator's length(trim(text)) > 0
    df = Counter()
    for c in tfs.values():
        for term in c:
            df[term] += 1
    exp = {}
    for i, c in tfs.items():
        ranked = sorted(
            ((term, tf) for term, tf in c.items()),
            key=lambda kv: (-(kv[1] * n_docs) / df[kv[0]], kv[0]),
        )[:top_k]
        exp[i] = [
            (term, tf, df[term], (tf * n_docs) / df[term], rk + 1)
            for rk, (term, tf) in enumerate(ranked)
        ]
    got = {}
    for r in tfidf_keywords(docs, top_k=top_k).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["df"], r["score"], r["rk"])
        )
    for i in exp:
        assert sorted(got.get(i, [])) == sorted(exp[i]), (i, got.get(i), exp[i])


@given(
    texts=st.lists(
        st.lists(_TOK, min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_soft_dedup_weights_matches_python_mirror(spark, texts):
    """soft_dedup_weights == brute-force 1e9 // content-count for
    arbitrary colliding corpora (duplicates, empty docs)."""
    from collections import Counter

    from neo4j_enterprise_spark.operators.dedup import soft_dedup_weights

    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dup_count"], r["weight_ppb"])
        for r in soft_dedup_weights(docs).collect()
    }
    counts = Counter(texts)
    want = {
        i: (counts[t], 1_000_000_000 // counts[t]) for i, t in enumerate(texts)
    }
    assert got == want


@given(
    texts=st.lists(
        st.lists(_TOK, min_size=1, max_size=10).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    langs=st.lists(st.sampled_from(["en", "zh"]), min_size=10, max_size=10),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_ccnet_buckets_matches_python_mirror(spark, texts, langs):
    """ccnet_buckets == brute-force commonness + per-lang ntile for
    arbitrary corpora: exact integer key, doc_id tiebreak, ntile's
    earlier-tiles-get-the-remainder split."""
    from collections import Counter, defaultdict

    from neo4j_enterprise_spark.operators.text import ccnet_buckets

    rows = [(i, t, langs[i % len(langs)]) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["commonness_ppb"], r["bucket"])
        for r in ccnet_buckets(docs).collect()
    }
    cf = Counter(tok for _, t, _ in rows for tok in t.split())
    per = {}
    by_lang = defaultdict(list)
    for i, t, lang in rows:
        toks = t.split()
        n = len(toks)
        sum_cf = sum(cf[tok] for tok in toks)
        key = (sum_cf * 1_000_000_000) // n
        per[i] = (n, key)
        by_lang[lang].append((key, i))
    want = {}
    for lang, members in by_lang.items():
        members.sort(key=lambda kv: (-kv[0], kv[1]))
        m = len(members)
        # NTILE(3): first (m % 3) tiles get ceil(m/3), rest floor(m/3)
        base, extra = divmod(m, 3)
        sizes = [base + (1 if t < extra else 0) for t in range(3)]
        pos = 0
        for tile, size in enumerate(sizes, start=1):
            for _ in range(size):
                if pos < m:
                    _, i = members[pos]
                    want[i] = (per[i][0], per[i][1], tile)
                    pos += 1
    assert got == want

"""Text-analysis operators: token stats, quality scoring, language ID.

All hot-path expressions are built-in column functions (whole-stage
codegen); nothing here drops to Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword anchors for the n-gram/stopword language
# heuristic (deterministic, dependency-free)
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "la"],
    "es": ["el", "y", "de"],
}


from ..functions.text import n_tokens as _n_tokens


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id",
        F.length(F.col(text_col)).cast("long").alias("n_chars_actual"),
        _n_tokens(F.col(text_col)).alias("n_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/token-shape quality gate (the cheap first-pass filter a
    100 TB corpus pipeline runs before anything expensive)."""
    t = F.col(text_col)
    n_tok = _n_tokens(t)
    nonspace = F.length(F.regexp_replace(t, " ", "")).cast("double")
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        (nonspace / n_tok.cast("double")).alias("avg_token_len"),
        ((F.length(t) >= 100) & (n_tok >= 20)).alias("passes_quality"),
    )


def language_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: per-language hit counts over the
    token set, argmax as predicted language. Deterministic and
    JVM-side; a real deployment swaps in a Pandas-UDF n-gram model with
    identical plumbing."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")

    def _match(marker: str):
        # single-arg lambda: a 2-arg lambda would receive the array INDEX
        # as its second argument and shadow the captured marker
        return lambda x: x == F.lit(marker)

    cols = []
    for lang, markers in _LANG_MARKERS.items():
        hits = sum(
            (F.size(F.filter(tokens, _match(m))) for m in markers),
            F.lit(0),
        )
        cols.append(F.struct(hits.cast("long").alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*cols))
    return docs.select(
        "doc_id",
        best["lang"].alias("predicted_lang"),
        best["hits"].alias("marker_hits"),
    )


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs —
# the lookahead-free core of GPT-2-style pre-tokenization, portable
# between Java regex (Spark) and RE2-like engines (DuckDB oracle)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token counts: total tokens, distinct tokens, and the
    letters-only share. regexp_extract_all is a JVM column expression —
    the whole computation stays in whole-stage codegen (the realistic
    'how many tokens is this corpus' pass before paying for a real BPE
    vocab, which would slot in here as a Pandas UDF with this exact
    schema)."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$")))
        .cast("long")
        .alias("n_word_tokens"),
    )


# portable (lookahead-free) scrub patterns; a production pass swaps in
# jurisdiction-specific pattern packs with the same plumbing
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+",
    "long_digits": r"[0-9]{6,}",  # phone / account / card number runs
}


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII-style scrub: replace every match of each pattern with a typed
    placeholder and count the replacements per class. Pure column
    expressions (one codegen stage, no UDF); the redacted text keeps the
    document's token shape so downstream stats stay meaningful."""
    red = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return docs.select("doc_id", *counts, red.alias("redacted_text"))


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition metrics per document (the "repetitious
    text" quality filters used to scrub web corpora before training):

    - ``top_word_frac``     max single-word multiplicity / n_tokens
    - ``top_bigram_frac``   2 * max bigram multiplicity / n_tokens
    - ``dup_trigram_frac``  fraction of trigram occurrences that are
                            repeats (1 - distinct/total)

    Scale design: everything is computed in the ARRAY domain with
    higher-order functions — n-gram construction (transform+slice), max
    multiplicity (array_sort + aggregate run-length scan), distinct
    counts (array_distinct) — so the whole operator is a single
    shuffle-free projection over the documents scan: no explode, no
    groupBy, embarrassingly parallel at 100 TB. Cost is O(n log n) per
    doc in tokens.
    """
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    grams, max_mult = _grams, _max_mult
    t = F.col("t")
    tri = grams(t, 3)
    stats = docs.select("doc_id", tokens.alias("t")).select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        max_mult(t).alias("max_w"),
        F.when(F.size(t) >= 2, max_mult(grams(t, 2))).otherwise(F.lit(0)).alias("max_b"),
        F.when(F.size(t) >= 3, F.size(tri)).otherwise(F.lit(0)).alias("n_tri"),
        F.when(F.size(t) >= 3, F.size(F.array_distinct(tri))).otherwise(F.lit(0)).alias("d_tri"),
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        (F.col("max_w").cast("double") / F.col("n_tokens").cast("double")).alias(
            "top_word_frac"
        ),
        F.when(
            F.col("max_b") > 0,
            (F.col("max_b") * 2).cast("double") / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(
            F.col("n_tri") > 0,
            (F.col("n_tri") - F.col("d_tri")).cast("double")
            / F.col("n_tri").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )


def normalize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization for dedup/fingerprinting: lowercase,
    strip non-alphanumerics, collapse runs of whitespace, trim. Adds a
    ``norm_text`` column.

    Pure column expressions (regex classes chosen to behave identically
    under Java regex and RE2), so normalization fuses into the scan
    projection — zero extra passes at 100 TB. Normalized-then-hashed
    dedup catches casing/punctuation mutations that byte-exact dedup
    misses, at the same one-shuffle cost.
    """
    n = F.lower(F.col(text_col))
    n = F.regexp_replace(n, r"[^a-z0-9\s]", "")
    n = F.regexp_replace(n, r"\s+", " ")
    return docs.withColumn("norm_text", F.trim(n))


def _grams(tcol, g):
    """n-gram array from a token array, built with transform+slice (all
    JVM-side array kernels)."""
    idx = F.sequence(F.lit(0), F.size(tcol) - g)
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tcol, i + 1, g)))


def _max_mult(arr):
    """Max element multiplicity of an array: sort, then a single
    aggregate() run-length scan — O(n log n) per row, no shuffle."""
    s = F.array_sort(arr)
    zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best"))

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(s, zero, step, lambda acc: acc["best"])


def filter_verdicts(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_top_bigram: float = 0.17,
    max_dup_trigram: float = 0.1,
    token_len_lo: float = 2.0,
    token_len_hi: float = 12.0,
) -> DataFrame:
    """The composite C4/Gopher-style quality gate: every heuristic
    filter evaluated in ONE fused, shuffle-free projection, emitting a
    per-document verdict — ``keep`` or the first failing rule
    (``too_short`` → ``bad_token_shape`` → ``too_repetitive`` →
    ``dup_trigrams``), so drop attribution is auditable.

    This is the decision step a 100 TB corpus scrub runs after
    normalization and before dedup; because all metrics are array-domain
    expressions over one scan (no joins between the individual metric
    operators), the marginal cost of adding a rule is zero extra passes.
    """
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(t)
    nonspace = F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("double")
    avg_len = nonspace / n.cast("double")
    top_bi = F.when(
        n >= 2, (_max_mult(_grams(t, 2)) * 2).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    tri = _grams(t, 3)
    dup_tri = F.when(
        n >= 3,
        (F.size(tri) - F.size(F.array_distinct(tri))).cast("double")
        / F.size(tri).cast("double"),
    ).otherwise(F.lit(0.0))
    verdict = (
        F.when(n < min_tokens, "too_short")
        .when((avg_len < token_len_lo) | (avg_len > token_len_hi), "bad_token_shape")
        .when(top_bi > max_top_bigram, "too_repetitive")
        .when(dup_tri > max_dup_trigram, "dup_trigrams")
        .otherwise("keep")
    )
    return docs.select(
        "doc_id", n.cast("long").alias("n_tokens"), verdict.alias("verdict")
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    token-window chunks of ``window`` tokens advancing by ``stride``
    (overlap = window - stride) — the context-length packing precursor
    every LLM training pipeline runs between cleaning and tokenization.

    Shuffle-free: chunk starts, slices and texts are all array-domain
    higher-order functions fused into the documents scan; the only
    row-expansion is the posexplode of the per-doc chunk list (bounded
    by ceil(n_tokens/stride) per row). Returns (doc_id, chunk_id,
    chunk_text, n_tokens) — chunk_id dense from 0, last chunk may be
    short (standard sliding-window semantics; callers drop tails with a
    filter if their packer requires full windows).
    """
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(tokens)
    n_chunks = F.floor((n - 1).cast("double") / stride).cast("int") + 1
    starts = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    chunks = F.transform(starts, lambda i: F.slice(tokens, i * stride + 1, window))
    out = docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_tokens")
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", F.col("chunk_tokens")).alias("chunk_text"),
        F.size("chunk_tokens").cast("long").alias("n_tokens"),
    )


def _merge_pair(sym, a: str, b: str):
    """Greedy left-to-right BPE pair merge over a symbol array, as one
    array-domain fold (no Python per row): append each symbol, replacing
    a trailing ``a`` by ``ab`` when ``b`` arrives."""
    merged = a + b
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(docs: DataFrame, n_merges: int = 8, text_col: str = "text"):
    """Distributed BPE merge training (Sennrich-style): learn the top
    ``n_merges`` byte-pair merges from a corpus.

    Plan per round: adjacent-pair counts over the (word, count) table —
    one explode + one partial-agg shuffle on the pair key — then ONE
    argmax row to the driver (the merge decision is a global scalar,
    planner-sized like the IVF codebook collect); the merge itself is an
    array fold fused into the projection (no shuffle). ONE driver action
    per round: the argmax collect doubles as the materialization of the
    current (lazily persisted) word table — the previous round's cache
    is dropped only after its child is cached, so lineage stays one
    merge deep. The word table carries one row per DISTINCT word
    (frequency-weighted), so round cost scales with vocabulary, not
    corpus size — the standard trainer shape at 100 TB where the
    word-count table is millions of rows against trillions of tokens.

    Returns (merges list[(a, b)], words DataFrame(word, count, syms)).
    """
    words = (
        docs.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "syms",
            F.concat(
                F.split(F.col("w"), "(?!$)"), F.array(F.lit("</w>"))
            ),
        )
        .persist()
    )
    merges: list[tuple[str, str]] = []
    prev: DataFrame | None = None
    for _ in range(n_merges):
        # the round's SINGLE action: the argmax scan also materializes
        # ``words`` into its (lazy) persist cache as a side effect
        pairs = (
            words.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if prev is not None:
            # ``words`` is cached now; its parent can go
            prev.unpersist()
            prev = None
        if not pairs or pairs[0]["n"] < 2:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        nxt = words.withColumn("syms", _merge_pair(F.col("syms"), a, b)).persist()
        prev, words = words, nxt
    return merges, words


def bpe_encode(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a trained BPE merge list: every merge is one array fold,
    and the whole list composes into a SINGLE fused projection — the
    encode pass over a 100 TB corpus is one shuffle-free scan no matter
    how many merges were learned.

    Returns (doc_id, n_words, n_bpe_tokens) — the compression the
    trained vocabulary achieves per document.
    """
    word = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    d = docs.select("doc_id", word)
    sym = F.concat(F.split(F.col("w"), "(?!$)"), F.array(F.lit("</w>")))
    for a, b in merges:
        sym = _merge_pair(sym, a, b)
    return (
        d.select("doc_id", F.size(sym).alias("n_sym"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
        )
    )


def unigram_commonness(
    docs: DataFrame,
    text_col: str = "text",
    rare_threshold: int = 3,
) -> DataFrame:
    """Corpus-global unigram commonness features per document — the
    log-free rendering of unigram-LM quality scoring.

    For each doc: ``n_tokens``, ``sum_cf`` (sum of corpus frequencies of
    its tokens), ``n_rare`` (tokens whose corpus frequency <
    ``rare_threshold``), ``avg_token_prob`` = sum_cf / (n_tokens · T)
    (the mean unigram probability of the doc's tokens, T = corpus token
    count) and ``rare_frac``. A true log-prob scorer is the same plan
    with ``F.log`` in the sum — deliberately NOT used here because
    transcendental rounding differs across engines, while these exact
    BIGINT sums with one final IEEE division are bit-reproducible
    (the engine's determinism contract).

    Scale: tokenize+explode is scan-fused; the token→frequency join
    shuffles on the token key, where natural-language skew ("the") is
    the classic hot-key case — AQE skew-join splits it, or broadcast
    the head of the vocabulary (it is Zipf-bounded) and join only the
    tail. One map-side-combinable groupBy(doc_id) closes the plan.
    """
    toks = (
        docs.select("doc_id", F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("t0"))
        .select("doc_id", F.lower(F.col("t0")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    cf = toks.groupBy("tok").agg(F.count("*").alias("cf"))
    total = toks.agg(F.count("*").alias("t_total"))
    per = (
        toks.join(cf, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("cf").alias("sum_cf"),
            F.sum((F.col("cf") < rare_threshold).cast("long")).alias("n_rare"),
        )
    )
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            "sum_cf",
            "n_rare",
            (
                F.col("sum_cf").cast("double")
                / (F.col("n_tokens").cast("double") * F.col("t_total").cast("double"))
            ).alias("avg_token_prob"),
            (F.col("n_rare").cast("double") / F.col("n_tokens").cast("double")).alias(
                "rare_frac"
            ),
        )
    )


def bigram_fluency(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    train: str = "train",
    holdout: str = "eval",
    key_col: str = "doc_id",
    text_col: str = "text",
    ppb: int = 1_000_000_000,
) -> DataFrame:
    """Bigram-LM fluency scoring of a holdout split against an LM whose
    counts come from the train split — the log-free rendering of the
    perplexity quality filter (score eval candidates with an n-gram LM
    trained on the corpus, drop the tail).

    For each holdout doc: ``n_bigrams``; ``mean_cond_ppb`` = mean of the
    train-LM conditional probabilities P(w2|w1) of its adjacent-token
    transitions, in exact parts-per-billion (unseen transitions score
    0); ``novel_frac`` = fraction of transitions whose bigram never
    occurs in train. A true log-perplexity is this plan with ``F.log``
    in the sum — deliberately NOT used: transcendental rounding differs
    across engines, while (pair_n · 10⁹) div prefix_n is exact integer
    arithmetic on both, summed exactly, with one final IEEE division
    (the engine's determinism contract). The multiply runs in
    DECIMAL(38,0) so a >9.2B-occurrence head bigram (possible in a
    100 TB train split) cannot overflow the int64 product.

    Scale: bigrams are built array-side (scan-fused, zero shuffle until
    the counts); the LM is two vocabulary-bounded aggregates; scoring is
    one equi-join per bigram occurrence on the (w1, w2) key — Zipf
    hot-key case, AQE skew-join territory — then a map-side-combinable
    groupBy(doc_id). No all-pairs anywhere; linear in corpus size.
    """
    from .sampling import split_column

    weights = weights or {train: 0.9, holdout: 0.1}
    tagged = docs.withColumn("__split", split_column(F.col(key_col), weights))

    def bigrams(df: DataFrame) -> DataFrame:
        return (
            df.select(
                key_col,
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"),
            )
            .select(
                key_col,
                F.explode(
                    F.expr(
                        "CASE WHEN size(t) >= 2 THEN "
                        "filter(transform(sequence(1, size(t) - 1),"
                        " i -> struct(t[i - 1] AS w1, t[i] AS w2)),"
                        " p -> p.w1 <> '' AND p.w2 <> '') "
                        "ELSE array() END"
                    )
                ).alias("bg"),
            )
            .select(key_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        )

    train_bg = bigrams(tagged.filter(F.col("__split") == train))
    pair = train_bg.groupBy("w1", "w2").agg(F.count("*").alias("pair_n"))
    prefix = pair.groupBy("w1").agg(F.sum("pair_n").alias("prefix_n"))
    ev = bigrams(tagged.filter(F.col("__split") == holdout))
    scored = (
        ev.join(pair, ["w1", "w2"], "left")
        .join(prefix, ["w1"], "left")
        .select(
            key_col,
            F.coalesce(
                F.expr(f"(CAST(pair_n AS DECIMAL(38,0)) * {ppb}) div prefix_n"),
                F.lit(0).cast("long"),
            ).alias("p_ppb"),
            F.col("pair_n").isNull().cast("long").alias("novel"),
        )
    )
    return (
        scored.groupBy(key_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("p_ppb").alias("sum_ppb"),
            F.sum("novel").alias("n_novel"),
        )
        .select(
            key_col,
            "n_bigrams",
            (
                F.col("sum_ppb").cast("double") / F.col("n_bigrams").cast("double")
            ).alias("mean_cond_ppb"),
            (
                F.col("n_novel").cast("double") / F.col("n_bigrams").cast("double")
            ).alias("novel_frac"),
        )
    )

"""Deterministic sampling and dataset splitting for corpus pipelines.

Train/val/test splits and down-sampling at 100 TB must be (a) a pure
column expression — no RNG state, no shuffle, re-runnable per task after
failure — and (b) stable under repartitioning and incremental appends: a
document's split assignment depends only on its key, never on row order
or partition layout.

Mechanism: bucket every row by a hex prefix of ``md5(key)`` and compare
against fixed hex thresholds. md5 renders identical lowercase hex in
every engine, and hex strings order lexicographically, so the same
assignment is expressible in plain ANSI SQL (the DuckDB oracles in
``plans/pipeline.py`` replay it verbatim). Granularity is 16^digits
buckets (default 65,536 — fraction resolution 1.5e-5).

Reference parity: the reference's samplers draw from seeded RNG streams
(enterprise-performance-tests DataGenerator.java:60-90); keyed-hash
assignment is the distributed-safe upgrade with the same determinism
contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(fraction: float, digits: int) -> str:
    space = 16**digits
    return format(max(0, min(int(fraction * space), space - 1)), f"0{digits}x")


def _bucket(key: Column, digits: int) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, digits)


def split_column(
    key: Column, weights: dict[str, float], digits: int = 4
) -> Column:
    """CASE expression assigning a split name per the weight map.

    Thresholds are cumulative weight fractions rendered as hex strings;
    assignment is the first threshold the key's md5 prefix sorts below,
    so splits are disjoint and exhaustive by construction.
    """
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    total = sum(weights.values())
    names = list(weights)
    prefix = _bucket(key, digits)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        cond = prefix < F.lit(_hex_threshold(cum, digits))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(names[-1])


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    digits: int = 4,
) -> DataFrame:
    """Attach a deterministic split column keyed on ``key_col``."""
    return df.withColumn(split_col, split_column(F.col(key_col), weights, digits))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, digits: int = 4
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows (keyed, not random):
    the same rows survive every run and every repartition, and a row's
    fate never changes when the corpus grows."""
    return df.filter(_bucket(F.col(key_col), digits) < _hex_threshold(fraction, digits))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    digits: int = 4,
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus rebalancing: e.g. keep
    100% of rare languages, 5% of the dominant one). Pure column
    predicate — no per-stratum jobs, one scan, no shuffle."""
    prefix = _bucket(F.col(key_col), digits)
    thr = None
    for stratum, frac in fractions.items():
        lit = F.lit(_hex_threshold(frac, digits))
        cond = F.col(stratum_col) == stratum
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = thr.otherwise(F.lit(_hex_threshold(default_fraction, digits)))
    return df.filter(prefix < thr)


def ngram_contamination(
    docs: DataFrame,
    weights: dict[str, float],
    train: str = "train",
    holdout: str = "eval",
    key_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Train→holdout contamination: for each holdout document, the
    fraction of its word k-shingles that also occur anywhere in the
    train split (the leakage check a training pipeline runs before an
    eval set ships).

    Shape: shingle explode → distinct train-shingle set → one equi-join
    on the shingle hash. The train set is shuffle-partitioned by
    shingle; no all-pairs blow-up, scales linearly in corpus size.
    Counts are exact integers; the final rate is one IEEE division.
    """
    from .dedup import shingles

    split = split_column(F.col(key_col), weights)
    tagged = docs.withColumn("__split", split)
    train_sh = (
        shingles(tagged.filter(F.col("__split") == train), k=k)
        .select("shingle")
        .distinct()
        .withColumnRenamed("shingle", "train_shingle")
    )
    hold_sh = shingles(tagged.filter(F.col("__split") == holdout), k=k)
    joined = hold_sh.join(
        train_sh, hold_sh["shingle"] == train_sh["train_shingle"], "left"
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.count("train_shingle").alias("n_contaminated"),
        (
            F.count("train_shingle").cast("double")
            / F.count("*").cast("double")
        ).alias("contamination"),
    )


def vocabulary(docs: DataFrame, text_col: str = "text", top_n: int = 50) -> DataFrame:
    """Corpus vocabulary with term/document frequencies, top-N by
    document frequency (deterministic total order: df desc, tf desc,
    term asc). The explode is map-side; both counts ride one partial
    aggregation on the term key."""
    term = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
    return (
        docs.select("doc_id", term)
        .groupBy("term")
        .agg(
            F.count("*").alias("term_freq"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("doc_freq"), F.desc("term_freq"), F.asc("term"))
        .limit(top_n)
    )


def exact_k_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exactly-k deterministic uniform-ish sample: global top-k by
    ``md5(key)``. The hash order is uncorrelated with any data order, so
    the k rows behave like a uniform draw but are reproducible and
    engine-portable. TakeOrderedAndProject keeps only k rows per
    partition before the single k-row merge — no global sort
    materializes (the fixed-size sample replaces hash_sample when the
    contract is a row COUNT, not a rate)."""
    return df.orderBy(F.md5(F.col(key_col).cast("string")), key_col).limit(k)


def per_group_cap(
    df: DataFrame, group_cols: list[str], key_col: str, cap: int
) -> DataFrame:
    """Contribution cap: keep at most ``cap`` rows per group, selected
    by the same deterministic hash order (so caps are stable across
    runs/appends). The anti-dominance pass of corpus building — no user,
    domain, or source may exceed its quota. One window over the group
    key; no join."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence-packing plan for training: concat documents in a
    deterministic shuffled order and chunk the token stream into
    fixed-``budget`` sequences (the GPT-style concat-and-chunk packer).

    Each doc is assigned to a shard (``key % n_shards``); within a shard
    docs are ordered by ``md5(key)`` (deterministic shuffle) and given
    their start offset in the shard's concatenated token stream via a
    running sum. ``seq_in_shard = floor(start_tok / budget)`` is the
    training sequence the doc starts in; ``n_seqs_spanned`` tells the
    chunker how many sequence boundaries the doc crosses.

    Scale design: the only wide op is one window partitioned by shard —
    at 100 TB you raise ``n_shards`` so each shard's stream fits an
    executor (shards pack independently and in parallel; packing quality
    is unaffected because the stream order inside a shard is what
    matters). No global sort, no driver state, stable under re-runs:
    assignment depends only on keys.
    """
    from pyspark.sql import Window

    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = docs.select(
        F.col(key_col),
        (F.col(key_col) % n_shards).cast("long").alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
        F.md5(F.col(key_col).cast("string")).alias("ord_key"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("ord_key", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    seq = F.floor(start / F.lit(budget)).cast("long")
    seq_end = F.floor((start + F.col("n_tokens") - 1) / F.lit(budget)).cast("long")
    return base.select(
        key_col,
        "shard",
        "n_tokens",
        start.cast("long").alias("start_tok"),
        seq.alias("seq_in_shard"),
        (seq_end - seq + 1).alias("n_seqs_spanned"),
    )


def mixture_resample(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, int],
    key_col: str = "doc_id",
) -> DataFrame:
    """Exact data-mixture resampling: select the largest corpus whose
    stratum proportions match integer target ``weights`` exactly, given
    per-stratum availability (the mixture-weighting step of a training
    run: "40% en, 20% de, ..." honoring what each domain actually has).

    All-integer arithmetic (no float thresholds, so the DuckDB oracle is
    bit-exact): achievable size ``N = min_d floor(n_d * W / w_d)``,
    quota ``k_d = floor(w_d * N / W)``, then the ``k_d`` smallest rows
    per stratum by ``(md5(key), key)`` — a deterministic, append-stable
    lottery. Strata absent from ``weights`` are dropped.

    Scale: counts + quotas are tiny broadcasts; the per-stratum rank is a
    window partitioned by stratum. With few huge strata, the 100 TB plan
    is two-phase: pre-filter each stratum with a hash threshold slightly
    above k_d/n_d (pure predicate, no shuffle), then rank only the ~k_d
    survivors — same result whenever the margin holds, at a fraction of
    the sort.
    """
    from pyspark.sql import Window

    wdf = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    w_total = sum(weights.values())
    counts = (
        df.filter(F.col(stratum_col).isin(*weights))
        .groupBy(stratum_col)
        .agg(F.count("*").alias("n_d"))
        .withColumn("w_d", wdf[F.col(stratum_col)].cast("long"))
    )
    n_ach = counts.select(
        F.min(F.floor(F.col("n_d") * w_total / F.col("w_d"))).alias("n_total")
    )
    quotas = counts.crossJoin(F.broadcast(n_ach)).select(
        stratum_col,
        F.floor(F.col("w_d") * F.col("n_total") / w_total).cast("long").alias("quota"),
    )
    rn = F.row_number().over(
        Window.partitionBy(stratum_col).orderBy(
            F.md5(F.col(key_col).cast("string")), key_col
        )
    )
    return (
        df.filter(F.col(stratum_col).isin(*weights))
        .withColumn("rn", rn)
        .join(F.broadcast(quotas), stratum_col)
        .filter(F.col("rn") <= F.col("quota"))
        .drop("rn", "quota")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle: every row gets a
    stable ``shard`` (``key % n_shards`` — static membership keeps data
    locality across epochs) and a seed-dependent ``pos`` inside its
    shard (rank by ``md5(seed|key)`` — a new seed is a new permutation).

    Scale design: no global sort — the only wide op is one window
    partitioned by shard, so shards permute independently and in
    parallel; at 100 TB raise ``n_shards`` until a shard fits an
    executor. Assignment depends only on (seed, key): re-runs and
    retries are stable, and a reader streams epoch order by scanning
    shards sorted by ``pos``.
    """
    from pyspark.sql import Window

    key = F.col(key_col)
    ord_key = F.md5(F.concat_ws("|", F.lit(str(seed)), key.cast("string")))
    shard = (key % n_shards).cast("int")
    w = Window.partitionBy(shard).orderBy(ord_key, key)
    return df.select(
        key_col,
        shard.alias("shard"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


def token_budget_sample(
    docs: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TOKEN-budget mixture sampling: per stratum, keep whole documents
    in deterministic ``md5(key)`` order until the stratum's token
    budget is filled (the 'sample 10B tokens per domain' pretraining
    op — budgets are in tokens, not documents, so long docs consume
    more quota).

    A doc is kept while the running token total BEFORE it is under
    budget (greedy whole-doc fill: the first overshooting doc is kept,
    then the stratum closes — deterministic, append-stable, and at most
    one doc over budget per stratum). One window per stratum; the
    100 TB path pre-filters each stratum with a hash threshold above
    budget/avg_tokens before ranking, like ``mixture_resample``.

    NULL-stratum contract (r12 NULL-input sweep): budgets are keyed by
    stratum VALUE, and a NULL stratum matches no key (``col == lit(x)``
    is NULL, like any SQL equi-match) — NULL-stratum docs are excluded
    from the sample, even if the budgets dict carries a ``None`` entry.
    Oracles mirror with ``stratum IS NOT NULL``.
    """
    from pyspark.sql.window import Window

    from ..functions.text import n_tokens as _n_tokens

    b_items = list(budgets.items())
    budget_col = F.lit(None).cast("long")
    for stratum, b in b_items:
        budget_col = F.when(F.col(stratum_col) == stratum, F.lit(b)).otherwise(
            budget_col
        )
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    toks = _n_tokens(F.col(text_col))
    return (
        docs.withColumn("__n_tok", toks)
        .withColumn(
            "__before",
            F.coalesce(
                F.sum("__n_tok").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("__budget", budget_col)
        .filter(F.col("__budget").isNotNull() & (F.col("__before") < F.col("__budget")))
        .drop("__before", "__budget")
        .withColumnRenamed("__n_tok", "n_tok")
    )


def curriculum_phases(
    df: DataFrame,
    key_col: str = "doc_id",
    length_col: str = "n_chars",
    seed: int = 13,
) -> DataFrame:
    """Curriculum assignment (easy→hard training order): phase 0 =
    shortest quartile, phase 1 = interquartile, phase 2 = top quartile
    of ``length_col``; ``sort_key`` = md5(seed|key) gives the
    deterministic within-phase order. Quartiles use EXACT binary
    fractions (0.25/0.75) so the linear interpolation is engine-exact.

    Scale: one percentile aggregate (1-row broadcast) + a scan-fused
    projection — no global window; the materialized curriculum order is
    a write-time ``partitionBy(phase) + sortWithinPartitions(sort_key)``.
    """
    q = df.agg(
        F.percentile(length_col, F.lit(0.25)).alias("p25"),
        F.percentile(length_col, F.lit(0.75)).alias("p75"),
    )
    return df.crossJoin(F.broadcast(q)).select(
        key_col,
        F.when(F.col(length_col) <= F.col("p25"), 0)
        .when(F.col(length_col) <= F.col("p75"), 1)
        .otherwise(2)
        .cast("int")
        .alias("phase"),
        F.md5(
            F.concat_ws("|", F.lit(str(seed)), F.col(key_col).cast("string"))
        ).alias("sort_key"),
    )


def source_interleave(
    df: DataFrame,
    key_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 11,
) -> DataFrame:
    """Round-robin interleave across sources: position p·S + s for the
    p-th doc (seed-keyed md5 rank) of source-index s among S sources —
    a mixture reader that never lets one source run ahead (domain-
    balanced batch composition without a global shuffle).

    Scale: the per-source rank is a window PARTITIONED by source
    (sources permute independently); the source-index window runs on
    the DISTINCT-sources dimension (a handful of rows). No global
    window touches the fact table.

    NULL-source contract (r12 NULL-input sweep): a NULL source can
    never join the source-index dimension (SQL equi-join), so before
    this filter NULL-source docs silently vanished FROM THE OUTPUT
    while NULL still held a rotation slot in ``n_sources`` — leaving
    unfillable holes in the position sequence, and the slot's INDEX
    differed across engines (Spark orders NULL first, DuckDB last).
    NULL-source docs are excluded up front on both sides: the
    interleave covers attributable docs only, positions are dense.
    """
    from pyspark.sql import Window

    df = df.filter(F.col(source_col).isNotNull())
    key = F.col(key_col)
    src_idx = (
        df.select(source_col)
        .distinct()
        .withColumn(
            "src_idx",
            (F.row_number().over(Window.orderBy(source_col)) - 1).cast("long"),
        )
    )
    n_sources = src_idx.agg(F.count("*").alias("n_sources"))
    ord_key = F.md5(F.concat_ws("|", F.lit(str(seed)), key.cast("string")))
    w = Window.partitionBy(source_col).orderBy(ord_key, key)
    return (
        df.withColumn("rn", (F.row_number().over(w) - 1).cast("long"))
        .join(F.broadcast(src_idx), source_col)
        .crossJoin(F.broadcast(n_sources))
        .select(
            key_col,
            source_col,
            "rn",
            (F.col("rn") * F.col("n_sources") + F.col("src_idx"))
            .cast("long")
            .alias("interleave_pos"),
        )
    )


def negative_edge_samples(
    edges: DataFrame, *, k: int = 3, seed: int = 42
) -> DataFrame:
    """Deterministic negative sampling for link-prediction training:
    for every positive edge (src, dst), draw ``k`` pseudo-random
    candidate endpoints from the destination-node universe via a keyed
    hash (md5-derived index mod |nodes|, portable to SQL), then
    anti-join the candidates against the real edge set so no negative
    is accidentally positive. Collisions are DROPPED, not resampled
    (k_eff ≤ k per edge) — resampling loops are data-dependent and
    break both determinism and the fixed plan shape; at training scale
    the loss is negligible and uniform.

    Returns (src, try_idx, neg_dst). The node index is a rank over the
    destination DIMENSION (distinct dst set — window is
    dimension-sized; at billion-node scale swap for a precomputed
    zip-with-index table, same contract). One hash projection ×k, one
    broadcast index join, one anti-join against the edges — no
    per-row Python, no RNG in the plan (retried tasks re-derive the
    same samples).
    """
    from pyspark.sql.window import Window

    nodes = edges.select(F.col("dst").alias("node_id")).distinct()
    w = Window.orderBy("node_id")
    idx = nodes.withColumn("nidx", (F.row_number().over(w) - 1).cast("long"))
    n_nodes = idx.count()
    cand = (
        edges.select("src")
        .distinct()
        .select(
            "src",
            F.explode(
                F.array(*[F.lit(i) for i in range(k)])
            ).alias("try_idx"),
        )
        .withColumn(
            "nidx",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(str(seed)),
                            F.col("src").cast("string"),
                            F.col("try_idx").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % n_nodes,
        )
    )
    withdst = cand.join(F.broadcast(idx), "nidx").select(
        "src", "try_idx", F.col("node_id").alias("neg_dst")
    )
    return withdst.join(
        edges.select("src", F.col("dst").alias("neg_dst")),
        ["src", "neg_dst"],
        "left_anti",
    ).filter(F.col("src") != F.col("neg_dst"))


def bloom_contamination(
    docs: DataFrame,
    weights: dict[str, float],
    train: str = "train",
    holdout: str = "eval",
    key_col: str = "doc_id",
    k: int = 5,
    m_words: int = 4096,
    k_hashes: int = 4,
) -> DataFrame:
    """Contamination screen via a Bloom-filter pre-filter + exact
    verify — the SCALE path of ``ngram_contamination``. The exact op
    shuffle-joins EVERY holdout shingle against the train-shingle set;
    at 100 TB that is a full-corpus shuffle both sides. Here the train
    set is summarized into an m-bit Bloom filter (relational form:
    ≤ ``m_words`` rows of (word_idx, word) — built with a map-side-
    combinable ``bit_or`` groupBy, so per-partition partials merge
    associatively like every sketch in this engine), the filter is
    BROADCAST, and each holdout shingle probes it with ``k_hashes``
    broadcast-hash joins — zero shuffle until the per-doc rollup. Only
    the maybe-present candidates (true hits + the bounded false-positive
    tail) reach the exact verify join, so the expensive shuffle touches
    candidates, not the corpus.

    Hashing: ONE md5 per shingle; the ``k_hashes`` (≤ 4) bit positions
    are disjoint 28-bit hex slices of that digest (md5's bits are
    uniform and independent, the standard multi-slice Bloom trick) —
    the original salted-md5-per-hash form spent 4 digests per shingle
    on both build and probe and measured 6.2x the oracle at sf1; one
    digest + slicing brings the whole screen under 2x. The train side
    is deliberately NOT distinct-ed: ``bit_or`` is idempotent and the
    exact verify is a LEFT SEMI join (exists semantics), so cross-doc
    duplicate shingles change nothing while skipping a full-corpus
    dedup shuffle (plus a second evaluation of the explode branch).

    Words hold 63 usable bits (bit index = pos % 63): DuckDB raises on
    ``1::BIGINT << 63`` while Spark wraps to the sign bit, so bit 63 is
    unusable cross-engine. All counts exact integers; the final
    contamination rate (n_exact / n_shingles — identical to the exact
    operator's definition) is the single IEEE divide.

    Output per holdout doc: n_shingles, n_maybe (Bloom candidates),
    n_exact (verified), n_false_pos (= n_maybe - n_exact, the measured
    FP count the m/n/k sizing bounds), contamination.
    """
    from .dedup import shingles

    if k_hashes > 4:
        raise ValueError("k_hashes > 4: only four 28-bit md5 slices")
    m_bits = m_words * 63
    split = split_column(F.col(key_col), weights)
    tagged = docs.withColumn("__split", split)
    tr_sh = shingles(tagged.filter(F.col("__split") == train), k=k).select(
        "shingle"
    )

    def pos(i: int) -> Column:
        return (
            F.conv(
                F.substring(F.md5(F.col("shingle")), 1 + 7 * i, 7), 16, 10
            ).cast("long")
            % m_bits
        )

    bloom = (
        tr_sh.select(
            F.explode(F.array(*[pos(i) for i in range(k_hashes)])).alias("pos")
        )
        .select(
            F.expr("pos div 63").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias(
                "bitmask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bitmask").alias("word"))
    )

    ev = shingles(tagged.filter(F.col("__split") == holdout), k=k)
    probe = ev
    hit_cols = []
    for i in range(k_hashes):
        probe = probe.withColumn(f"__p{i}", pos(i))
        bl = bloom.select(
            F.col("word_idx").alias(f"__wi{i}"), F.col("word").alias(f"__w{i}")
        )
        probe = probe.join(
            F.broadcast(bl),
            F.expr(f"__p{i} div 63") == F.col(f"__wi{i}"),
            "left",
        )
        hit_cols.append(
            F.coalesce(F.col(f"__w{i}"), F.lit(0))
            .bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 63 AS INT))")
            )
            != 0
        )
    maybe = hit_cols[0]
    for c in hit_cols[1:]:
        maybe = maybe & c
    cand = probe.select(
        key_col, "shingle", maybe.cast("long").alias("maybe")
    )
    per_doc = cand.groupBy(key_col).agg(
        F.count("*").alias("n_shingles"), F.sum("maybe").alias("n_maybe")
    )
    ver = (
        cand.filter(F.col("maybe") == 1)
        .select(key_col, "shingle")
        .join(tr_sh, "shingle", "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").cast("long").alias("n_exact"))
    )
    return per_doc.join(ver, key_col, "left").select(
        key_col,
        "n_shingles",
        "n_maybe",
        F.coalesce(F.col("n_exact"), F.lit(0)).cast("long").alias("n_exact"),
        (F.col("n_maybe") - F.coalesce(F.col("n_exact"), F.lit(0)))
        .cast("long")
        .alias("n_false_pos"),
        (
            F.coalesce(F.col("n_exact"), F.lit(0)).cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("contamination"),
    )

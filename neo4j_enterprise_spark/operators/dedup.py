"""Deduplication operators for the training-data pipeline.

Scale ladder (each step trades recall for cost at 100 TB):
1. ``exact_dup_groups`` — digest groupBy; one shuffle on a 16-byte key.
2. ``minhash_lsh_pairs`` — shingle → minhash → band-bucket join; candidate
   pairs only, never the O(n²) cross join.
3. ``simhash64`` — 64-bit near-dup signature; hamming-ball lookup.
4. n-gram Jaccard verify — exact similarity on LSH candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# deterministic 64-bit mixing constants for the minhash permutation family
_MERSENNE = (1 << 31) - 1  # keeps a*x within int64 (no 128-bit mulmod needed)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content digest per document (md5 — portable across engines)."""
    return docs.withColumn("fingerprint", F.md5(F.col(text_col)))


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: groups of byte-identical documents.

    Returns (content_hash, keep_doc_id = min id, n_copies) for groups with
    more than one member. Partial aggregation makes this one narrow
    shuffle regardless of corpus size.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").cast("long").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def dedup_keep_first(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup materialized: keep the min-doc_id representative of
    every content group (the actual 100 TB dedup job)."""
    w_hash = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    keep = w_hash.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    return w_hash.join(keep, ["content_hash", "doc_id"], "left_semi").drop("content_hash")


def dedup_incremental(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """INCREMENTAL exact dedup — the production ingest path: a new batch
    is deduped against the standing corpus's fingerprint INDEX instead of
    re-scanning the corpus. ``corpus_index`` is (content_hash) — the
    persisted digest table a 100 TB pipeline maintains (one row per
    distinct document ever seen; kilobytes per million docs vs re-reading
    the corpus).

    Two steps, both narrow: (1) in-batch dedup (keep min doc_id per
    digest — same rule as ``dedup_keep_first`` so re-runs are
    idempotent), (2) anti-join the survivors against the index. Returns
    the accepted new docs; appending their digests to the index is the
    caller's write (exactly the base/delta contract of the snapshot
    diff operators).
    """
    hashed = new_docs.withColumn("content_hash", F.md5(F.col(text_col)))
    in_batch = hashed.join(
        hashed.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id")),
        ["content_hash", "doc_id"],
        "left_semi",
    )
    return in_batch.join(
        corpus_index.select("content_hash"), "content_hash", "left_anti"
    ).drop("content_hash")


def shingles(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Word k-shingles per doc, distinct per doc: (doc_id, shingle).

    Built from posexplode + k-1 LEAD columns over ONE per-doc sort (the
    winnow_fingerprints gram shape) — all whole-stage-codegen JVM. The
    original array-side form (`transform(sequence(...), i ->
    concat_ws(slice(tokens, i+1, k)))`) was zero-shuffle but
    lambda-interpreted: measured 24.4s vs 1.9s at sf1 for the SAME
    output (the engine's ~13x interpreted-HOF tax — see phrase_search).
    The per-doc distinct reuses the window's doc_id partitioning
    (partitioning on a subset of the grouping keys satisfies the
    clustered distribution), so the whole op is ONE Exchange; every
    downstream consumer (contamination joins, minhash groupBys) shuffles
    anyway, so the token-stream shuffle is not additional end-to-end.

    Docs shorter than k tokens yield their single full-text shingle
    (concat_ws skips the null leads), matching the array form's
    `sequence(0, greatest(n-k, 0))` edge semantics.
    """
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    sh = toks.select(
        "doc_id",
        "pos",
        F.concat_ws(" ", *parts).alias("shingle"),
        F.lead("tok", k - 1).over(w).alias("__last"),
    ).filter(F.col("__last").isNotNull() | (F.col("pos") == 0))
    return sh.select("doc_id", "shingle").distinct()


def minhash_params(num_hashes: int = 32, seed: int = 42) -> list[tuple[int, int]]:
    """The (a_i, b_i) permutation constants — exposed so the DuckDB
    oracle can embed the identical family as a VALUES list."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32, seed: int = 42, portable: bool = False
) -> DataFrame:
    """MinHash signature per doc: (doc_id, sig ARRAY<BIGINT>[num_hashes]).

    Permutations h_i(x) = (a_i * x + b_i) mod M over the shingle hash;
    min per hash via groupBy — all JVM-side, no UDFs. One shuffle on
    doc_id. ``portable=True`` swaps the xxhash64 base hash for a 60-bit
    md5-derived one (bit-identical across engines, so the whole
    signature family is SQL-oracle-checkable; xxhash64 stays the faster
    production default).
    """
    params = minhash_params(num_hashes, seed)
    base = (
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
        if portable
        else F.abs(F.xxhash64(F.col("shingle")))
    )
    hashed = sh.select("doc_id", base.alias("hx"))
    mins = [
        F.min(
            (F.col("hx") % F.lit(_MERSENNE) * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE)
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = hashed.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


# Default quadratic-hot-spot guard for banded-LSH pair joins: a full
# bucket costs cap^2/2 ~ 0.5M pair evaluations - bounded per-task work.
# SQL oracles must mirror whatever cap the Spark plan uses (QUALIFY).
MAX_BUCKET_DEFAULT = 1024


def drop_oversized_buckets(
    buckets: DataFrame,
    max_bucket_size: int | None,
    keys: tuple[str, ...] = ("band", "bucket"),
) -> DataFrame:
    """Guard every banded-LSH self-join against degenerate buckets.

    A bucket of n members yields n·(n-1)/2 candidate pairs — one
    pathological bucket (boilerplate docs sharing a band signature) is
    a quadratic hot spot that AQE skew-split can spread across tasks
    but not shrink. Production LSH systems bound it: buckets with MORE
    than ``max_bucket_size`` members are dropped from candidate
    generation entirely (their members were never going to be usefully
    disambiguated by that band — with standard multi-band configs, any
    genuinely similar pair still meets in its other, smaller bands).
    ``oversized_bucket_report`` on the same frame names what was
    dropped. ``None`` disables the guard. One window count over the
    same (band, bucket) shuffle key the pair join uses — no extra
    shuffle shape at scale.
    """
    if max_bucket_size is None:
        return buckets
    w = Window.partitionBy(*[F.col(c) for c in keys])
    return (
        buckets.withColumn("__bsz", F.count("*").over(w))
        .filter(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )


def oversized_bucket_report(
    buckets: DataFrame,
    max_bucket_size: int,
    keys: tuple[str, ...] = ("band", "bucket"),
) -> DataFrame:
    """The dropped-bucket report for :func:`drop_oversized_buckets`:
    (keys..., bucket_size) for every bucket OVER the cap — the
    monitoring view that tells a curator their banding config is
    undersized for the corpus (the fix is more bands/planes or a
    pre-dedup pass, not raising the cap)."""
    return (
        buckets.groupBy(*[F.col(c) for c in keys])
        .agg(F.count("*").cast("long").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
    portable: bool = False,
    sig: DataFrame | None = None,
    max_bucket_size: int | None = MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    bands × rows layout (rows = num_hashes // bands); docs sharing any
    band hash become a candidate pair. The band-bucket self-join touches
    only colliding buckets — this is the O(n·collisions) scale path, not
    O(n²). Returns (doc_a, doc_b) with doc_a < doc_b, distinct.

    ``portable=True`` uses the md5 base hash and keeps the band bucket
    as the raw joined signature string (no re-hash), so every step has
    an exact SQL twin.

    ``sig`` — a precomputed (doc_id, sig) signature frame (as produced
    by :func:`minhash_signatures` with the SAME num_hashes/seed/
    portable); when given, the shingle→signature pipeline is not
    rebuilt (callers that also need the signatures — e.g. the
    calibration report — compute them once and share).

    ``max_bucket_size`` — buckets with more members are DROPPED from
    candidate generation (see :func:`drop_oversized_buckets`; the SQL
    oracles mirror the cap with a QUALIFY window count). Pairs whose
    only collision is an oversized bucket are NOT returned — the
    documented recall trade that keeps one degenerate bucket from
    going quadratic at 100 TB.
    """
    rows = num_hashes // bands
    if sig is None:
        sig = minhash_signatures(
            shingles(docs, text_col, k), num_hashes, seed, portable
        )
    def _bucket(b: int) -> F.Column:
        joined = F.concat_ws(
            ",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]
        )
        return joined if portable else F.xxhash64(joined).cast("string")

    band_cols = [
        F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
        for b in range(bands)
    ]
    buckets = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    buckets = drop_oversized_buckets(buckets, max_bucket_size)
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Exact Jaccard similarity for candidate pairs (verify stage after
    LSH): |A∩B| / |A∪B| over word k-shingles. Joins shingle sets only for
    candidate docs — the expensive exact metric never runs on the full
    cross product."""
    sh = shingles(docs, text_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # intersection via join on (pair, shingle)
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return out


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc from word-level xxhash64 features.

    Bit-vote accumulation is expressed as 64 conditional sums over the
    exploded token set — heavy but fully JVM-side; at scale, prefer the
    Pandas-UDF variant if the explode dominates. Returns (doc_id,
    simhash BIGINT).
    """
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    # bit 63 is the sign bit of the BIGINT hash: test h < 0 instead of a
    # (1<<63) literal, which overflows LongType.
    votes = [
        F.sum(
            F.when(
                (F.col("h") < 0) if i == 63 else (F.col("h").bitwiseAND(F.lit(1 << i)) != 0),
                1,
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tokens.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(63):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(0)
    sim = sim + F.when(F.col("b63") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(0)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_banded_pairs(
    signatures: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 60,
    max_bucket_size: int | None = MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """Ladder step 3's retrieval half: near-dup *pairs* from simhash
    signatures via banded hamming lookup (`dedup.py` module docstring).

    The signature is split into ``bands`` contiguous chunks; candidate
    pairs are docs agreeing on AT LEAST ONE band (equi-join on
    ``(band, chunk value)`` — never an all-pairs comparison), then
    verified with ``bit_count(a XOR b) <= max_hamming``. By pigeonhole
    the retrieval is EXACT whenever ``max_hamming < bands`` (≤ k bit
    flips cannot touch all b > k bands), which the default 3/4 config
    satisfies — the standard 64-bit/k=3 production setting. Scale shape:
    one explode (×bands), one equi-join on the band key whose cost is
    O(collisions), one aggregate to dedupe multi-band matches.

    Input: (doc_id, simhash). Returns (doc_a, doc_b, hamming) with
    doc_a < doc_b, sorted output left to the caller.

    ``max_bucket_size`` drops oversized (band, chunk) buckets before
    the pair join (:func:`drop_oversized_buckets` — the quadratic-
    hot-spot guard; oracle mirrors it via QUALIFY). NOTE the
    pigeonhole-exactness claim above holds only for pairs all of whose
    shared bands are within the cap; pairs living solely in dropped
    buckets are not returned — disclosed recall trade.
    """
    band_width = bits // bands
    mask = (1 << band_width) - 1
    banded = signatures.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * band_width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    banded = drop_oversized_buckets(banded, max_bucket_size, keys=("band", "chunk"))
    left = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "chunk"
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "chunk"
    )
    cand = (
        left.join(right, ["band", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")  # a pair can collide in several bands
        .agg(F.first("sim_a").alias("sim_a"), F.first("sim_b").alias("sim_b"))
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def simhash_md5_60(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash with a *portable* token hash: the top 15 hex chars
    of md5 (md5 is bit-identical across engines, so the full bit-vote
    pipeline is SQL-oracle-checkable — unlike ``simhash64``'s xxhash64,
    which has no DuckDB twin). Same accumulation plan as ``simhash64``;
    returns (doc_id, simhash BIGINT in [0, 2^60))."""
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(60)
    ]
    agg = tokens.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(60):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return agg.select("doc_id", sim.alias("simhash"))


def span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    block: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Duplicated-span removal (the RefinedWeb/CCNet "repeated line"
    filter generalized to token blocks): cut each document into
    non-overlapping ``block``-token spans, count every span corpus-wide,
    and strip spans occurring ``min_count``+ times, reassembling the
    surviving text in order.

    Ladder step 1.5 — finer-grained than whole-document exact dedup
    (step 1), far cheaper than MinHash (step 2): the corpus-wide span
    count is a WINDOW over the span-partitioned shuffle rather than a
    groupBy + self-join, so the (expensive, higher-order-function)
    span explode is computed ONCE and the spans shuffle twice total
    (by span key, then by doc) — measured 2.1x faster at sf1 than the
    count-and-join-back form, which evaluates the explode in both join
    branches. The span key can be digested to 16 bytes at scale so
    shuffle width is independent of span length. No all-pairs anywhere.

    Returns (doc_id, n_blocks, n_removed, clean_md5) where clean_md5
    digests the reassembled surviving text (portable md5 so the full
    remove-and-reassemble pipeline is SQL-oracle-checkable).
    """
    # span construction is row-local string slicing; the Catalyst
    # higher-order form (transform/sequence/slice/concat_ws explode)
    # runs interpreted and dominated the query (measured 4.8x slower at
    # sf1), so it is an Arrow mapInPandas pass — same semantics as
    # split-on-single-space (empties preserved, like F.split(col, " "))
    import pandas as pd

    def _spanify(batches):
        for pdf in batches:
            ids: list = []
            idxs: list = []
            blocks: list = []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                # NULL-text contract (r12 sweep): no content -> no spans
                # -> doc absent from the report, matching the oracle's
                # explicit filter. Empty text still yields one '' block
                # (split-on-space semantics). Never crashes on NULL.
                if text is None:
                    continue
                toks = text.split(" ")
                nb = max((len(toks) + block - 1) // block, 1)
                for i in range(nb):
                    ids.append(did)
                    idxs.append(i)
                    blocks.append(" ".join(toks[i * block : (i + 1) * block]))
            yield pd.DataFrame(
                {"doc_id": ids, "block_idx": idxs, "block": blocks}
            )

    spans = docs.select("doc_id", text_col).mapInPandas(
        _spanify, "doc_id long, block_idx int, block string"
    )
    joined = spans.withColumn(
        "cnt", F.count("*").over(Window.partitionBy("block"))
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(
                F.col("cnt") < min_count, F.struct("block_idx", "block")
            )
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum((F.col("cnt") >= min_count).cast("long")).alias("n_removed"),
        F.md5(
            F.concat_ws(" ", F.transform(kept, lambda x: x["block"]))
        ).alias("clean_md5"),
    )


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    boundary_hex: str = "0",
) -> DataFrame:
    """Content-defined chunking: cut each document where the rolling
    hash of the trailing 3-token window starts with ``boundary_hex``
    (md5 — portable), giving ~16-token average chunks whose BOUNDARIES
    MOVE WITH THE CONTENT. Unlike fixed blocks (``span_dedup``), an
    insertion shifts only the chunk it lands in — every later chunk
    re-aligns, so cross-version/near-copy dedup keeps matching.

    Returns (doc_id, chunk_id, chunk_md5): one narrow shuffle (the
    per-doc window) + one groupBy; chunk content is digested before it
    ever shuffles.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        "|", F.lag("tok", 2, "").over(w), F.lag("tok", 1, "").over(w), F.col("tok")
    )
    flagged = toks.withColumn(
        "boundary",
        ((F.col("pos") == 0) | (F.substring(F.md5(gram), 1, len(boundary_hex)) == boundary_hex)).cast("int"),
    ).withColumn(
        "chunk_id",
        F.sum("boundary").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
    return (
        flagged.groupBy("doc_id", "chunk_id")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("chunk_md5")
        )
    )


def ngram_containment(
    docs: DataFrame, pairs: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Exact CONTAINMENT for candidate pairs: |A∩B| / min(|A|, |B|) over
    word k-shingles — the quote/subset detector. A short document pasted
    inside a long one scores near 1.0 here while its Jaccard stays tiny
    (the union is dominated by the long doc), so a dedup ladder needs
    BOTH verifiers. Same candidate-only join shape as ``ngram_jaccard``
    — never the cross product.
    """
    sh = shingles(docs, text_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / F.least(F.col("n_a"), F.col("n_b")).cast("double")
            ).alias("containment"),
        )
    )


def minhash_buckets(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """The persistable LSH INDEX side of MinHash dedup: (doc_id, band,
    bucket) rows — what a production pipeline stores per corpus shard
    so new batches dedup against the index instead of re-scanning
    history (the near-dup analog of ``dedup_incremental``'s digest
    index). Same signature family as ``minhash_lsh_pairs``."""
    rows = num_hashes // bands
    sig = minhash_signatures(shingles(docs, text_col, k), num_hashes, seed, portable)

    def _bucket(b: int):
        joined = F.concat_ws(
            ",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]
        )
        return joined if portable else F.xxhash64(joined).cast("string")

    band_cols = [
        F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
        for b in range(bands)
    ]
    return sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_incremental_pairs(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """INCREMENTAL near-dup: candidate pairs between a NEW batch and
    the standing corpus' persisted bucket index (``minhash_buckets``
    output) — the batch's buckets equi-join the index on
    (band, bucket), so cost is O(batch + collisions) and the corpus
    text is never re-read. Returns (new_doc, corpus_doc) distinct.
    The in-batch pairs are ``minhash_lsh_pairs`` on the batch alone;
    appending the batch's buckets to the index is the caller's write
    (same base/delta contract as ``dedup_incremental``)."""
    nb = minhash_buckets(
        new_docs, text_col, k, num_hashes, bands, seed, portable
    ).select(F.col("doc_id").alias("new_doc"), "band", "bucket")
    ib = index.select(F.col("doc_id").alias("corpus_doc"), "band", "bucket")
    return (
        nb.join(ib, ["band", "bucket"])
        .filter(F.col("new_doc") != F.col("corpus_doc"))
        .select("new_doc", "corpus_doc")
        .distinct()
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    SIGMOD'03 — the MOSS algorithm): per doc, hash every k-token gram,
    slide a w-gram window, and SELECT the minimum hash in each window
    (ties broken by the RIGHTMOST position — robust winnowing), then
    dedupe selections. Guarantee: any shared token run of length
    >= w + k - 1 between two documents yields at least one shared
    selected fingerprint, while only ~2/(w+1) of grams are kept —
    position-robust overlap detection at a fraction of the shingle
    volume (the property plain digest fingerprinting and MinHash
    sketches don't give: selected fingerprints carry POSITIONS, so
    matches localize).

    Determinism: the gram hash is the top 40 bits of md5 (the portable
    hash family); hash and position are packed into ONE BIGINT
    ``sel_key = h * 2^20 + (2^20 - 1 - pos)`` so a plain window MIN
    implements argmin-with-rightmost-tiebreak — no engine-specific
    min_by/arg_min semantics. Positions therefore must fit 20 bits
    (docs up to 1,048,575 tokens — chunk longer docs upstream).

    Scale: tokenization is one posexplode (linear); grams come from
    k-1 LEAD columns and the window min reuses the SAME
    (partitionBy doc, orderBy pos) sort — one shuffle partitioned BY
    DOCUMENT, never a global sort; selection then a per-doc distinct.
    Output: (doc_id, fp_hash, fp_pos) selected fingerprints.
    """
    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            key_col,
            F.posexplode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("pos", "tok"),
        )
    )
    wlead = Window.partitionBy(key_col).orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(wlead) for i in range(1, k)
    ]
    grams = toks.select(
        key_col,
        "pos",
        F.when(
            F.lead("tok", k - 1).over(wlead).isNotNull(),
            F.concat_ws(" ", *parts),
        ).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    h = F.conv(F.substring(F.md5("gram"), 1, 10), 16, 10).cast("long")
    # loud guard: positions beyond 20 bits would silently corrupt the
    # packed argmin ordering — fail the job instead (chunk upstream).
    pos_ok = F.when(
        F.col("pos") <= 1048575, F.col("pos").cast("long")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("winnow_fingerprints: token position > 1048575 in doc "),
                F.col(key_col).cast("string"),
                F.lit(" — chunk documents upstream (20-bit position pack)"),
            )
        ).cast("long")
    )
    keyed = grams.select(
        key_col,
        "pos",
        (h * F.lit(1048576).cast("long")
         + (F.lit(1048575) - pos_ok)).alias("hp"),
    )
    wmin = Window.partitionBy(key_col).orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        keyed.select(
            key_col,
            F.min("hp").over(wmin).alias("sel_key"),
            F.count("*").over(wmin).alias("n_in_win"),
        )
        .filter(F.col("n_in_win") == w)
        .select(key_col, "sel_key")
        .distinct()
    )
    return sel.select(
        key_col,
        F.expr("sel_key div 1048576").alias("fp_hash"),
        (F.lit(1048575) - F.col("sel_key") % 1048576)
        .cast("long")
        .alias("fp_pos"),
    )


def winnow_overlap(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    df_cap: int = 10,
    top: int = 20,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-overlap report over winnowed fingerprints (the MOSS
    match step): docs sharing selected fingerprints are paired through
    an equi-join ON THE FINGERPRINT HASH — never all-pairs — and
    ranked by shared-fingerprint count. Fingerprints appearing in more
    than ``df_cap`` documents are dropped first (boilerplate /
    stop-fingerprints), which both denoises the report and bounds the
    join fanout at <= df_cap^2 pairs per hash — the same
    bucket-bounded-candidates contract as MinHash-LSH and ppjoin.

    overlap = n_shared / least(n_a, n_b) (containment over the capped
    fingerprint space; n_a/n_b are the docs' distinct capped-hash
    counts) — exact integers with ONE final IEEE divide. Total order
    (n_shared DESC, doc_a, doc_b) before LIMIT.
    """
    fps = (
        winnow_fingerprints(docs, k=k, w=w, key_col=key_col,
                            text_col=text_col)
        .select(key_col, "fp_hash")
        .distinct()
    )
    rare = fps.groupBy("fp_hash").agg(
        F.count("*").alias("df")
    ).filter(F.col("df") <= df_cap)
    capped = fps.join(rare.select("fp_hash"), "fp_hash")
    sizes = capped.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_fp")
    )
    a = capped.select(F.col(key_col).alias("doc_a"), "fp_hash")
    b = capped.select(F.col(key_col).alias("doc_b"), "fp_hash")
    pairs = (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col(key_col).alias("doc_a"),
                      F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col(key_col).alias("doc_b"),
                      F.col("n_fp").alias("n_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("overlap"),
        )
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
        .limit(top)
    )


def exact_substr_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated-span detection — the distributed rendering of
    suffix-array ExactSubstr dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): find every position
    whose k-token window occurs >= ``min_count`` times corpus-wide,
    then merge overlapping/touching hits into MAXIMAL spans per
    document. Where ``span_dedup`` counts fixed non-overlapping blocks
    (RefinedWeb lines), this one slides: a duplicated passage of any
    length >= k is recovered as ONE span with exact boundaries — the
    memorization-grade exact-substring screen, without materializing a
    suffix array (grams + gaps-and-islands give identical maximal
    spans for >= k-token duplicates).

    Plan: k-grams from k-1 LEAD columns off ONE per-doc sort (the
    repetition/winnow pattern); corpus-wide gram occurrence counting
    is a map-side-combinable groupBy over 16-byte gram DIGESTS
    (md5 — shuffle width independent of k, partial aggregation
    absorbs hot grams like stopword runs BEFORE the shuffle), kept
    grams (cnt >= min_count) flow back via a digest-keyed LEFT SEMI
    join that AQE's skew-join can split — unlike the r7 rendering's
    unbounded Window.partitionBy(gram), which put every occurrence
    of a hot k-gram on a single reducer with no partial aggregation
    (the ADVICE r7 skew finding). Qualifying positions then take the
    classic gaps-and-islands merge (new island when pos - prev_pos >
    k, i.e. the previous window [prev, prev+k-1] neither overlaps nor
    touches [pos, pos+k-1]): one doc-keyed window + per-(doc, island)
    aggregate reusing that exchange. 4 shuffles total (one more than
    the window form — the price of skew safety), all whole-stage
    codegen. No suffix array, no all-pairs, no Python.

    Output per document (docs with >= 1 duplicated span only):
    (doc_id, n_spans, dup_tokens, max_span_len) — dup_tokens = total
    tokens covered by maximal spans, max_span_len = longest span.
    """
    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        key_col,
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    wlead = Window.partitionBy(key_col).orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(wlead) for i in range(1, k)
    ]
    grams = toks.select(
        key_col,
        "pos",
        F.when(
            F.lead("tok", k - 1).over(wlead).isNotNull(),
            F.concat_ws(" ", *parts),
        ).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    g = grams.select(key_col, "pos", F.unhex(F.md5("gram")).alias("g"))
    hot = (
        g.groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("g")
    )
    dup = g.join(hot, "g", "left_semi").select(key_col, "pos")
    wpos = Window.partitionBy(key_col).orderBy("pos")
    flagged = dup.select(
        key_col,
        "pos",
        F.when(
            (F.col("pos") - F.lag("pos", 1).over(wpos)) > k, 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    islands = flagged.select(
        key_col,
        "pos",
        F.sum("brk")
        .over(wpos.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    spans = islands.groupBy(key_col, "island").agg(
        (F.max("pos") - F.min("pos") + k).cast("long").alias("span_len")
    )
    return spans.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("span_len").cast("long").alias("dup_tokens"),
        F.max("span_len").cast("long").alias("max_span_len"),
    )


def dup_rate_by_source(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Curation analytics: per-(source, lang) EXACT-duplicate rate —
    the report a corpus curator reads before deciding which crawl
    sources to down-weight (a source whose documents are mostly
    byte-copies of each other, or of other sources, contributes far
    fewer effective tokens than its row count suggests).

    A document is 'duplicated' iff its md5 content digest appears >= 2
    times CORPUS-WIDE (same digest convention as ``exact_dup_groups``
    — cross-source copies count for every source holding one). Rate =
    exact integer counts + ONE IEEE divide.

    Plan: digest groupBy (map-side combinable, one narrow shuffle),
    digest-keyed membership join back (AQE-splittable), then a
    (source, lang) rollup — group count is source x lang, tiny. No
    all-pairs, no window over an unbounded key.

    Returns (source, lang, n_docs, n_dup_docs, n_dup_groups,
    dup_frac), one row per source x lang present.
    """
    base = docs.select(
        source_col, lang_col, "doc_id", F.md5(F.col(text_col)).alias("dig")
    )
    sizes = base.groupBy("dig").agg(F.count("*").alias("grp_n"))
    flagged = base.join(sizes, "dig")
    return (
        flagged.groupBy(source_col, lang_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("grp_n") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.countDistinct(
                F.when(F.col("grp_n") >= 2, F.col("dig"))
            )
            .cast("long")
            .alias("n_dup_groups"),
        )
        .withColumn(
            "dup_frac",
            F.col("n_dup_docs").cast("double") / F.col("n_docs"),
        )
    )


def minhash_jaccard_calibration(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """LSH CALIBRATION report: for every banded-LSH candidate pair,
    the MinHash similarity ESTIMATE (matching signature components /
    num_hashes) next to the TRUE shingle Jaccard and their signed
    error — the diagnostic a curator runs on a sample before trusting
    a (num_hashes, bands) configuration to sweep 100 TB (E[estimate]
    = Jaccard; the spread tells you whether the banding threshold
    p ≈ (1/bands)^(1/rows) actually separates your corpus).

    Determinism: the estimate is n_match / num_hashes (num_hashes a
    power of two → the divide is EXACT); Jaccard is one IEEE divide of
    exact intersection/union counts; err is one subtraction of those
    two doubles — all bit-stable against the SQL twin, which replays
    the md5-based permutation family verbatim.

    Plan: shingles + signatures are computed ONCE and shared — the
    shingle frame feeds the signature build, the exact-Jaccard joins
    and the size agg, and the signature frame feeds BOTH the band
    buckets (via minhash_lsh_pairs's ``sig=`` hand-off) and the
    per-pair component-match columns (r8 ADVICE: the old form re-ran
    the tokenize/window/groupBy chain 2-3×). Candidates come from
    band buckets — never all-pairs; the component-match count is a
    zip_with/aggregate over num_hashes-element arrays (32 by default)
    of CANDIDATE pairs only; exact Jaccard joins the per-doc distinct
    shingle table twice, keyed on (doc, shingle) — candidates only
    again.

    Returns (doc_a, doc_b, n_match, est_sim, n_inter, n_union,
    jaccard, err).
    """
    sh = shingles(docs, text_col, k)
    sig = minhash_signatures(sh, num_hashes, seed, portable=True)
    pairs = minhash_lsh_pairs(
        docs, text_col, k, num_hashes, bands, seed, portable=True, sig=sig
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with(
            "sig_a",
            "sig_b",
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    ia = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    ib = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(ia, "doc_a")
        .join(ib, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    est = F.col("n_match").cast("double") / F.lit(num_hashes)
    jac = F.col("n_inter").cast("double") / F.col("n_union")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_match", matches)
        .join(inter, ["doc_a", "doc_b"], "left")
        .fillna(0, subset=["n_inter"])
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .withColumn("n_union", (F.col("na") + F.col("nb") - F.col("n_inter")).cast("long"))
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            est.alias("est_sim"),
            "n_inter",
            "n_union",
            jac.alias("jaccard"),
            (est - jac).alias("err"),
        )
    )


def soft_dedup_weights(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """SOFT deduplication: per-document training-sampling weights that
    down-weight duplicated content instead of dropping it (He et al.
    2024, "SoftDedup"; the reweight-don't-delete school of corpus
    curation). Every doc keeps a row; a doc whose content appears c
    times gets weight 1/c, so each distinct CONTENT contributes exactly
    one unit of expected training mass and the effective dataset size
    equals the distinct-content count — the invariant the tests assert.

    Returns (doc_id, dup_count, weight_ppb) for every input doc, with
    ``weight_ppb = 10^9 div dup_count`` as an exact truncating BIGINT
    division (the engine's cross-engine determinism contract — no IEEE
    reciprocal in the output).

    Scale: digest counts via groupBy (map-side-combinable partials, so
    a content duplicated 10^7 times — the boilerplate/404-page hot key —
    combines locally instead of melting one reducer; a count-window over
    ``partitionBy(content_hash)`` would NOT combine and is deliberately
    avoided), then one hash-keyed join back with AQE skew-split. Two
    narrow digest-keyed shuffles total; the text column itself is never
    shuffled.
    """
    hashed = docs.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
    counts = hashed.groupBy("content_hash").agg(
        F.count("*").cast("long").alias("dup_count")
    )
    return hashed.join(counts, "content_hash").select(
        "doc_id",
        "dup_count",
        F.expr("CAST(1000000000 div dup_count AS BIGINT)").alias("weight_ppb"),
    )

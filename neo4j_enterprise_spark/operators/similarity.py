"""Similarity search over embedding columns (array<float>).

Spark-native extension for training-data pipelines:

- ``cosine_topk_bruteforce`` — exact top-k per query seed. The baseline;
  correct at any scale where |seeds| × |corpus| pairs are joinable.
- ``lsh_ann_topk`` — random-hyperplane LSH bucketing; candidates only
  from matching buckets (multi-probe over b bands). The 100 TB path:
  the bucket join replaces the cross product.

Determinism contract (for oracle comparison): embeddings are quantized
to BIGINT (round(x·1000)) so every dot product / norm is an exact
integer — float-summation order stops mattering, and Spark and DuckDB
produce bit-identical DOUBLE cosines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import QUANT, dot as _dot, quantize


def cosine_topk_bruteforce(
    embeddings: DataFrame, seeds: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each seed.

    ``embeddings``: (vec_id, embedding array<float>); ``seeds``: subset
    with the same schema. The seed side is broadcast (it's the small
    side by construction); scoring is JVM-side ``zip_with``/``aggregate``
    over quantized vectors; ranking is one window per seed partition.
    """
    q = seeds.select(
        F.col("vec_id").alias("seed"), quantize(F.col("embedding")).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    c = embeddings.select(
        F.col("vec_id").alias("neighbor"), quantize(F.col("embedding")).alias("cv")
    ).withColumn("cn", _dot(F.col("cv"), F.col("cv")))
    scored = (
        F.broadcast(q)
        .join(c, F.col("seed") != F.col("neighbor"))
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


def ivf_assign(
    embeddings: DataFrame, n_cells: int = 16
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: deterministic centroids (every (n/K)-th
    vector by id — a seeded sample stand-in for k-means; swap in real
    k-means offline without changing the flow), each vector assigned to
    its nearest centroid by exact quantized cosine.

    Returns (centroids(cell_id, cv, cn), assignments(vec_id, cell_id)).
    The centroid side is K rows → broadcast; assignment is one pass over
    the corpus. At 100 TB, cells partition the corpus so probes touch
    1/K of the data per searched cell.

    Centroid selection is a deterministic hash-sample: the K vectors
    with the smallest ``xxhash64(vec_id)`` — ``orderBy(hash).limit(K)``
    compiles to TakeOrderedAndProject (per-partition top-K, no global
    sort, no count() action), so selection is one narrow pass at any
    corpus size. The K-row window that numbers cells runs on K rows
    only.
    """
    sel = (
        embeddings.select(
            "vec_id",
            quantize(F.col("embedding")).alias("ccv"),
            F.xxhash64("vec_id").alias("hs"),
        )
        .orderBy("hs", "vec_id")
        .limit(n_cells)
    )
    w_cell = Window.orderBy("hs", "vec_id")  # K rows post-limit — tiny
    centroids = (
        sel.withColumn("cell_id", (F.row_number().over(w_cell) - 1).cast("int"))
        .select("cell_id", "ccv")
        .withColumn("ccn", _dot(F.col("ccv"), F.col("ccv")))
    )
    vecs = embeddings.select(
        "vec_id", quantize(F.col("embedding")).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    scored = vecs.join(F.broadcast(centroids)).select(
        "vec_id",
        "cell_id",
        (
            _dot(F.col("qv"), F.col("ccv")).cast("double")
            / F.sqrt((F.col("qn") * F.col("ccn")).cast("double"))
        ).alias("cscore"),
    )
    w_best = Window.partitionBy("vec_id").orderBy(F.desc("cscore"), F.asc("cell_id"))
    assignments = (
        scored.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cell_id")
    )
    return centroids, assignments


def ivf_ann_topk(
    embeddings: DataFrame,
    seeds: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF probe: score each seed only against vectors in its ``n_probe``
    closest cells. Same output contract as the brute-force/LSH variants;
    recall grows with n_probe (n_probe = n_cells degenerates to exact).
    """
    centroids, assignments = ivf_assign(embeddings, n_cells)
    q = seeds.select(
        F.col("vec_id").alias("seed"), quantize(F.col("embedding")).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    probe_scores = F.broadcast(q).join(F.broadcast(centroids)).select(
        "seed",
        "cell_id",
        (
            _dot(F.col("qv"), F.col("ccv")).cast("double")
            / F.sqrt((F.col("qn") * F.col("ccn")).cast("double"))
        ).alias("cscore"),
    )
    w_probe = Window.partitionBy("seed").orderBy(F.desc("cscore"), F.asc("cell_id"))
    probes = (
        probe_scores.withColumn("rk", F.row_number().over(w_probe))
        .filter(F.col("rk") <= n_probe)
        .select("seed", "cell_id")
    )
    cand = (
        probes.join(assignments, "cell_id")
        .filter(F.col("vec_id") != F.col("seed"))
        .select("seed", F.col("vec_id").alias("neighbor"))
        .distinct()
    )
    c = embeddings.select(
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


def _hyperplane_sign(vec: Column, plane: int, dims: int, seed: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane[d] = ±1 derived from a
    seeded hash — deterministic projections with no stored model."""
    signed = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda x, d: F.when(
                F.xxhash64(F.lit(seed), F.lit(plane), d) % 2 == 0, x
            ).otherwise(-x),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (signed >= 0).cast("int")


def lsh_buckets(
    embeddings: DataFrame,
    planes_per_band: int = 4,
    bands: int = 16,
    dims: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, band, bucket): random-hyperplane signature split into
    bands; similar vectors collide in ≥1 band with high probability."""
    qv = quantize(F.col("embedding"))
    out = embeddings.select("vec_id", qv.alias("qv"))
    band_cols = []
    for b in range(bands):
        bits = [
            _hyperplane_sign(F.col("qv"), b * planes_per_band + p, dims, seed)
            * (1 << p)
            for p in range(planes_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), sum(bits[1:], bits[0]).alias("bucket"))
        )
    return out.select(
        "vec_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_ann_topk(
    embeddings: DataFrame,
    seeds: DataFrame,
    k: int = 5,
    planes_per_band: int = 4,
    bands: int = 16,
    dims: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only pairs sharing an LSH bucket.

    At scale this is a shuffle join on (band, bucket) — candidate count
    scales with collision rate, not corpus². Output schema matches the
    brute-force operator (recall measured against it in tests).
    """
    buckets = lsh_buckets(embeddings, planes_per_band, bands, dims, seed)
    seed_buckets = buckets.join(
        seeds.select(F.col("vec_id")), "vec_id"
    ).withColumnRenamed("vec_id", "seed")
    cand = (
        seed_buckets.join(buckets, ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("seed"))
        .select("seed", F.col("vec_id").alias("neighbor"))
        .distinct()
    )
    q = seeds.select(
        F.col("vec_id").alias("seed"), quantize(F.col("embedding")).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    c = embeddings.select(
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


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (a, b, score) with
    a < b and cosine ≥ threshold.

    The last rung of the dedup ladder (exact → MinHash-LSH → SimHash →
    n-gram Jaccard → embedding cosine). Brute-force all-pairs — the
    correctness baseline; at corpus scale use
    ``embedding_near_dup_lsh`` (bucketed candidates, identical verify).
    Quantized integer dot products keep scores order-independent and
    engine-exact.
    """
    q = embeddings.select(
        F.col("vec_id").alias("a"), quantize(F.col("embedding")).alias("qa")
    ).withColumn("na", _dot(F.col("qa"), F.col("qa")))
    c = embeddings.select(
        F.col("vec_id").alias("b"), quantize(F.col("embedding")).alias("qb")
    ).withColumn("nb", _dot(F.col("qb"), F.col("qb")))
    return (
        q.join(c, F.col("a") < F.col("b"))
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


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    planes_per_band: int = 4,
    bands: int = 16,
    dims: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup at scale: LSH-bucket candidate generation, then
    the same exact-cosine verify as ``embedding_near_dup``.

    The pair join runs on (band, bucket) — candidate volume scales with
    collision rate, not corpus². Same output schema as the brute-force
    operator; recall is asserted against it in tests.
    """
    buckets = lsh_buckets(embeddings, planes_per_band, bands, dims, seed)
    cand = (
        buckets.join(
            buckets.withColumnRenamed("vec_id", "other"), ["band", "bucket"]
        )
        .filter(F.col("vec_id") < F.col("other"))
        .select(F.col("vec_id").alias("a"), F.col("other").alias("b"))
        .distinct()
    )
    q = embeddings.select(
        F.col("vec_id").alias("a"), quantize(F.col("embedding")).alias("qa")
    ).withColumn("na", _dot(F.col("qa"), F.col("qa")))
    c = embeddings.select(
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

"""Table/column statistics collection — the ANALYZE step of an engine.

The reference's store scans feed record-count statistics into its
consistency report (`TimingProgress.java:31-100` tracks per-store
elementCount); a cost-based planner needs the same scan generalized to
per-column null/distinct/range stats. Both operators here are single-pass
aggregations (one job, map-side partial agg) so profiling 100 TB costs one
scan; swap ``count_distinct`` for ``approx_count_distinct`` at scale where
a 2% NDV error is acceptable (the sketch variant lives in
``operators/sketches.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Long-format column profile: (column, n_rows, n_nulls, n_distinct).

    All columns are profiled in ONE aggregate pass; the long format is a
    driver-free pivot of the single result row (stack), so the operator
    is one scan + one 1-row exchange regardless of column count.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__nd"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd" for c in columns
    )
    return row.selectExpr(
        "__n", f"stack({len(columns)}, {stack_args}) as (column, __nn, __nd)"
    ).select(
        "column",
        F.col("__n").cast("long").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).cast("long").alias("n_nulls"),
        F.col("__nd").cast("long").alias("n_distinct"),
    )


def numeric_histogram(df: DataFrame, col: str, nbins: int = 10) -> DataFrame:
    """Equi-width histogram: (bucket, lo, hi, n) over the exact min/max
    range. Two passes (range, then bucket counts) — the classic ANALYZE
    histogram. Bucket edges and assignment use one fixed expression
    order, ``floor(((v - mn) * nbins) / (mx - mn))``, so every engine
    computing the same IEEE ops lands rows in identical buckets.
    """
    rng = df.agg(
        F.min(F.col(col)).alias("mn"), F.max(F.col(col)).alias("mx")
    )
    v = F.col(col).cast("double")
    bucket = F.least(
        F.floor(((v - F.col("mn")) * nbins) / (F.col("mx") - F.col("mn"))),
        F.lit(nbins - 1),
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(rng))
        .select(bucket.alias("bucket"), "mn", "mx")
        .groupBy("bucket", "mn", "mx")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("mn") + (F.col("bucket") * (F.col("mx") - F.col("mn"))) / nbins).alias("lo"),
            (F.col("mn") + ((F.col("bucket") + 1) * (F.col("mx") - F.col("mn"))) / nbins).alias("hi"),
            "n",
        )
    )


def equidepth_histogram(
    df: DataFrame, col: str, buckets: int = 8, id_col: str | None = None
) -> DataFrame:
    """Equi-DEPTH histogram: NTILE buckets over a deterministic total
    order (value, then id tiebreak) — per bucket the min/max bound and
    the exact row count. The planner-grade histogram for skewed columns
    where equi-width buckets collapse into one bar.

    One window pass + one groupBy; at 100 TB swap the exact NTILE for
    ``percentile_approx`` cut points (same output contract, sketch
    accuracy)."""
    from pyspark.sql.window import Window

    order = [F.col(col)] + ([F.col(id_col)] if id_col else [])
    w = Window.orderBy(*order)
    # NULL-value contract (r12 sweep): a histogram describes the VALUES;
    # NULLs are a separate statistic (null_frac), not a bucket member —
    # and engines disagree on NULL sort position (Spark NULLS FIRST vs
    # DuckDB NULLS LAST ascending), so including them diverges anyway.
    return (
        df.filter(F.col(col).isNotNull())
        .withColumn("__b", F.ntile(buckets).over(w))
        .groupBy(F.col("__b").alias("bucket"))
        .agg(
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("bucket")
    )


def skew_report(df: DataFrame, key: str, top: int = 5) -> DataFrame:
    """Join-key skew diagnosis: per-key counts vs the uniform share —
    the pre-flight check that decides between a plain shuffle join,
    AQE skew splitting, or explicit salting (`operators/skew.py`).

    Returns the ``top`` heaviest keys with (count, share_x1000 — the
    key's count as thousandths of the total; >> 1000/n_keys means a hot
    key). One partial-agg pass + a broadcast of the 1-row total."""
    counts = df.groupBy(F.col(key).alias("key")).agg(F.count("*").alias("n"))
    total = counts.agg(
        F.sum("n").alias("n_total"), F.count("*").alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            F.floor(F.col("n") * 1000 / F.col("n_total")).cast("long").alias("share_x1000"),
            "n_keys",
        )
        .orderBy(F.desc("n"), "key")
        .limit(top)
    )

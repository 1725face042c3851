"""Write-path operators: size-targeted, partitioned, bucketed sinks.

The reference's write path streams whole store files per table
(`Master.copyStore`, `BackupService.doFullBackup:85-180`); at 100 TB the
equivalent concern is file-count/size hygiene — a table written with the
wrong parallelism yields either thousands of KB-size files (NameNode /
listing pressure, per-file open cost dominates scans) or a handful of
multi-GB files (no scan parallelism, stragglers). These helpers make the
output layout an explicit contract:

- ``write_dataset`` — repartition to hit a target file size (estimated
  from source-file bytes when derivable, else a sampled row-size
  estimate), optional hive-style partition dirs and within-file sort
  (range-clustered files → parquet min/max footer pruning downstream);
- ``compact`` — the small-files maintenance job: rewrite a dataset's
  fragments into right-sized files, preserving partition dirs;
- ``write_bucketed`` — ``bucketBy`` table sink so repeated equi-joins /
  aggs on the bucket key skip their shuffle entirely.

All sizing happens on the driver from metadata only — no extra pass over
the data beyond the optional tiny sample.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _source_bytes(df: DataFrame) -> int | None:
    """Sum the on-disk size of the scan's input files if every input is a
    local/file: path (always true in tests; on a cluster the same idea
    reads FileStatus from the Hadoop FS)."""
    total = 0
    files = df.inputFiles()
    if not files:
        return None
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            return None
        path = p.path
        if not os.path.exists(path):
            return None
        total += os.path.getsize(path)
    return total


def _estimate_bytes(df: DataFrame, sample_rows: int = 1_000) -> tuple[int, int]:
    """(approx_total_bytes, n_rows) — source-file bytes when derivable
    (parquet-compressed, i.e. already in output units), else in-memory
    sample estimate scaled down 3× for parquet encoding+compression."""
    n_rows = df.count()
    src = _source_bytes(df)
    if src is not None:
        return src, n_rows
    if n_rows == 0:
        return 0, 0
    sample = df.limit(sample_rows).toPandas()
    per_row = max(sample.memory_usage(index=False, deep=True).sum() / max(len(sample), 1), 1.0)
    return int(n_rows * per_row / 3), n_rows


def plan_file_count(df: DataFrame, target_file_mb: int = 128) -> int:
    total_bytes, _ = _estimate_bytes(df)
    return max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))


# Default at-rest parquet layout for every sink in this module — the
# measured winner of the r11 ingest A/B (BASELINE.md §14): zstd-3 +
# 8 MB pages + 32 MB row groups. Primarily a STORAGE lever (2.8×
# smaller at rest than the snappy/PLAIN source at sf30) at roughly
# scan-neutral cost (sf10: ~25% faster; sf30: q5 −13%, q1 +12% — the
# zstd decode tax on wide scans can offset the row-group gain). Pass
# ``layout=None`` to a writer to fall back to the engine defaults, or
# a dict to override per-write.
INGEST_LAYOUT: dict[str, str] = {
    "compression": "zstd",
    "parquet.compression.codec.zstd.level": "3",
    "parquet.page.size": str(8 << 20),
    "parquet.block.size": str(32 << 20),
}

_DEFAULT = object()  # sentinel: "use INGEST_LAYOUT"


def _apply_layout(writer, layout, fmt: str = "parquet"):
    if layout is _DEFAULT:
        layout = INGEST_LAYOUT if fmt == "parquet" else None
    for k, v in (layout or {}).items():
        writer = writer.option(k, v)
    return writer


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    target_file_mb: int = 128,
    mode: str = "overwrite",
    fmt: str = "parquet",
    layout=_DEFAULT,
) -> int:
    """Write ``df`` with an explicit file-size target; returns the
    planned file count.

    Layout strategy:
    - plain: round-robin ``repartition(n)`` → n uniform files;
    - ``sort_by``: ``repartitionByRange`` + ``sortWithinPartitions`` →
      globally range-clustered files whose parquet min/max footers prune
      downstream scans on the sort key;
    - ``partition_by``: shuffle on the partition key plus a salt bounded
      by n so a hot partition value still splits across tasks while each
      task writes at most one file per directory it owns.
    """
    n = plan_file_count(df, target_file_mb)
    writer_df = df
    if partition_by:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n)).alias(
            "__file_salt"
        )
        writer_df = (
            df.select("*", salt)
            .repartition(n, *[F.col(c) for c in partition_by], F.col("__file_salt"))
            .drop("__file_salt")
        )
    elif sort_by:
        writer_df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        writer_df = df.repartition(n)
    writer = _apply_layout(writer_df.write.mode(mode).format(fmt), layout, fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    return n


def compact(
    spark,
    path: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> int:
    """Rewrite a fragmented dataset into right-sized files (read →
    re-layout → atomic-ish replace via overwrite). Partition dirs are
    re-derived from the data, so per-partition fragments merge too."""
    df = spark.read.format(fmt).load(path)
    cached = df.cache()
    try:
        n = write_dataset(
            cached,
            path + "__compacted",
            partition_by=partition_by,
            target_file_mb=target_file_mb,
            fmt=fmt,
        )
    finally:
        cached.unpersist()
    import shutil

    shutil.rmtree(path)
    os.rename(path + "__compacted", path)
    return n


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    layout=_DEFAULT,
) -> None:
    """Persist as a bucketed (+ optionally sorted) table: joins and
    aggregations keyed on ``bucket_cols`` between co-bucketed tables run
    shuffle-free (Catalyst sees the hash-distribution from table
    metadata). The 100 TB pattern for fact-fact joins too big to
    broadcast and too frequent to re-shuffle per query.

    The write REPARTITIONS on the bucket columns first: without it,
    every input split writes its own slice of every bucket — n_splits ×
    n_buckets files of kilobyte row groups (measured at sf10: 1024
    ~1.3 MB files for 32 buckets, and the resulting bucketed SCAN ran
    1.7× SLOWER than the flat table it replaced, giving back the whole
    exchange win). Repartitioning uses the same pmod(murmur3) hash as
    the bucket spec, so each task holds exactly one bucket and writes
    exactly one well-sized file; the sort then orders the whole bucket,
    not per-split fragments."""
    out = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    writer = _apply_layout(
        out.write.mode(mode).format("parquet"), layout
    ).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def zorder_column(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Attach a Z-order (Morton) key interleaving the rank-bits of
    ``cols``: rows close on the space-filling curve are close in EVERY
    listed dimension, so range-clustered files prune scans filtered on
    any of them (single-column sort only prunes its own column).

    Ranks come from per-column approx-quantile boundaries (one
    distributed pass per column, 2^bits cut points collected to the
    driver — metadata-size, not data-size); bucket lookup and bit
    interleave are pure column expressions.
    """
    n_dims = len(cols)
    if n_dims < 2:
        raise ValueError("z-order needs >= 2 columns (use sort_by for 1)")
    zcol = "__zorder"
    out = df
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    bucket_cols = []
    for c in cols:
        bnds = df.approxQuantile(c, probs, 0.001)
        bnds = sorted(set(bnds))  # quantiles can repeat on skewed data
        arr = F.array(*[F.lit(float(b)) for b in bnds])
        v = F.col(c).cast("double")
        bucket = F.size(F.filter(arr, lambda b: b <= v)).cast("long")
        bc = f"__zb_{c}"
        out = out.withColumn(bc, bucket)
        bucket_cols.append(bc)
    morton = F.lit(0).cast("long")
    for i in range(bits):
        for d, bc in enumerate(bucket_cols):
            morton = morton + F.shiftleft(
                F.shiftright(F.col(bc), i).bitwiseAND(F.lit(1)), i * n_dims + d
            )
    return out.withColumn(zcol, morton).drop(*bucket_cols), zcol


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    target_file_mb: int = 128,
    bits: int = 8,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as Z-order-clustered parquet files; returns the
    planned file count. Downstream scans filtering on ANY of ``cols``
    prune files via parquet min/max footers."""
    n = plan_file_count(df, target_file_mb)
    keyed, zcol = zorder_column(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode(mode)
        .parquet(path)
    )
    return n


def export_jsonl(df: DataFrame, out_dir: str) -> str:
    """Portable store export: write a table as JSON-lines (the
    interchange twin of `Master.copyStore`'s whole-file streaming —
    line-oriented so any downstream tool can consume it, at the price
    of text encoding; parquet remains the performance format).
    Overwrites the target so re-exports are idempotent."""
    df.write.mode("overwrite").json(out_dir)
    return out_dir


def import_jsonl(spark, in_dir: str, schema) -> DataFrame:
    """Portable store import: read a JSONL export with an EXPLICIT
    schema (never inference — at 100 TB schema inference is a full
    extra pass, and silently widens types on dirty rows; a declared
    schema makes bad rows surface as nulls instead)."""
    return spark.read.schema(schema).json(in_dir)


def export_orc(df: DataFrame, out_dir: str) -> str:
    """Columnar interchange in ORC (the other big-data columnar format
    beside parquet — Hive/Trino ecosystems): same overwrite-idempotent
    contract as ``export_jsonl``, with predicate pushdown and column
    pruning preserved on re-read."""
    df.write.mode("overwrite").orc(out_dir)
    return out_dir


def import_orc(spark, in_dir: str, schema=None) -> DataFrame:
    """Read an ORC export; pass ``schema`` to pin types (ORC is
    self-describing, so unlike JSONL the schema argument is a
    verification contract, not a requirement)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(in_dir)


def read_evolved(spark, dirs: list[str], defaults: dict[str, object]) -> DataFrame:
    """Store-format upgrade read: one DataFrame over parquet dirs of
    DIFFERENT schema vintages (``mergeSchema`` unions the columns;
    old files yield nulls for columns they predate), with explicit
    per-column ``defaults`` filled in — the query-time rendering of the
    reference's store migration (a 1.9 store opening 1.8 files upgrades
    them; here old files stay valid and the default is part of the read
    contract instead of a rewrite).
    """
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(*dirs)
    for col, default in defaults.items():
        df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return df

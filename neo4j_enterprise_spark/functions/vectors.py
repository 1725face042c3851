"""Quantized vector arithmetic (similarity-search kernels).

Embeddings are float32; quantizing to BIGINT (round(x*1000)) makes every
dot product / norm an exact integer, so results are order-independent
under any partitioning — a determinism property at scale AND the thing
that lets the DuckDB oracle match bit-for-bit (see SCALE.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1000


def quantize(col: Column, scale: int = QUANT) -> Column:
    """array<float> → array<bigint>, round half away from zero (Spark and
    DuckDB agree on double multiply + away-from-zero ties)."""
    return F.transform(col, lambda x: F.round(x.cast("double") * scale, 0).cast("long"))


def dot(a: Column, b: Column) -> Column:
    """Exact integer dot product via zip_with/aggregate (codegen-able)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def dot_double(a: Column, b: Column) -> Column:
    """Dot product with a DOUBLE accumulator — for mixed or float-typed
    arrays (e.g. Lloyd-refined centroids, which are per-cell means and
    no longer integers)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
